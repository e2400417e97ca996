#!/usr/bin/env python
"""Benchmark: HLG lattice decode throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "audio_seconds_per_second_per_chip",
   "vs_baseline": N}

Workload (BASELINE.json config #3 shape): batched lattice decoding of
conformer-CTC-like posteriors (V=500, 25 frames/s => 0.04 s/frame) through
an HLG-shaped WFST (200k states, 1M emitting arcs, 100k epsilon arcs,
eps depth 2) with beam=15, max_active=4000, lattice records emitted per
frame — the full device side of LatticeFasterDecoder.

vs_baseline: ratio against a single-threaded CPU token-passing decoder
with the reference's algorithmics (hash-map frontier, per-arc expansion —
the same work `FasterDecoder::ProcessEmitting` does per frame), measured
on the same graph/scores here, since the reference publishes no numbers
(BASELINE.md) and its wheel cannot be built offline.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import os

# Persistent XLA compilation cache: repeat bench invocations (driver runs,
# tuning sweeps) skip the multi-minute first compile.
try:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception as e:  # pragma: no cover - cache is best-effort
    print(f"compilation cache unavailable: {e}", file=sys.stderr)

SEED = 0
V = 500
S = 200_000
E_EM = 1_000_000
E_EPS = 100_000
B = int(os.environ.get("KDTPU_BENCH_B", "8"))
T = int(os.environ.get("KDTPU_BENCH_T", "1000"))
CHUNK_FRAMES = int(
    os.environ.get("KDTPU_BENCH_CHUNK", "200")
)  # frames per compiled device chunk (streaming shape)
FRAME_SECONDS = 0.04  # conformer subsampling-4 frame rate
BEAM = 15.0
MAX_ACTIVE = 4000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    from kaldi_decoder_tpu.decoders.frontier import config_for_graph
    from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder
    from kaldi_decoder_tpu.fst.synthetic import synthetic_graph

    graph = synthetic_graph(S, E_EM, V, seed=SEED, eps_arcs=E_EPS)
    fc = config_for_graph(
        graph,
        beam=BEAM,
        max_active=MAX_ACTIVE,
        min_active=200,
        frontier_size=4096,
        rem_budget=8192,
        eps_rem_budget=2048,
    )
    dec = BatchedLatticeDecoder(
        graph, fc, lattice_beam=8.0,
        em_records=int(os.environ.get("KDTPU_BENCH_EM_RECORDS", "4096")),
        eps_records=1024,
        pad_time_to=CHUNK_FRAMES,
    )
    return graph, dec


def device_throughput(graph, dec, chunk_frames):
    """Chunked decode: one compiled chunk re-invoked with carried state —
    the production streaming shape; buffers stay bounded."""
    import jax
    import jax.numpy as jnp
    from kaldi_decoder_tpu.decoders.frontier import StepState
    from kaldi_decoder_tpu.decoders.lattice_dev import init_closure_rec

    rng = np.random.default_rng(SEED)
    scores = np.log(
        rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32)
    ).astype(np.float32)
    lengths = jnp.full((B,), chunk_frames, jnp.int32)

    ga = dec._pg_dev
    st, _ = init_closure_rec(ga, graph.start_state, graph.num_states, dec.cfg)
    st0 = StepState(
        states=jnp.broadcast_to(st.states, (B,) + st.states.shape),
        costs=jnp.broadcast_to(st.costs, (B,) + st.costs.shape),
        base=jnp.broadcast_to(st.base, (B,)),
    )
    chunks = [
        jnp.asarray(scores[:, lo : lo + chunk_frames])
        for lo in range(0, T, chunk_frames)
    ]

    log("compiling + warmup ...")
    t0 = time.time()
    stf, outs = dec._chunk_fn(ga, chunks[0], lengths, st0)
    # NOTE: jax.block_until_ready does not synchronize under the axon
    # relay; a scalar host fetch is the only reliable barrier.
    float(np.asarray(stf.base)[0])
    log(f"  compile+first chunk: {time.time() - t0:.1f}s")

    def one_pass():
        stc = st0
        last = None
        for c in chunks:
            stc, last = dec._chunk_fn(ga, c, lengths, stc)
        float(np.asarray(stc.base)[0])  # sync barrier
        return last

    one_pass()  # warm
    times = []
    for _ in range(3):
        t0 = time.time()
        outs = one_pass()
        times.append(time.time() - t0)
    tbest = min(times)
    audio_s = B * T * FRAME_SECONDS
    log(f"  device decode: {tbest:.3f}s for {audio_s:.0f} audio-s "
        f"({audio_s / tbest:.0f}x RT)  times={['%.3f' % x for x in times]}")
    na = np.asarray(outs.num_active)
    log(f"  mean active tokens (last chunk): {na.mean():.0f}, overflows: "
        f"{int(np.asarray(outs.overflow).sum())}")
    return audio_s / tbest, scores


def baseline_throughput(graph, scores):
    """Single-threaded CPU token passing with reference algorithmics."""
    ga = graph.arrays
    em_row_ptr = ga.em_row_ptr
    em_next, em_w = ga.em_next, ga.em_weight
    em_idx = ga.em_score_idx
    eps_row_ptr, eps_next, eps_w = ga.eps_row_ptr, ga.eps_next, ga.eps_weight

    frames = min(25, scores.shape[1])
    sc = scores[0]
    toks = {graph.start_state: 0.0}
    t0 = time.time()
    for t in range(frames):
        # eps closure
        queue = list(toks.keys())
        best = min(toks.values())
        cutoff = best + BEAM
        while queue:
            s = queue.pop()
            c = toks[s]
            if c > cutoff:
                continue
            for a in range(eps_row_ptr[s], eps_row_ptr[s + 1]):
                ns, nc = int(eps_next[a]), c + float(eps_w[a])
                if nc <= cutoff and nc < toks.get(ns, np.inf):
                    toks[ns] = nc
                    queue.append(ns)
        # emitting
        new = {}
        cutoff = min(toks.values()) + BEAM
        row = sc[t]
        for s, c in toks.items():
            if c >= cutoff:
                continue
            for a in range(em_row_ptr[s], em_row_ptr[s + 1]):
                nc = c + float(em_w[a]) - float(row[em_idx[a]])
                ns = int(em_next[a])
                if nc < new.get(ns, np.inf):
                    new[ns] = nc
        # beam + max-active prune
        if new:
            costs = np.fromiter(new.values(), float)
            cut = costs.min() + BEAM
            if len(costs) > MAX_ACTIVE:
                cut = min(cut, np.partition(costs, MAX_ACTIVE)[MAX_ACTIVE])
            toks = {s: c for s, c in new.items() if c < cut}
        else:
            break
    elapsed = time.time() - t0
    sps = frames * FRAME_SECONDS / elapsed
    log(f"  cpu reference-style decoder: {frames} frames in {elapsed:.2f}s "
        f"({sps:.2f} audio-s/s)")
    return sps


def main():
    log(f"bench: lattice decode  S={S} E={E_EM}+{E_EPS}eps V={V} B={B} T={T}")
    graph, dec = build()
    dev_sps, scores = device_throughput(graph, dec, CHUNK_FRAMES)
    base_sps = baseline_throughput(graph, scores)
    print(
        json.dumps(
            {
                "metric": "HLG-shaped lattice decode throughput per chip",
                "value": round(dev_sps, 2),
                "unit": "audio_seconds_per_second_per_chip",
                "vs_baseline": round(dev_sps / base_sps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
