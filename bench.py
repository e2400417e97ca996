#!/usr/bin/env python
"""Benchmark: native-HLG lattice decode throughput (+WER) on the local chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "audio_seconds_per_second_per_chip",
   "vs_baseline": N}

Workload (BASELINE.json config #3): batched lattice decoding of
conformer-CTC-like posteriors (V=500, 25 frames/s) through a **real-structure
native HLG** — ``connect(ctc_topo(500) ∘ L(5000 words) ∘ bigram G)``,
>=100k states / ~4M arcs with genuine backoff epsilons and word olabels
(`kaldi_decoder_tpu/fst/hlg.py`) — with beam=15, max_active=4000, lattice
records emitted per frame: the full LatticeFasterDecoder capability.
Posteriors are CTC-aligned to known transcripts so the run also reports a
WER (the north star's accuracy metric).  Set KDTPU_BENCH_GRAPH=synthetic
for the round-1/2 random graph instead.

vs_baseline: ratio against a single-threaded CPU token-passing decoder
with the reference's algorithmics (hash-map frontier, per-arc expansion —
the same work `FasterDecoder::ProcessEmitting` does per frame), measured
on the same graph/scores here, since the reference publishes no numbers
(BASELINE.md) and its wheel cannot be built offline.

Stage timings (graph build/load, transfer+compile+first chunk, steady-state
passes, host lattice finalization) go to stderr for cold-start accounting.
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# Persistent XLA compilation cache: repeat bench invocations (driver runs,
# tuning sweeps) skip the first compile.
try:
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception as e:  # pragma: no cover - cache is best-effort
    print(f"compilation cache unavailable: {e}", file=sys.stderr)

SEED = 0
V = 500
B = int(os.environ.get("KDTPU_BENCH_B", "16"))
T = int(os.environ.get("KDTPU_BENCH_T", "1000"))
#  500-frame chunks (r5): the windowed sweep keeps ~a frontier's worth of
#  conservatively-alive rows per chunk BOUNDARY, and every D2H fetch
#  round-trip has fixed relay cost — halving the chunk count cut the
#  per-batch survivor download ~35% and the fetch rounds 2.5x at
#  identical output (chunk boundaries are lattice-exact, tests/test_sweep.py).
CHUNK_FRAMES = int(os.environ.get("KDTPU_BENCH_CHUNK", "500"))
FRAME_SECONDS = 0.04  # conformer subsampling-4 frame rate
BEAM = float(os.environ.get("KDTPU_BENCH_BEAM", "15"))
# The default is the *recall-qualified operating point*: measured
# lattice-link recall vs the exact same-config oracle is >= 0.95
# (scripts/measure_recall.py --save; carried in the metric string below).
# max_active trades accuracy for expansion demand exactly as in Kaldi:
# ma=4000/rem=32768 measures WER 4.28% at recall 0.90 and ~68 audio-s/s
# device / 60 e2e (BASELINE.md operating-point table).  r5 default
# ma=2560 (recall 0.960, WER 4.71%, device 57.5, e2e steady 50.8): the
# tighter cutoff cuts expansion lanes AND truncation pressure, clearing
# the >=50 north star end-to-end at recall >=0.95; ma=3000 (recall
# 0.956, WER 4.61%, 54.8/48.7) remains one env var away.
MAX_ACTIVE = int(os.environ.get("KDTPU_BENCH_MAXACTIVE", "2560"))
LATTICE_BEAM = 8.0
EM_RECORDS = int(os.environ.get("KDTPU_BENCH_EM_RECORDS", "8192"))
REM_BUDGET = int(os.environ.get("KDTPU_BENCH_REM", "49152"))
EPS_REM_BUDGET = int(os.environ.get("KDTPU_BENCH_EPS_REM", "2048"))
FRONTIER = int(os.environ.get("KDTPU_BENCH_FRONTIER", "4096"))
#  Remainder packing G: r5 ablation (scripts/ablate_frame.py) measured
#  the remainder path at ~3.1 ms of the ~11 ms frame at G=4; G=8 halves
#  its row-gather count (2.48 -> 2.22 s per 200-frame chunk, identical
#  results — lane count and semantics are G-independent).
FLAT_GROUP = int(os.environ.get("KDTPU_BENCH_FLAT_GROUP", "8"))
BLOCK_W = os.environ.get("KDTPU_BENCH_W")  # block width override
GRAPH_KIND = os.environ.get("KDTPU_BENCH_GRAPH", "hlg")
CACHE_DIR = REPO / ".bench_cache"

# Native HLG build parameters (deterministic from SEED).
HLG_WORDS = 5000
HLG_SENTS_SHORT, HLG_LEN_SHORT = 2500, 12.0
HLG_SENTS_LONG, HLG_LEN_LONG = 400, 75.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _stage(msg, t0=[time.time()]):
    log(f"[{time.time() - t0[0]:7.1f}s] {msg}")


def build_hlg_workload():
    """Native >=100k-state HLG + aligned posteriors for known transcripts.

    The compiled graph is cached under .bench_cache (deterministic build
    takes ~100s of pure-host compose; the cache keeps driver cold runs
    about the decode, not graph compilation)."""
    from kaldi_decoder_tpu.fst.csr import load_graph_npz, save_graph_npz
    from kaldi_decoder_tpu.fst.hlg import (
        build_hlg,
        random_lexicon,
        sample_corpus,
        synth_posteriors,
        words_to_tokens,
    )

    CACHE_DIR.mkdir(exist_ok=True)
    gpath = CACHE_DIR / f"hlg_v{V}_w{HLG_WORDS}_s{SEED}.npz"
    rng = np.random.default_rng(SEED)
    lex = random_lexicon(HLG_WORDS, V, rng, 3, 8)
    corpus = sample_corpus(HLG_WORDS, HLG_SENTS_SHORT, rng, mean_len=HLG_LEN_SHORT)
    corpus += sample_corpus(HLG_WORDS, HLG_SENTS_LONG, rng, mean_len=HLG_LEN_LONG)
    if gpath.exists():
        graph = load_graph_npz(gpath)
        _stage(f"HLG loaded from cache ({graph.num_states} states, "
               f"{graph.num_emitting_arcs} em arcs)")
    else:
        hlg = build_hlg(lex, corpus, V)
        from kaldi_decoder_tpu.fst.csr import compile_fst

        graph = compile_fst(hlg)
        save_graph_npz(graph, gpath)
        _stage(f"HLG built natively ({graph.num_states} states, "
               f"{graph.num_emitting_arcs} em arcs, eps={graph.num_eps_arcs})")
    assert graph.num_states >= 100_000

    # Transcripts: long corpus sentences, trimmed to fill ~T frames.
    rng2 = np.random.default_rng(SEED + 1)
    pron = dict(lex)
    longs = [s for s in corpus if len(s) >= 40]
    scores = np.full((B, T, V), np.log(1.0 / V), np.float32)
    lengths = np.zeros(B, np.int32)
    refs = []
    for b in range(B):
        words = list(longs[int(rng2.integers(len(longs)))])
        sc = None
        while True:
            toks = words_to_tokens(words, pron)
            sc = synth_posteriors(toks, V, np.random.default_rng(SEED + 10 + b))
            if sc.shape[0] <= T or len(words) <= 1:
                break
            words = words[: max(1, int(len(words) * 0.9))]
        refs.append(words)
        L = min(sc.shape[0], T)
        scores[b, :L] = sc[:L]
        lengths[b] = L
    return graph, scores, lengths, refs


def build_synthetic_workload():
    from kaldi_decoder_tpu.fst.synthetic import synthetic_graph

    graph = synthetic_graph(200_000, 1_000_000, V, seed=SEED, eps_arcs=100_000)
    rng = np.random.default_rng(SEED)
    scores = np.log(
        rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32)
    ).astype(np.float32)
    lengths = np.full(B, T, np.int32)
    return graph, scores, lengths, None


def make_decoder(graph):
    from kaldi_decoder_tpu.decoders.frontier import config_for_graph
    from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder

    fc = config_for_graph(
        graph,
        beam=BEAM,
        max_active=MAX_ACTIVE,
        min_active=200,
        frontier_size=FRONTIER,
        rem_budget=REM_BUDGET,
        eps_rem_budget=EPS_REM_BUDGET,
        flat_group=FLAT_GROUP,
        **({"block_width": int(BLOCK_W)} if BLOCK_W else {}),
    )
    return BatchedLatticeDecoder(
        graph, fc, lattice_beam=LATTICE_BEAM,
        em_records=EM_RECORDS, eps_records=1024, pad_time_to=CHUNK_FRAMES,
    )


def device_throughput(graph, dec, scores, lengths):
    """Chunked decode: one compiled chunk re-invoked with carried state —
    the production streaming shape; buffers stay bounded."""
    import jax.numpy as jnp

    Tn = scores.shape[1]
    lengths_d = jnp.asarray(lengths)
    st0, _, _, _ = dec._init(B)
    chunks = [
        jnp.asarray(scores[:, lo : lo + CHUNK_FRAMES])
        for lo in range(0, Tn, CHUNK_FRAMES)
    ]

    _stage("compiling + warmup ...")
    t0 = time.time()
    stf, outs = dec._chunk_fn(dec._pg_dev, chunks[0], lengths_d, st0)
    # NOTE: jax.block_until_ready does not synchronize under the axon
    # relay; a scalar host fetch is the only reliable barrier.
    float(np.asarray(stf.base)[0])
    _stage(f"compile+first chunk: {time.time() - t0:.1f}s")

    def one_pass():
        stc = st0
        last = None
        rem = lengths_d
        for c in chunks:
            stc, last = dec._chunk_fn(dec._pg_dev, c, rem, stc)
            rem = jnp.maximum(rem - c.shape[1], 0)
        float(np.asarray(stc.base)[0])  # sync barrier
        return last

    one_pass()  # warm
    times = []
    for _ in range(3):
        t0 = time.time()
        outs = one_pass()
        times.append(time.time() - t0)
    tbest = min(times)
    audio_s = float(lengths.sum()) * FRAME_SECONDS
    log(f"  device decode: {tbest:.3f}s for {audio_s:.0f} audio-s "
        f"({audio_s / tbest:.0f}x RT)  times={['%.3f' % x for x in times]}")
    na = np.asarray(outs.num_active)
    log(f"  mean active tokens (last chunk): {na.mean():.0f}, overflows: "
        f"{int(np.asarray(outs.overflow).sum())}, saturated frames: "
        f"{int(np.asarray(outs.saturated).sum())}")
    return audio_s / tbest


def finalize_batch(res):
    """Per-utterance lattice finalization + best-path extraction, serial.

    No process pool: the host work rides under the device decode of the
    next pipelined batch, so a pool would only add fork-safety risk after
    JAX init — the r4 fork-based pool drew a RuntimeWarning and carried a
    documented wedge hazard; this is the production shape.  1-best runs
    on the pruned array lattice (``best_path_labels``: native
    ShortestPath over flat arrays, no per-arc Python FST construction)."""
    out = []
    for b in range(B):
        labels = res.best_path_labels(b)
        out.append(labels if labels is not None else [])
    return out


def e2e_with_lattices(graph, dec, scores, lengths, refs):
    """Steady-state end-to-end through the public batched API: batches
    are pipelined via ``decode_async`` — host lattice finalization +
    best-path extraction of batch i runs while the device decodes batch
    i+1 (including the per-batch score upload).  This is the number a
    production user sees per chip; one cold batch (no overlap) and the
    pipeline knee (n_pipe = 2/3/4) are also reported."""
    finalize = finalize_batch
    audio_s = float(lengths.sum()) * FRAME_SECONDS

    # Cold single batch (device + host serial, nothing overlapped).
    t0 = time.time()
    res = dec.decode(scores, lengths, chunk_frames=CHUNK_FRAMES)
    t_dev = time.time() - t0
    t1 = time.time()
    hyps = finalize(res)
    t_host = time.time() - t1
    log(f"  e2e single batch: {t_dev:.2f}s device+sweep+download + "
        f"{t_host:.2f}s host = {audio_s / (t_dev + t_host):.1f} audio-s/s")

    # Pipelined: per iteration fetch batch i, dispatch batch i+2, then
    # finalize batch i on the host UNDER batch i+1/i+2's device compute.
    # Order matters on the dev tunnel's relay: awaiting a PENDING buffer
    # drains the whole submitted queue, so result(i) runs while at most
    # one batch is queued behind it, and the next dispatch goes in before
    # the host disappears into finalize.  Steady state is device-bound
    # (forward + sweep); the fill batch is one-time, so the product
    # number is the marginal rate between two depths.
    def run_pipe(n_pipe):
        # One-ahead pipeline: result(i) observes batch i's own
        # completion (per-batch readiness holds now that decode_async
        # issues no copy_to_host_async — see lattice.py), its fetches
        # stream under batch i+1's compute, batch i+2 is dispatched, and
        # the host finalize runs under device compute too.  Steady state
        # is device-bound: one device period per batch.
        t0 = time.time()
        pend = {0: dec.decode_async(scores, lengths, chunk_frames=CHUNK_FRAMES)}
        if n_pipe > 1:
            pend[1] = dec.decode_async(
                scores, lengths, chunk_frames=CHUNK_FRAMES
            )
        hyps = None
        marks = []
        for i in range(n_pipe):
            r = pend.pop(i).result()
            if i + 2 < n_pipe:
                pend[i + 2] = dec.decode_async(
                    scores, lengths, chunk_frames=CHUNK_FRAMES
                )
            hyps = finalize(r)
            marks.append((1, time.time() - t0))
        return time.time() - t0, hyps, marks

    steady_periods = []
    for n_pipe in (2, 4, 8):
        wall, hyps, marks = run_pipe(n_pipe)
        log(f"  e2e pipelined x{n_pipe}: {wall:.2f}s wall for "
            f"{n_pipe * audio_s:.0f} audio-s = "
            f"{n_pipe * audio_s / wall:.1f} audio-s/s")
        # Per-batch periods of steady-state groups (the first group pays
        # the pipeline fill; later groups are one drain period per two
        # batches).
        for gi in range(1, len(marks)):
            nb = marks[gi][0]
            steady_periods.append((marks[gi][1] - marks[gi - 1][1]) / nb)
    # Median period: robust against the dev tunnel's documented
    # order-of-magnitude transfer stalls (a single stalled batch would
    # otherwise swallow an endpoint-marginal estimate).
    sp = sorted(steady_periods)
    log(f"  steady per-batch periods (s): "
        f"{', '.join(f'{x:.1f}' for x in steady_periods)}")
    e2e_steady = audio_s / sp[len(sp) // 2]
    log(f"  e2e steady-state (median period, fill excluded): "
        f"{e2e_steady:.1f} audio-s/s")
    e2e = e2e_steady
    wer_val = None
    if refs is not None:
        from kaldi_decoder_tpu.utils.wer import wer

        st = wer(refs, hyps)
        wer_val = st.wer
        log(f"  WER vs known transcripts: {st}")
    return e2e, wer_val


def baseline_throughput_native(graph, scores, lengths):
    """Honest native baselines: single-threaded C++ decodes with the
    reference's algorithmics on the same graph (native/csrc/kdtpu_host.cc):
    kd_decode_faster (best-path only: GetCutoff/nth_element, hash-map
    frontier, eps worklist) and kd_decode_lattice (LatticeSimpleDecoder
    token/ForwardLink structure + windowed backward pruning + max-active —
    the same lattice-mode work the device metric measures).  Returns the
    LATTICE-mode audio-s/s (the apples-to-apples vs_baseline denominator),
    or None if the native library is unavailable."""
    from kaldi_decoder_tpu import native

    if not native.available():
        return None
    # Full first utterance, same min_active as the device config — the
    # same workload and beam-adaptation behavior the device number sees
    # (one utterance of B; the C++ decoder is single-threaded so its
    # per-utterance rate IS its batch rate).
    frames = int(lengths[0])
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        _, nf, toks = native.decode_faster(
            graph, scores[0, :frames], beam=BEAM, max_active=MAX_ACTIVE,
            min_active=200,
        )
        best = min(best, time.time() - t0)
    sps = nf * FRAME_SECONDS / best
    log(f"  C++ single-thread best-path decoder: {nf} frames "
        f"in {best:.2f}s ({sps:.2f} audio-s/s, {toks} tokens)")
    best_l = np.inf
    for _ in range(2):
        t0 = time.time()
        _, st = native.decode_lattice(
            graph, scores[0, :frames], beam=BEAM, max_active=MAX_ACTIVE,
            min_active=200, lattice_beam=LATTICE_BEAM, prune_interval=25,
        )
        best_l = min(best_l, time.time() - t0)
    sps_l = st["frames"] * FRAME_SECONDS / best_l
    log(f"  C++ single-thread LATTICE decoder: {st['frames']} frames in "
        f"{best_l:.2f}s ({sps_l:.2f} audio-s/s, {st['links']} links, "
        f"{st['links_live']} live)")
    return sps_l


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
    if GRAPH_KIND == "hlg":
        graph, scores, lengths, refs = build_hlg_workload()
        name = "native HLG"
    else:
        graph, scores, lengths, refs = build_synthetic_workload()
        name = "HLG-shaped synthetic"
    log(f"bench: lattice decode  {name}  S={graph.num_states} "
        f"E={graph.num_emitting_arcs}+{graph.num_eps_arcs}eps V={V} "
        f"B={B} T={T} em_records={EM_RECORDS}")
    dec = make_decoder(graph)
    _stage("decoder built (graph transferred lazily)")
    dev_sps = device_throughput(graph, dec, scores, lengths)
    e2e_sps, wer_val = e2e_with_lattices(graph, dec, scores, lengths, refs)
    base_native = baseline_throughput_native(graph, scores, lengths)
    base_py = baseline_throughput(graph, scores)
    # vs_baseline is measured against the C++ single-thread decoder (the
    # honest compiled-language baseline); the Python loop is logged for
    # r1-r3 continuity.
    base_sps = base_native if base_native else base_py
    # Link recall of this config vs the exact oracle, as measured by
    # scripts/measure_recall.py --save (stored beside the graph cache);
    # carried in the metric string per VERDICT r3.
    recall_note = ""
    rfile = CACHE_DIR / "recall.json"
    if GRAPH_KIND == "hlg" and rfile.exists():
        key = (
            f"em{EM_RECORDS}_rem{REM_BUDGET}_f{FRONTIER}_b{BEAM:g}"
            f"_ma{MAX_ACTIVE}"
        )
        rec = json.loads(rfile.read_text()).get(key)
        recall_note = (
            f", link recall {rec:.3f} vs oracle" if rec is not None
            else ", recall unmeasured"
        )
    cfg_tag = (
        f"B{B} beam{BEAM:g} ma{MAX_ACTIVE} em{EM_RECORDS} rem{REM_BUDGET}"
    )
    out = {
        "metric": f"{name} lattice decode throughput per chip"
        + (f" (WER {100 * wer_val:.2f}%" + recall_note + f"; {cfg_tag})"
           if wer_val is not None else f" ({cfg_tag})"),
        "value": round(dev_sps, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(dev_sps / base_sps, 2),
        # End-to-end including lattice output (pipelined, best depth of
        # 2/3/4) — the number a production user receives; the device scan
        # value above is the headline forward-pass rate.
        "e2e_with_lattices": round(e2e_sps, 2),
        "e2e_vs_baseline": round(e2e_sps / base_sps, 2),
    }
    log(f"  e2e incl. host lattices: {round(e2e_sps, 2)} audio-s/s/chip")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
