#!/usr/bin/env python
"""Microbenchmark the lattice frame-step sub-ops at bench shapes.

Times, inside one jit each and amortized over ITER repeats driven by a
fori_loop (so dispatch overhead vanishes):
  - full lattice_emit_stage (the per-frame hot path, minus eps)
  - expand_emitting alone
  - score one-hot matmul vs element gather
  - the _dedup_core sort
  - the two top_k calls
  - the fill associative_scan
Run on the real chip: python scripts/microbench_dedup.py
"""
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from kaldi_decoder_tpu.decoders.frontier import config_for_graph
from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder
from kaldi_decoder_tpu.fst.csr import load_graph_npz

B = 8
V = 500
K = 4096
REM = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
EM_RECORDS = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
ITER = 20
SUB = 400

gpath = REPO / ".bench_cache" / "hlg_v500_w5000_s0.npz"
graph = load_graph_npz(gpath)
fc = config_for_graph(
    graph, beam=15.0, max_active=4000, min_active=200,
    frontier_size=K, rem_budget=REM, eps_rem_budget=2048,
)
dec = BatchedLatticeDecoder(
    graph, fc, lattice_beam=8.0, em_records=EM_RECORDS, eps_records=1024,
    pad_time_to=ITER,
)
pg = dec._pg_dev
fcd = dec.cfg.frontier  # config after fold (the real device config)
print("device cfg:", {f: getattr(fcd, f) for f in
      ("frontier_size", "block_width", "rem_budget", "eps_iters")},
      "em_records:", dec.cfg.em_records, file=sys.stderr)
S = dec._dev_graph.num_states

rng = np.random.default_rng(0)
scores = jnp.asarray(
    np.log(rng.dirichlet(np.ones(V), size=(B, ITER)).astype(np.float32))
)
lengths = jnp.full((B,), ITER, jnp.int32)
st0, _, _, _ = dec._init(B)

def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x,
        "block_until_ready") else x, out)
    # axon relay: scalar fetch as barrier
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[:1]
        ts.append(time.time() - t0)
    best = min(ts)
    it = ITER if name.startswith('full') else SUB
    print(f"{name:40s} {best / it * 1e3:8.3f} ms/frame  (total {best:.3f}s / {it})")
    return out

# 1) Full chunk (ITER frames) — ground truth per-frame cost.
timeit("full lattice chunk", lambda: dec._chunk_fn(pg, scores, lengths, st0))

# 2) Pieces, iterated via scan to amortize.
from kaldi_decoder_tpu.decoders.frontier import StepState, expand_emitting
from kaldi_decoder_tpu.decoders.lattice_dev import lattice_emit_stage
from kaldi_decoder_tpu.ops import segment as seg

states0 = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None] % S, (B, 1))
costs0 = jnp.tile(jnp.sort(jnp.abs(jax.random.normal(jax.random.PRNGKey(0),
    (K,)) * 3))[None], (B, 1))
stK = StepState(states0, costs0, jnp.zeros((B,), jnp.float32))
active = jnp.ones((B, K), bool)

def loop(fn):
    def run(x):
        def body(i, c):
            o = fn(c, i)
            return jax.tree.map(lambda a, b: a, c, c) if o is None else c
        return jax.lax.fori_loop(0, ITER, body, x)
    return jax.jit(run)

# expand_emitting alone
@jax.jit
def bench_expand(st, sc):
    def body(i, acc):
        cand = jax.vmap(lambda s, z: expand_emitting(s, active[0], z, pg, fcd))(st, sc[:,
            i % ITER])
        extras = (
            jnp.sum(cand.dst) + jnp.sum(cand.src_slot) + jnp.sum(cand.arc_id)
        ).astype(jnp.float32)
        return acc + jnp.sum(
            jnp.where(jnp.isfinite(cand.cost), cand.cost, 0.0)
        ) + extras * 1e-12
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("expand_emitting (incl. score matmul)", bench_expand, stK, scores)

# emit stage full
@jax.jit
def bench_emit(st, sc):
    def body(i, acc):
        mid, em_rec, *_ = jax.vmap(
            lambda s, z: lattice_emit_stage(s, z, pg, fcd, S, dec.cfg.em_records, 8.0)
        )(st, sc[:, i % ITER])
        return acc + jnp.sum(mid.costs[:, 0]) + jnp.sum(em_rec).astype(jnp.float32) * 1e-9
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("lattice_emit_stage (full)", bench_emit, stK, scores)

# dedup pieces at candidate count N
N = fcd.num_candidates
print(f"candidate lanes N = {N}", file=sys.stderr)
key = jax.random.PRNGKey(1)
cst = jax.random.randint(key, (B, N), 0, S, jnp.int32)
cco = jnp.abs(jax.random.normal(key, (B, N)) * 5)

@jax.jit
def bench_sort(cs, cc):
    def body(i, acc):
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        s2, c2, i2 = jax.vmap(lambda a, b, c: jax.lax.sort((a, b, c),
            num_keys=1))(cs + i * 0, cc, idx)
        return acc + jnp.sum(c2[:, :1])
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("state-sort (3 operands, 1 key)", bench_sort, cst, cco)

@jax.jit
def bench_sort2(cs, cc):
    def body(i, acc):
        s2, c2 = jax.vmap(lambda a, b: jax.lax.sort((a, b), num_keys=1))(cs + i * 0, cc)
        return acc + jnp.sum(c2[:, :1])
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("state-sort (2 operands, 1 key)", bench_sort2, cst, cco)

@jax.jit
def bench_topk(cc):
    def body(i, acc):
        _, p = jax.vmap(lambda b: jax.lax.top_k(b + i * 0, K))(cc)
        return acc + jnp.sum(p[:, :1])
    return jax.lax.fori_loop(0, SUB, body, jnp.int32(0))

timeit(f"top_k k={K} over N", bench_topk, cco)

@jax.jit
def bench_scan4(cc):
    def body(i, acc):
        def op(a, bb):
            fa, ca, ia, sa = a
            fb, cb, ib, sb = bb
            return (fa | fb, jnp.where(fb, cb, ca), jnp.where(fb, ib, ia), jnp.where(fb,
                sb, sa))
        f = cc > 2.0
        r = jax.vmap(lambda ff, c: jax.lax.associative_scan(
            op, (ff, c + i * 0, jnp.arange(N, dtype=jnp.int32), ff)))(f, cc)
        return acc + jnp.sum(r[1][:, :1])
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("associative_scan 4-tuple fill", bench_scan4, cco)

@jax.jit
def bench_scan3(cc):
    def body(i, acc):
        def op(a, bb):
            fa, ca, ia = a
            fb, cb, ib = bb
            take_b = fb | (cb <= ca)
            return (fa | fb, jnp.where(take_b, cb, ca), jnp.where(take_b, ib, ia))
        f = cc > 2.0
        r = jax.vmap(lambda ff, c: jax.lax.associative_scan(
            op, (ff, c + i * 0, jnp.arange(N, dtype=jnp.int32))))(f, cc)
        return acc + jnp.sum(r[1][:, :1])
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("associative_scan 3-tuple segmin", bench_scan3, cco)


@jax.jit
def bench_floor(cc):
    def body(i, acc):
        return acc + cc[0, 0] * 1e-9 + jnp.float32(i) * 0.0
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("empty-loop floor", bench_floor, cco)

@jax.jit
def bench_rec(cs, cc):
    def body(i, acc):
        sel = jax.vmap(lambda a, b: seg.dedup_select_rec(a + i * 0, b, K, S, EM_RECORDS,
            8.0))(cs, cc)
        return acc + jnp.sum(sel.costs[:,
            0]) + jnp.sum(sel.recs[0]).astype(jnp.float32) * 1e-9
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("dedup_select_rec (full)", bench_rec, cst, cco)

@jax.jit
def bench_dedup(cs, cc):
    def body(i, acc):
        sel = jax.vmap(lambda a, b: seg.dedup_select(a + i * 0, b, K, S))(cs, cc)
        return acc + jnp.sum(sel.costs[:,
            0]) + jnp.sum(sel.cand_idx).astype(jnp.float32) * 1e-9
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("dedup_select (no records)", bench_dedup, cst, cco)

# score lookup variants
sidx = jax.random.randint(key, (B, N), 0, V, jnp.int32)
sct = jnp.asarray(np.log(rng.dirichlet(np.ones(V), size=(B,)).astype(np.float32)))

@jax.jit
def bench_onehot(si, sc):
    def body(i, acc):
        r = jax.vmap(lambda a, b: seg.score_lookup(a + i * 0, b, True))(si, sc)
        return acc + jnp.sum(r[:, :1])
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("score one-hot matmul", bench_onehot, sidx, sct)

@jax.jit
def bench_gather(si, sc):
    def body(i, acc):
        r = jax.vmap(lambda a, b: seg.score_lookup(a + i * 0, b, False))(si, sc)
        return acc + jnp.sum(r[:, :1])
    return jax.lax.fori_loop(0, SUB, body, 0.0)

timeit("score element gather", bench_gather, sidx, sct)

# full frame step (batched) in isolation
from kaldi_decoder_tpu.decoders.lattice_dev import lattice_frame_step_batched

@jax.jit
def bench_step(st, sc):
    def body(i, carry):
        stc, acc = carry
        st2, out = lattice_frame_step_batched(
            stc, sc[:, i % ITER], jnp.ones((B,), bool), pg, dec.cfg, S)
        return (st2, acc + jnp.sum(out.em_records).astype(jnp.float32) * 1e-9
                + jnp.sum(out.frontier_costs[:, 0]))
    return jax.lax.fori_loop(0, SUB, body, (st, 0.0))

timeit("lattice_frame_step_batched (full)", bench_step, stK, scores)
