#!/usr/bin/env python
"""Measure candidate-lane statistics and raw op costs at bench shapes.

Part 1: decode 60 real bench frames and report per-frame distributions of
  - finite-cost candidate lanes
  - lanes under the adaptive-beam cutoff (what dedup actually keeps)
  - unique destination states
  - lanes with slack <= lattice_beam (true record demand)
Part 2: raw op costs with loop-VARIANT inputs (no LICM hoisting):
  sort with 1/2/3 operands, top_k, approx_max_k, scatter-min into dense
  (S,) table, gather back, compaction scatter.
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

from kaldi_decoder_tpu.decoders.frontier import (
    config_for_graph,
    expand_emitting,
)
from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder
from kaldi_decoder_tpu.fst.csr import load_graph_npz
from kaldi_decoder_tpu.ops.cutoff import get_cutoff

B = 8
V = 500
K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REM = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
ITER = 400

gpath = REPO / ".bench_cache" / "hlg_v500_w5000_s0.npz"
graph = load_graph_npz(gpath)
fc = config_for_graph(
    graph, beam=15.0, max_active=4000, min_active=200,
    frontier_size=K, rem_budget=REM, eps_rem_budget=2048,
)
dec = BatchedLatticeDecoder(
    graph, fc, lattice_beam=8.0, em_records=8192, eps_records=1024,
    pad_time_to=60,
)
pg = dec._pg_dev
fcd = dec.cfg.frontier
S = dec._dev_graph.num_states
N = fcd.num_candidates
print(f"S_dev={S}  K={fcd.frontier_size}  W={fcd.block_width}  "
      f"rem={fcd.rem_budget}  N={N}")

# ---- Part 1: real-frame lane statistics --------------------------------
rng = np.random.default_rng(0)
from kaldi_decoder_tpu.fst.hlg import (
    random_lexicon, sample_corpus, synth_posteriors, words_to_tokens,
)
lex = random_lexicon(5000, V, rng, 3, 8)
corpus = sample_corpus(5000, 100, rng, mean_len=60.0)
pron = dict(lex)
toks = words_to_tokens(list(corpus[0])[:80], pron)
sc = synth_posteriors(toks, V, np.random.default_rng(42))
T = min(60, sc.shape[0])
scores = np.tile(sc[None, :T], (B, 1, 1)).astype(np.float32)
lengths = np.full(B, T, np.int32)

st0, _, _, _ = dec._init(B)


@jax.jit
def stats_frames(st0, scores):
    def body(st, sc_t):
        def per_utt(stu, z):
            cut = get_cutoff(stu.costs, fcd.beam, fcd.max_active,
                             fcd.min_active, fcd.beam_delta, costs_sorted=True)
            active = jnp.isfinite(stu.costs) & (stu.costs < cut.cutoff)
            cand = expand_emitting(stu, active, z, pg, fcd)
            best_new = jnp.min(cand.cost)
            next_cutoff = best_new + cut.adaptive_beam
            finite = jnp.isfinite(cand.cost)
            inbeam = cand.cost < next_cutoff
            # winner cost per destination via dense scatter-min
            tbl = jnp.full((S,), jnp.inf).at[
                jnp.where(inbeam, cand.dst, S - 1)
            ].min(jnp.where(inbeam, cand.cost, jnp.inf))
            wc = tbl[cand.dst]
            slack_ok = inbeam & (cand.cost - wc <= 8.0)
            uniq = jnp.sum(jnp.isfinite(tbl))
            return jnp.array([jnp.sum(finite), jnp.sum(inbeam),
                              uniq, jnp.sum(slack_ok)], jnp.int32)

        stats = jax.vmap(per_utt)(st, sc_t)
        # advance frontier via the real step
        from kaldi_decoder_tpu.decoders.lattice_dev import lattice_frame_step_batched
        st2, _ = lattice_frame_step_batched(
            st, sc_t, jnp.ones((B,), bool), pg, dec.cfg, S)
        return st2, stats

    _, out = jax.lax.scan(body, st0, jnp.moveaxis(scores, 1, 0))
    return out

st_stats = np.asarray(stats_frames(st0, jnp.asarray(scores)))  # (T, B, 4)
st_stats = st_stats[5:]  # skip warmup frames
names = ["finite lanes", "in-adaptive-beam", "unique dst states", "slack<=8 lanes"]
print("\nper-frame lane statistics (after frame 5):")
for i, nm in enumerate(names):
    v = st_stats[:, :, i].ravel()
    print(f"  {nm:20s} mean={v.mean():8.0f}  p50={np.percentile(v,50):8.0f}  "
          f"p90={np.percentile(v,90):8.0f}  max={v.max():8.0f}")

# ---- Part 2: raw op costs with loop-variant inputs ---------------------
key = jax.random.PRNGKey(1)
base_state = jax.random.randint(key, (B, N), 0, S, jnp.int32)
base_cost = jnp.abs(jax.random.normal(key, (B, N)) * 5)


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.time() - t0)
    print(f"{name:44s} {min(ts) / ITER * 1e3:8.3f} ms")


def variant(i, x):
    # cheap loop-variant perturbation that XLA cannot hoist
    return x ^ (i + 1) if x.dtype == jnp.int32 else x + jnp.float32(i) * 1e-6


@jax.jit
def b_sort1(cs):
    def body(i, acc):
        s = jax.vmap(lambda a: jax.lax.sort(a))(variant(i, cs) & 0x7FFFFFFF)
        return acc + s[:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B, jnp.int32))

timeit("sort 1 operand int32", b_sort1, base_state)


@jax.jit
def b_sort2(cs, cc):
    def body(i, acc):
        s, c = jax.vmap(lambda a, b: jax.lax.sort((a, b), num_keys=1))(
            variant(i, cs) & 0x7FFFFFFF, cc)
        return acc + c[:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit("sort 2 operands", b_sort2, base_state, base_cost)


@jax.jit
def b_sort3(cs, cc):
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    def body(i, acc):
        s, c, ii = jax.vmap(lambda a, b, d: jax.lax.sort((a, b, d), num_keys=1))(
            variant(i, cs) & 0x7FFFFFFF, cc, idx)
        return acc + c[:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit("sort 3 operands", b_sort3, base_state, base_cost)


@jax.jit
def b_topk(cc):
    def body(i, acc):
        v, p = jax.vmap(lambda b: jax.lax.top_k(variant(i, b), K))(cc)
        return acc + v[:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit(f"top_k k={K}", b_topk, base_cost)


@jax.jit
def b_approx(cc):
    def body(i, acc):
        v, p = jax.vmap(lambda b: jax.lax.approx_max_k(variant(i, b), K))(cc)
        return acc + v[:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit(f"approx_max_k k={K}", b_approx, base_cost)


@jax.jit
def b_scatter_min(cs, cc):
    def body(i, acc):
        tbl = jax.vmap(
            lambda a, b: jnp.full((S,), jnp.inf).at[a].min(b)
        )(variant(i, cs) % S, cc)
        return acc + tbl[:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit(f"scatter-min into dense ({S},)", b_scatter_min, base_state, base_cost)


@jax.jit
def b_gather_dense(cs):
    tbl = jnp.zeros((B, S))
    def body(i, acc):
        g = jax.vmap(lambda t, a: t[a])(tbl, variant(i, cs) % S)
        return acc + g[:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit(f"gather N from dense ({S},)", b_gather_dense, base_state)


@jax.jit
def b_compact(cs, cc):
    def body(i, acc):
        mask = variant(i, cc) < 2.0
        pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(mask & (pos < 16384), pos, 16384)
        out = jax.vmap(
            lambda t, v: jnp.zeros((16385,), jnp.int32).at[t].set(v, mode="drop")
        )(tgt, cs)
        return acc + out[:, 0].astype(jnp.float32)
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit("cumsum+scatter compaction to 16k", b_compact, base_state, base_cost)


@jax.jit
def b_cumsum(cc):
    def body(i, acc):
        c = jnp.cumsum((variant(i, cc) < 2.0).astype(jnp.int32), axis=1)
        return acc + c[:, -1].astype(jnp.float32)
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit("cumsum only", b_cumsum, base_cost)


@jax.jit
def b_sort_2key(cs, cc):
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    def body(i, acc):
        s, c, ii = jax.vmap(lambda a, b, d: jax.lax.sort((a, b, d), num_keys=2))(
            variant(i, cs) & 0x7FFFFFFF, cc, idx)
        return acc + c[:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit("sort 3 operands num_keys=2", b_sort_2key, base_state, base_cost)


@jax.jit
def b_scan3t(cc):
    def body(i, acc):
        def op(a, bb):
            fa, ca, ia = a
            fb, cb, ib = bb
            take_b = fb | (cb <= ca)
            return (fa | fb, jnp.where(take_b, cb, ca), jnp.where(take_b, ib, ia))
        f = variant(i, cc) > 2.0
        r = jax.vmap(lambda ff, c: jax.lax.associative_scan(
            op, (ff, c, jnp.arange(N, dtype=jnp.int32))))(f, cc)
        return acc + r[1][:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit("assoc_scan 3-tuple (segmin)", b_scan3t, base_cost)


@jax.jit
def b_scan4t(cc):
    def body(i, acc):
        def op(a, bb):
            fa, ca, ia, sa = a
            fb, cb, ib, sb = bb
            return (fa | fb, jnp.where(fb, cb, ca), jnp.where(fb, ib, ia),
                    jnp.where(fb, sb, sa))
        f = variant(i, cc) > 2.0
        r = jax.vmap(lambda ff, c: jax.lax.associative_scan(
            op, (ff, c, jnp.arange(N, dtype=jnp.int32), ff)))(f, cc)
        return acc + r[1][:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit("assoc_scan 4-tuple (fill)", b_scan4t, base_cost)


@jax.jit
def b_cummax(cc):
    def body(i, acc):
        f = variant(i, cc) > 2.0
        x = jnp.where(f, jnp.arange(N, dtype=jnp.int32)[None], 0)
        r = jax.lax.associative_scan(jnp.maximum, x, axis=1)
        return acc + r[:, -1].astype(jnp.float32)
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit("cummax 1-int32", b_cummax, base_cost)


@jax.jit
def b_gatherN(cs, cc):
    def body(i, acc):
        p = variant(i, cs) % N
        g = jax.vmap(lambda c, pp: c[pp])(cc, p)
        return acc + g[:, 0]
    return jax.lax.fori_loop(0, ITER, body, jnp.zeros(B))

timeit("gather N from N", b_gatherN, base_state, base_cost)
