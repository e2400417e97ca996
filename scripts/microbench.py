#!/usr/bin/env python
"""Micro-benchmark of the per-frame hot ops on the current accelerator.

Times each stage of the lattice-decode frame step at the bench.py shapes
(B=8, K=4096, graph 200k states / 1M+100k arcs, V=500) to locate the
bottleneck. Run directly on the TPU (no env overrides).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def sync(x):
    # block_until_ready is unreliable under the axon relay; host-fetch one
    # scalar instead.
    leaf = jax.tree.leaves(x)[0]
    float(np.asarray(leaf).reshape(-1)[0])


def timeit(f, *args, n=20, warmup=3):
    for _ in range(warmup):
        sync(f(*args))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    sync(out)
    return (time.time() - t0) / n


def main():
    from kaldi_decoder_tpu.decoders.frontier import (
        StepState,
        config_for_graph,
        eps_closure,
        expand_emitting,
        frame_step,
    )
    from kaldi_decoder_tpu.decoders.lattice_dev import (
        lattice_config_for_graph,
        lattice_frame_step,
    )
    from kaldi_decoder_tpu.fst.synthetic import synthetic_graph
    from kaldi_decoder_tpu.ops.segment import dedup_select

    B, V = 8, 500
    graph = synthetic_graph(200_000, 1_000_000, V, seed=0, eps_arcs=100_000)
    fc = config_for_graph(
        graph, beam=15.0, max_active=4000, min_active=200,
        frontier_size=4096, rem_budget=8192, eps_rem_budget=2048,
    )
    print(
        f"cfg: K={fc.frontier_size} W={fc.block_width} rem={fc.rem_budget} "
        f"We={fc.eps_block_width} eps_rem={fc.eps_rem_budget} "
        f"eps_iters={fc.eps_iters} N={fc.num_candidates}",
        file=sys.stderr,
    )
    lcfg = lattice_config_for_graph(graph, fc, em_records=4096, eps_records=1024)

    from kaldi_decoder_tpu.fst.pack import pack_graph
    pg = jax.tree.map(jnp.asarray, pack_graph(graph, fc.block_width, fc.eps_block_width))
    S = graph.num_states
    K = fc.frontier_size
    N = fc.num_candidates

    rng = np.random.default_rng(0)
    # Plausible frontier: 4000 live states, sorted costs.
    states = np.zeros((B, K), np.int32)
    costs = np.full((B, K), np.inf, np.float32)
    live = 4000
    for b in range(B):
        states[b, :live] = rng.choice(S, live, replace=False)
        costs[b, :live] = np.sort(rng.random(live).astype(np.float32) * 10)
    st = StepState(jnp.asarray(states), jnp.asarray(costs), jnp.zeros((B,), jnp.float32))
    scores_t = jnp.asarray(
        np.log(rng.dirichlet(np.ones(V), size=B)).astype(np.float32)
    )
    active = jnp.isfinite(st.costs)

    # 1. expansion alone
    @jax.jit
    def f_expand(st, active, scores_t):
        return jax.vmap(lambda s, a, sc: expand_emitting(s, a, sc, pg, fc))(
            st, active, scores_t
        )

    t = timeit(f_expand, st, active, scores_t)
    print(f"expand_emitting (B={B}):      {t*1e3:8.3f} ms")
    cand = f_expand(st, active, scores_t)

    # 2. dedup_select alone
    @jax.jit
    def f_dedup(dst, cost):
        return jax.vmap(lambda d, c: dedup_select(d, c, K, S))(dst, cost)

    t = timeit(f_dedup, cand.dst, cand.cost)
    print(f"dedup_select N={N} (B={B}): {t*1e3:8.3f} ms")

    # 3. eps closure alone
    @jax.jit
    def f_eps(st):
        return jax.vmap(
            lambda s: eps_closure(s, jnp.float32(20.0), pg, fc, S)
        )(st)

    t = timeit(f_eps, st)
    print(f"eps_closure D={fc.eps_iters} (B={B}):    {t*1e3:8.3f} ms")

    # 4. full viterbi frame step
    @jax.jit
    def f_frame(st, scores_t):
        return jax.vmap(
            lambda s, sc: frame_step(s, sc, jnp.bool_(True), pg, fc, S)
        )(st, scores_t)

    t = timeit(f_frame, st, scores_t)
    print(f"viterbi frame_step (B={B}):   {t*1e3:8.3f} ms")

    # 5. full lattice frame step
    @jax.jit
    def f_lframe(st, scores_t):
        return jax.vmap(
            lambda s, sc: lattice_frame_step(s, sc, jnp.bool_(True), pg, lcfg, S)
        )(st, scores_t)

    try:
        t = timeit(f_lframe, st, scores_t)
        print(f"lattice frame_step (B={B}):   {t*1e3:8.3f} ms")
    except Exception as e:
        print(f"lattice frame_step: SKIP ({type(e).__name__}: {e})")

    # 6. raw sort cost at the dedup sizes
    keys = jnp.asarray(rng.integers(0, S, (B, N)).astype(np.int32))
    pay1 = jnp.asarray(rng.random((B, N)).astype(np.float32))
    pay2 = jnp.asarray(rng.integers(0, N, (B, N)).astype(np.int32))

    @jax.jit
    def f_sort(k, p1, p2):
        return jax.vmap(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1))(
            k, p1, p2
        )

    t = timeit(f_sort, keys, pay1, pay2)
    print(f"one sort N={N} 3-tuple (B={B}): {t*1e3:6.3f} ms")

    # 7. scatter-min into dense (S,) table
    @jax.jit
    def f_scatter(dst, cost):
        def one(d, c):
            tbl = jnp.full((S,), jnp.inf, jnp.float32).at[d].min(c, mode="drop")
            return tbl
        return jax.vmap(one)(dst, cost)

    t = timeit(f_scatter, cand.dst, cand.cost)
    print(f"scatter-min S={S} (B={B}):  {t*1e3:8.3f} ms")

    # 8. compaction: cumsum over S + unique-index scatter
    tbl = f_scatter(cand.dst, cand.cost)

    @jax.jit
    def f_compact(tbl):
        def one(tb):
            fin = jnp.isfinite(tb)
            pos = jnp.cumsum(fin.astype(jnp.int32)) - 1
            tgt = jnp.where(fin & (pos < K), pos, K)
            out_s = jnp.zeros((K,), jnp.int32).at[tgt].set(
                jnp.arange(S, dtype=jnp.int32), mode="drop", unique_indices=True
            )
            out_c = jnp.full((K,), jnp.inf, jnp.float32).at[tgt].set(
                tb, mode="drop", unique_indices=True
            )
            return out_s, out_c
        return jax.vmap(one)(tbl)

    t = timeit(f_compact, tbl)
    print(f"compact S->K cumsum+scatter:  {t*1e3:6.3f} ms")

    # 9. top_k at K over N
    @jax.jit
    def f_topk(cost):
        return jax.vmap(lambda c: jax.lax.top_k(-c, K))(cost)

    t = timeit(f_topk, cand.cost)
    print(f"top_k k={K} over N={N}:  {t*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
