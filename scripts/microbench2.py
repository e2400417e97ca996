#!/usr/bin/env python
"""Finer micro-bench: sub-ops of expand_emitting + dedup alternatives."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf).reshape(-1)[:1]


def timeit(f, *args, n=20, warmup=3):
    for _ in range(warmup):
        sync(f(*args))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    sync(out)
    return (time.time() - t0) / n


def main():
    from kaldi_decoder_tpu.decoders.frontier import config_for_graph
    from kaldi_decoder_tpu.fst.pack import pack_graph
    from kaldi_decoder_tpu.fst.synthetic import synthetic_graph
    from kaldi_decoder_tpu.ops.segment import map_lanes

    B, V = 8, 500
    graph = synthetic_graph(200_000, 1_000_000, V, seed=0, eps_arcs=100_000)
    fc = config_for_graph(
        graph, beam=15.0, max_active=4000, min_active=200,
        frontier_size=4096, rem_budget=8192, eps_rem_budget=2048,
    )
    pg = jax.tree.map(
        jnp.asarray, pack_graph(graph, fc.block_width, fc.eps_block_width)
    )
    S, K, W, R = graph.num_states, fc.frontier_size, fc.block_width, fc.rem_budget
    N = fc.num_candidates
    print(f"K={K} W={W} R={R} N={N}", file=sys.stderr)

    rng = np.random.default_rng(0)
    states = jnp.asarray(rng.integers(0, S, (B, K)).astype(np.int32))
    sidx = jnp.asarray(rng.integers(0, V, (B, N)).astype(np.int32))
    scores_t = jnp.asarray(
        np.log(rng.dirichlet(np.ones(V), size=B)).astype(np.float32)
    )
    counts = jnp.asarray(rng.integers(0, 4, (B, K)).astype(np.int32))

    # a. block row gather (K, W*5)
    @jax.jit
    def f_blk(st):
        return jax.vmap(lambda s: pg.em_block[s])(st)

    print(f"block row-gather (K,{W*5}):   {timeit(f_blk, states)*1e3:7.3f} ms")

    # b. one-hot matmul score lookup
    @jax.jit
    def f_oh(si, sc):
        def one(i, s):
            oh = jax.nn.one_hot(i, V, dtype=s.dtype)
            return oh @ s
        return jax.vmap(one)(si, sc)

    print(f"score one-hot matmul N={N}: {timeit(f_oh, sidx, scores_t)*1e3:7.3f} ms")

    # b2. bf16 one-hot matmul
    @jax.jit
    def f_ohb(si, sc):
        def one(i, s):
            oh = jax.nn.one_hot(i, V, dtype=jnp.bfloat16)
            return (oh @ s.astype(jnp.bfloat16)).astype(jnp.float32)
        return jax.vmap(one)(si, sc)

    print(f"score one-hot bf16:        {timeit(f_ohb, sidx, scores_t)*1e3:7.3f} ms")

    # c. plain gather score lookup
    @jax.jit
    def f_g(si, sc):
        return jax.vmap(lambda i, s: s[i])(si, sc)

    print(f"score gather N={N}:        {timeit(f_g, sidx, scores_t)*1e3:7.3f} ms")

    # d. map_lanes alone
    @jax.jit
    def f_ml(c):
        return jax.vmap(lambda x: map_lanes(x, R))(c)

    print(f"map_lanes K={K} R={R}:     {timeit(f_ml, counts)*1e3:7.3f} ms")

    # e. flat remainder gather (R rows of 5)
    arcs = jnp.asarray(rng.integers(0, graph.num_emitting_arcs, (B, R)).astype(np.int32))

    @jax.jit
    def f_flat(a):
        return jax.vmap(lambda x: pg.em_flat[x])(a)

    print(f"flat row-gather R={R}:      {timeit(f_flat, arcs)*1e3:7.3f} ms")

    # f. sorts at eps sizes
    for n_ in (8192, 18432, 45056):
        keys = jnp.asarray(rng.integers(0, S, (B, n_)).astype(np.int32))
        p1 = jnp.asarray(rng.random((B, n_)).astype(np.float32))
        p2 = jnp.asarray(rng.integers(0, n_, (B, n_)).astype(np.int32))

        @jax.jit
        def f_sort(k, a, b):
            return jax.vmap(lambda x, y, z: jax.lax.sort((x, y, z), num_keys=1))(k, a, b)

        print(f"sort n={n_} 1key+2pay:      {timeit(f_sort, keys, p1, p2)*1e3:7.3f} ms")

    # g. argsort bool (compact_records) at N
    val = jnp.asarray(rng.random((B, N)) < 0.2)

    @jax.jit
    def f_as(v):
        return jax.vmap(lambda x: jnp.argsort(~x))(v)

    print(f"argsort bool N={N}:        {timeit(f_as, val)*1e3:7.3f} ms")

    # h. single fused sort: 2-key (key hi) via int64-free packing:
    # pack (state, cost) into one sortable uint64? skip; try 2-key sort
    keys = jnp.asarray(rng.integers(0, S, (B, N)).astype(np.int32))
    p1 = jnp.asarray(rng.random((B, N)).astype(np.float32))

    @jax.jit
    def f_sort2(k, a):
        i = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), k.shape)
        return jax.vmap(lambda x, y, z: jax.lax.sort((x, y, z), num_keys=2))(k, a, i)

    print(f"sort n={N} 2key+1pay:      {timeit(f_sort2, keys, p1)*1e3:7.3f} ms")

    # i. scatter 45k -> K=4096 (drop), unique targets
    tgt = jnp.asarray(rng.permutation(np.arange(N))[None].repeat(B, 0)[:, :N].astype(np.int32))
    vals = jnp.asarray(rng.random((B, N)).astype(np.float32))

    @jax.jit
    def f_sc(t, v):
        def one(tt, vv):
            return jnp.zeros((K,), jnp.float32).at[
                jnp.where(tt < K, tt, N)
            ].set(vv, mode="drop", unique_indices=True)
        return jax.vmap(one)(t, v)

    print(f"scatter N->K unique:       {timeit(f_sc, tgt, vals)*1e3:7.3f} ms")

    # j. associative_scan (cummax) over N
    @jax.jit
    def f_scan(v):
        return jax.vmap(lambda x: jax.lax.associative_scan(jnp.maximum, x))(vals)

    print(f"assoc_scan N={N}:          {timeit(f_scan, vals)*1e3:7.3f} ms")

    # k. cumsum over N
    @jax.jit
    def f_cs(v):
        return jnp.cumsum(v, axis=1)

    print(f"cumsum N={N}:              {timeit(f_cs, vals)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
