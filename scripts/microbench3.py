#!/usr/bin/env python
"""Amortized micro-bench: each op looped 50x inside one jit (fori_loop with
data dependency), so the axon dispatch latency (~3ms/call) is excluded."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = 50
B = 8


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf).reshape(-1)[:1]


def bench(name, make_fn, *args, iters=ITERS):
    """make_fn returns (loop_body, init_carry); we time the jitted loop."""
    body, init = make_fn(*args)

    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, iters, body, c)

    sync(run(init))  # compile+warm
    sync(run(init))
    t0 = time.time()
    out = run(init)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:42s} {dt*1e3:8.4f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    S, V, K, N, R = 200_000, 500, 4096, 45056, 8192

    # --- row gather from (S, D) tables, varying row width ---
    for D in (5, 8, 16, 32, 45, 48, 64, 128):
        table = jnp.asarray(rng.integers(0, 2**30, (S, D)).astype(np.int32))
        idx0 = jnp.asarray(rng.integers(0, S, (B, K)).astype(np.int32))

        def mk(table=table, idx0=idx0, D=D):
            def body(i, idx):
                rows = table[idx]  # vmapped row gather (B, K, D)
                # dependency: derive next indices from gathered data
                return (idx + rows[..., 0]) % S

            return body, idx0

        bench(f"row-gather (S,{D}) x{K} idx int32", mk)

    # --- element gather 45k from (V,) per batch row ---
    sc = jnp.asarray(rng.random((B, V)).astype(np.float32))
    si0 = jnp.asarray(rng.integers(0, V, (B, N)).astype(np.int32))

    def mk_eg():
        def body(i, carry):
            si, acc = carry
            g = jnp.take_along_axis(sc, si % V, axis=1)
            return ((si + 1) % V, acc + g[:, :1])

        return body, (si0, jnp.zeros((B, 1), jnp.float32))

    bench(f"elem-gather {N} from (V={V},)", mk_eg)

    # --- one-hot matmul score ---
    def mk_oh():
        def body(i, carry):
            si, acc = carry
            oh = jax.nn.one_hot(si, V, dtype=jnp.float32)
            g = jnp.einsum("bnv,bv->bn", oh, sc)
            return (si, acc + g[:, :1])

        return body, (si0, jnp.zeros((B, 1), jnp.float32))

    bench(f"one-hot matmul {N}x{V}", mk_oh)

    # --- sort 45k, 1 key + 2 payloads ---
    k0 = jnp.asarray(rng.integers(0, S, (B, N)).astype(np.int32))
    p0 = jnp.asarray(rng.random((B, N)).astype(np.float32))
    q0 = jnp.asarray(rng.integers(0, N, (B, N)).astype(np.int32))

    def mk_sort(n):
        def body(i, carry):
            k, p, q = carry
            k2, p2, q2 = jax.vmap(
                lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1)
            )(k[:, :n], p[:, :n], q[:, :n])
            # dependency + reshuffle so next sort isn't on sorted data
            k = k.at[:, :n].set(jnp.roll(k2, 7, axis=1) ^ (i + 1))
            return (k, p.at[:, :n].set(p2), q.at[:, :n].set(q2))

        return body, (k0, p0, q0)

    for n in (8192, 18432, N):
        bench(f"sort n={n} 1key+2pay", mk_sort, n)

    # --- top_k 4096 over 45k ---
    def mk_topk():
        def body(i, carry):
            c, acc = carry
            v, ix = jax.vmap(lambda x: jax.lax.top_k(x, K))(c)
            return (jnp.roll(c, 3, axis=1) + 1e-7, acc + v[:, :1])

        return body, (p0, jnp.zeros((B, 1), jnp.float32))

    bench(f"top_k {K} over {N}", mk_topk)

    # --- associative scan (max) over 45k ---
    def mk_scan():
        def body(i, c):
            s = jax.vmap(lambda x: jax.lax.associative_scan(jnp.maximum, x))(c)
            return jnp.roll(s, 1, axis=1) - 1.0

        return body, p0

    bench(f"assoc_scan max n={N}", mk_scan)

    # --- cumsum over 45k ---
    def mk_cumsum():
        def body(i, c):
            s = jnp.cumsum(c, axis=1)
            return jnp.roll(c, 1, axis=1) + s[:, :1] * 0.0

        return body, p0

    bench(f"cumsum n={N}", mk_cumsum)

    # --- scatter N -> K unique drop ---
    t0_ = jnp.asarray(
        np.stack([rng.permutation(N).astype(np.int32) for _ in range(B)])
    )

    def mk_scatter():
        def body(i, carry):
            t, v = carry
            def one(tt, vv):
                return jnp.zeros((K,), jnp.float32).at[
                    jnp.where(tt < K, tt, N)
                ].set(vv, mode="drop", unique_indices=True)
            out = jax.vmap(one)(t, v)
            return ((t + 1) % N, v + out[:, :1] * 0.0)

        return body, (t0_, p0)

    bench(f"scatter {N}->{K} unique drop", mk_scatter)

    # --- scatter-max K ids at K positions into R (map_lanes core) ---
    cnt0 = jnp.asarray(rng.integers(0, 4, (B, K)).astype(np.int32))

    def mk_ml():
        from kaldi_decoder_tpu.ops.segment import map_lanes

        def body(i, c):
            lm = jax.vmap(lambda x: map_lanes(x, R))(c)
            return (c + lm.owner[:, :K] * 0) % 4

        return body, cnt0

    bench(f"map_lanes K={K} R={R}", mk_ml)

    # --- full frame steps, amortized ---
    from kaldi_decoder_tpu.decoders.frontier import (
        StepState,
        config_for_graph,
        frame_step,
    )
    from kaldi_decoder_tpu.decoders.lattice_dev import (
        lattice_config_for_graph,
        lattice_frame_step,
    )
    from kaldi_decoder_tpu.fst.pack import pack_graph
    from kaldi_decoder_tpu.fst.synthetic import synthetic_graph

    graph = synthetic_graph(S, 1_000_000, V, seed=0, eps_arcs=100_000)
    fc = config_for_graph(
        graph, beam=15.0, max_active=4000, min_active=200,
        frontier_size=K, rem_budget=R, eps_rem_budget=2048,
    )
    lcfg = lattice_config_for_graph(graph, fc, em_records=4096, eps_records=1024)
    pg = jax.tree.map(
        jnp.asarray, pack_graph(graph, fc.block_width, fc.eps_block_width)
    )
    states = np.zeros((B, K), np.int32)
    costs = np.full((B, K), np.inf, np.float32)
    for b in range(B):
        states[b, :4000] = rng.choice(S, 4000, replace=False)
        costs[b, :4000] = np.sort(rng.random(4000).astype(np.float32) * 10)
    st0 = StepState(
        jnp.asarray(states), jnp.asarray(costs), jnp.zeros((B,), jnp.float32)
    )
    sc_t = jnp.asarray(
        np.log(rng.dirichlet(np.ones(V), size=B)).astype(np.float32)
    )

    def mk_frame(stepfn, cfg):
        def body(i, st):
            new, _ = jax.vmap(
                lambda s, x: stepfn(s, x, jnp.bool_(True), pg, cfg, S)
            )(st, sc_t)
            return new

        return body, st0

    bench("viterbi frame_step", mk_frame, frame_step, fc, iters=20)
    bench("lattice frame_step", mk_frame, lattice_frame_step, lcfg, iters=20)


if __name__ == "__main__":
    main()
