#!/usr/bin/env python
"""Ablation bench: frame_step variants with stages stubbed out (wrong
results, timing only), amortized over 20 iters inside one jit."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B = 8


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf).reshape(-1)[:1]


def bench(name, body, init, iters=20):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, iters, body, c)

    sync(run(init))
    sync(run(init))
    t0 = time.time()
    out = run(init)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.3f} ms")
    return dt


def main():
    from kaldi_decoder_tpu.decoders.frontier import (
        StepState,
        config_for_graph,
        expand_emitting,
        expand_eps,
    )
    from kaldi_decoder_tpu.fst.pack import pack_graph
    from kaldi_decoder_tpu.fst.synthetic import synthetic_graph
    from kaldi_decoder_tpu.ops.cutoff import get_cutoff
    from kaldi_decoder_tpu.ops.segment import dedup_select, dedup_select_rec

    S, V = 200_000, 500
    graph = synthetic_graph(S, 1_000_000, V, seed=0, eps_arcs=100_000)
    fc = config_for_graph(
        graph, beam=15.0, max_active=4000, min_active=200,
        frontier_size=4096, rem_budget=8192, eps_rem_budget=2048,
    )
    K = fc.frontier_size
    pg = jax.tree.map(
        jnp.asarray, pack_graph(graph, fc.block_width, fc.eps_block_width)
    )
    rng = np.random.default_rng(0)
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

    def one_expand(st):
        active = jnp.isfinite(st.costs)
        return jax.vmap(lambda s, a: expand_emitting(s, a, sc_t[0], pg, fc))(
            st, active
        )

    # A. expansion only (keep frontier unchanged, fold cand into costs)
    def body_a(i, st):
        cand = one_expand(st)
        delta = jnp.min(cand.cost, axis=1, keepdims=True) * 0.0
        return StepState(st.states, st.costs + delta, st.base)

    bench("A expand_emitting only", body_a, st0)

    # B. expansion + dedup (no eps, no records)
    def body_b(i, st):
        cand = one_expand(st)
        sel = jax.vmap(lambda d, c: dedup_select(d, c, K, S))(
            cand.dst, cand.cost
        )
        return StepState(sel.states % S, sel.costs - sel.costs[:, :1], st.base)

    bench("B expand + dedup_select", body_b, st0)

    # B2. expansion + dedup_rec (records riding the sort) + payload gathers
    def body_b2(i, st):
        cand = one_expand(st)
        sel = jax.vmap(lambda d, c: dedup_select_rec(d, c, K, S, 4096))(
            cand.dst, cand.cost
        )
        ok = sel.cand_idx >= 0
        safe = jnp.where(ok, sel.cand_idx, 0)
        slot = jnp.take_along_axis(cand.src_slot, safe, axis=1)
        arc = jnp.take_along_axis(cand.arc_id, safe, axis=1)
        okr = sel.rec_idx >= 0
        safer = jnp.where(okr, sel.rec_idx, 0)
        rsrc = jnp.take_along_axis(cand.src_slot, safer, axis=1)
        rarc = jnp.take_along_axis(cand.arc_id, safer, axis=1)
        dep = (slot[:, :1] + arc[:, :1] + rsrc[:, :1] + rarc[:, :1]) * 0
        return StepState(
            sel.states % S, sel.costs - sel.costs[:, :1] + dep, st.base
        )

    bench("B2 expand + dedup_rec + payload gathers", body_b2, st0)

    # C. one eps iteration (expand_eps + dedup over concat)
    def body_c(i, st):
        active = jnp.isfinite(st.costs)
        cand = jax.vmap(lambda s, a: expand_eps(s, a, pg, fc))(st, active)
        cs = jnp.concatenate([st.states, cand.dst], axis=1)
        cc = jnp.concatenate([st.costs, cand.cost], axis=1)
        sel = jax.vmap(lambda d, c: dedup_select(d, c, K, S))(cs, cc)
        return StepState(sel.states % S, sel.costs - sel.costs[:, :1], st.base)

    bench("C one eps iteration (expand+dedup)", body_c, st0)

    # D. get_cutoff alone
    def body_d(i, st):
        cut = jax.vmap(
            lambda c: get_cutoff(c, 15.0, 4000, 200, 0.5, costs_sorted=True)
        )(st.costs)
        return StepState(st.states, st.costs + cut.cutoff[:, None] * 0, st.base)

    bench("D get_cutoff only", body_d, st0)

    # E. score one-hot only at N lanes
    N = fc.num_candidates
    sidx0 = jnp.asarray(rng.integers(0, V, (B, N)).astype(np.int32))

    def body_e(i, st):
        oh = jax.nn.one_hot(sidx0, V, dtype=jnp.float32)
        g = jnp.einsum("bnv,bv->bn", oh, sc_t)
        return StepState(st.states, st.costs + g[:, :1] * 0, st.base)

    bench("E one-hot score only", body_e, st0)


if __name__ == "__main__":
    main()
