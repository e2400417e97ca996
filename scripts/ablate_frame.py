#!/usr/bin/env python
"""Ablate the lattice emit stage piecewise on the real bench graph
(chained-dependency timing; per-piece cost at bench shapes)."""

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os

B = int(os.environ.get("AB_B", "8"))
V = 500
K = int(os.environ.get("AB_K", "4096"))
R = int(os.environ.get("AB_R", "8192"))
REM = int(os.environ.get("AB_REM", "32768"))
MA = int(os.environ.get("AB_MA", "4000"))
REPS = 12


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def bench(name, fn, *arrays, reps=3):
    @jax.jit
    def run(*arrs):
        acc = arrs
        out = None
        for _ in range(REPS):
            out = fn(*acc)
            d = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.int32)
            acc = tuple(
                x ^ (d & 1) if x.dtype == jnp.int32
                else x + (d & 1).astype(x.dtype) * 1e-7
                for x in acc
            )
        return jax.tree.leaves(out)[0]

    out = run(*arrays)
    sync(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        out = run(*arrays)
        sync(out)
        best = min(best, time.time() - t0)
    print(f"{name:58s} {best / REPS * 1e3:8.3f} ms", flush=True)


def main():
    from kaldi_decoder_tpu.fst.csr import load_graph_npz
    from kaldi_decoder_tpu.fst.pack import pack_graph_device
    from kaldi_decoder_tpu.decoders.frontier import (
        StepState, config_for_graph, expand_emitting,
    )
    from kaldi_decoder_tpu.decoders.lattice_dev import lattice_emit_stage
    from kaldi_decoder_tpu.decoders.viterbi import _maybe_fold
    from kaldi_decoder_tpu.ops.segment import dedup_select_rec
    from kaldi_decoder_tpu.ops.cutoff import get_cutoff

    g = load_graph_npz(REPO / ".bench_cache/hlg_v500_w5000_s0.npz")
    fold = _maybe_fold(g, True)
    dg = fold.device if fold is not None else g
    fc = config_for_graph(
        dg, beam=15.0, max_active=MA, min_active=200, frontier_size=K,
        rem_budget=REM, eps_rem_budget=2048, block_width=3, flat_group=4,
    )
    pg = pack_graph_device(dg, fc.block_width, fc.eps_block_width, fc.flat_group)
    S = dg.num_states
    N = fc.num_candidates
    print(f"W={fc.block_width} G={fc.flat_group} N={N}")

    rng = np.random.default_rng(0)
    states = jnp.asarray(
        np.sort(rng.choice(S, size=(B, K), replace=True)).astype(np.int32), )
    costs_np = np.sort(rng.uniform(0, 12, size=(B, K))).astype(np.float32)
    costs = jnp.asarray(costs_np)
    base = jnp.zeros((B,), jnp.float32)
    scores_t = jnp.asarray(
        np.log(rng.dirichlet(np.ones(V), size=(B,))).astype(np.float32)
    )

    def mkst(s, c):
        return StepState(s, c, base)

    bench(
        "em_block row gather only (K x 11)",
        lambda s: jax.vmap(lambda sv: pg.em_block[sv].sum())(s),
        states,
    )

    def expand_only(s, c, sc):
        def one(sv, cv, scv):
            st = StepState(sv, cv, jnp.float32(0))
            active = jnp.isfinite(cv)
            cand = expand_emitting(st, active, scv, pg, fc)
            return cand.cost.sum() + cand.dst.sum()
        return jax.vmap(one)(s, c, sc)
    bench("expand_emitting (incl. score matmul)", expand_only, states, costs, scores_t)

    import dataclasses as _dc
    fc_nosc = _dc.replace(fc, score_onehot=False)

    def expand_gather_score(s, c, sc):
        def one(sv, cv, scv):
            st = StepState(sv, cv, jnp.float32(0))
            active = jnp.isfinite(cv)
            cand = expand_emitting(st, active, scv, pg, fc_nosc)
            return cand.cost.sum() + cand.dst.sum()
        return jax.vmap(one)(s, c, sc)
    bench("expand_emitting (plain-gather score lookup)",
          expand_gather_score, states, costs, scores_t)

    fc_norem = _dc.replace(fc, rem_budget=8)

    def expand_norem(s, c, sc):
        def one(sv, cv, scv):
            st = StepState(sv, cv, jnp.float32(0))
            active = jnp.isfinite(cv)
            cand = expand_emitting(st, active, scv, pg, fc_norem)
            return cand.cost.sum() + cand.dst.sum()
        return jax.vmap(one)(s, c, sc)
    bench("expand_emitting (rem_budget=8: block+score only)",
          expand_norem, states, costs, scores_t)

    def expand_dedup(s, c, sc):
        def one(sv, cv, scv):
            st = StepState(sv, cv, jnp.float32(0))
            active = jnp.isfinite(cv)
            cand = expand_emitting(st, active, scv, pg, fc)
            sel = dedup_select_rec(
                cand.dst, cand.cost, K, S, R, slack_beam=8.0,
                payload=(cand.src_state, cand.arc_id),
            )
            return sel.states
        return jax.vmap(one)(s, c, sc)
    bench("expand + dedup_select_rec", expand_dedup, states, costs, scores_t)

    def full_stage(s, c, sc):
        def one(sv, cv, scv):
            st = StepState(sv, cv, jnp.float32(0))
            mid, em_rec, *_ = lattice_emit_stage(st, scv, pg, fc, S, R, 8.0)
            return mid.states
        return jax.vmap(one)(s, c, sc)
    bench("full lattice_emit_stage", full_stage, states, costs, scores_t)

    bench("NULL op (chain floor; subtract from rows above)",
          lambda c: jax.vmap(lambda cv: cv[0] + 0.0)(c), costs)

    def cutoff_only(c):
        return jax.vmap(
            lambda cv: get_cutoff(cv, 15.0, MA, 200, 0.5, costs_sorted=True).cutoff
        )(c)
    bench("get_cutoff", cutoff_only, costs)


if __name__ == "__main__":
    main()
