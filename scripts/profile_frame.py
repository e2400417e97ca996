#!/usr/bin/env python
"""Decompose the lattice frame-step cost on the real chip (round 4).

NOTE: do NOT reach for ``jax.profiler.trace`` here — under the tunneled
single-chip setup it wedges the device session and every later device
call hangs until the remote pool reaps it (~20 min).  The chained
in-jit timing below is the reliable way to measure.

Two measurement modes, both immune to per-dispatch overhead (~1.5 ms
through the axon relay) and to XLA loop hoisting:

* real frame step: jit(scan) of the production lattice_frame_step_batched
  over 50 frames of the bench HLG — data dependencies are real.
* op microbenches: REPS copies of the op unrolled in one jit, each
  iteration's inputs xor-perturbed by the previous iteration's output, so
  nothing can be hoisted or CSE'd.

Shapes follow the bench configuration: K=4096, W=3, rem=32768 ->
N=45056 lanes, B=8, S=102298 states, R=8192 records.
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8
K = 4096
N = 45056
S = 102298
R = 8192
V = 500
REPS = 12

rng = np.random.default_rng(0)


def sync(x):
    leaves = jax.tree.leaves(x)
    np.asarray(jax.device_get(jax.tree.map(lambda a: a.ravel()[0], leaves[0])))


def perturb(x, d):
    if x.dtype == jnp.int32:
        return x ^ (d & 1)
    return x + (d & 1).astype(x.dtype) * 1e-7


def bench_op(name, op, *arrays, reps=3):
    """op(*arrays) -> array-or-tuple; unrolled REPS times with chained
    input perturbation.  Reports (time - empty_chain_time) / REPS."""

    @jax.jit
    def run(*arrs):
        acc = arrs
        out = None
        for _ in range(REPS):
            out = op(*acc)
            d = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.int32)
            acc = tuple(perturb(x, d) for x in acc)
        return jax.tree.leaves(out)[0]

    @jax.jit
    def run_empty(*arrs):
        acc = arrs
        d = jnp.int32(0)
        for _ in range(REPS):
            d = d + acc[0].ravel()[0].astype(jnp.int32)
            acc = tuple(perturb(x, d) for x in acc)
        return acc[0]

    def t(f):
        out = f(*arrays)
        sync(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            out = f(*arrays)
            sync(out)
            best = min(best, time.time() - t0)
        return best

    per = (t(run) - t(run_empty)) / REPS * 1e3
    print(f"{name:58s} {per:8.3f} ms", flush=True)
    return per


def bench_real_frame():
    """The production chunk fn on the real bench graph, per-frame cost."""
    from kaldi_decoder_tpu.fst.csr import load_graph_npz
    from kaldi_decoder_tpu.decoders.frontier import config_for_graph
    from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder
    from kaldi_decoder_tpu.decoders.viterbi import BatchedViterbiDecoder

    g = load_graph_npz(REPO / ".bench_cache/hlg_v500_w5000_s0.npz")
    scores = np.log(
        rng.dirichlet(np.ones(V), size=(B, 64)).astype(np.float32)
    ).astype(np.float32)
    lengths = np.full(B, 64, np.int32)

    def time_decoder(name, dec, st0=None):
        import jax.numpy as jnp

        if st0 is None:
            st0 = dec._init(B)[0]
        sc = jnp.asarray(scores)
        ln = jnp.asarray(lengths)
        out = dec._chunk_fn(dec._pg_dev, sc, ln, st0)
        sync(out[0].base)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = dec._chunk_fn(dec._pg_dev, sc, ln, st0)
            sync(out[0].base)
            best = min(best, time.time() - t0)
        print(f"{name:58s} {best / 64 * 1e3:8.3f} ms/frame", flush=True)

    common = dict(
        beam=15.0, max_active=4000, min_active=200, frontier_size=K,
        rem_budget=32768, eps_rem_budget=2048,
    )
    fc = config_for_graph(g, **common)
    lat = BatchedLatticeDecoder(
        g, fc, lattice_beam=8.0, em_records=R, eps_records=1024, pad_time_to=64
    )
    time_decoder("REAL lattice frame step (em_records=8192)", lat)
    lat2 = BatchedLatticeDecoder(
        g, fc, lattice_beam=8.0, em_records=4096, eps_records=1024, pad_time_to=64
    )
    time_decoder("REAL lattice frame step (em_records=4096 winners-only)", lat2)
    from kaldi_decoder_tpu.decoders.viterbi import _batched_init

    vit = BatchedViterbiDecoder(g, fc, pad_time_to=64)
    st0 = _batched_init(vit._pg_dev, vit.graph, vit.cfg, B)[0]
    time_decoder("REAL viterbi frame step", vit, st0)


def main():
    print(f"devices: {jax.devices()}  ({REPS} chained in-jit reps)")
    bench_real_frame()

    state = rng.integers(0, S, size=(B, N)).astype(np.int32)
    hot = rng.integers(0, 2000, size=(B, N // 10)).astype(np.int32)
    state[:, : N // 10] = hot
    cost = rng.uniform(0, 15, size=(B, N)).astype(np.float32)
    cost[:, N - N // 8 :] = np.inf
    state = jnp.asarray(state)
    cost = jnp.asarray(cost)
    pay1 = jnp.asarray(rng.integers(0, S, size=(B, N)).astype(np.int32))
    pay2 = jnp.asarray(rng.integers(0, 4_200_000, size=(B, N)).astype(np.int32))
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))

    from kaldi_decoder_tpu.ops.segment import dedup_select, dedup_select_rec

    bench_op(
        "dedup_select_rec (current: 2 sorts + scan + topk)",
        lambda s, co, p1, p2: jax.vmap(
            lambda s_, c_, p1_, p2_: dedup_select_rec(
                s_, c_, K, S, R, slack_beam=8.0, payload=(p1_, p2_)
            )
        )(s, co, p1, p2).states,
        state, cost, pay1, pay2,
    )
    bench_op(
        "dedup_select (viterbi: 1 sort + topk)",
        lambda s, co: jax.vmap(lambda s_, c_: dedup_select(s_, c_, K, S))(
            s, co
        ).states,
        state, cost,
    )

    def mk_sort(nops, nkeys):
        def f(s, co, p1, p2, i):
            ops = [s, co, i, p1, p2][:nops]
            return jax.vmap(lambda *o: jax.lax.sort(tuple(o), num_keys=nkeys))(*ops)[0]
        return f

    bench_op("sort 5 ops 2 keys (current sort1)", mk_sort(5, 2), state, cost, pay1, pay2,
        idx)
    bench_op("sort 4 ops 2 keys", mk_sort(4, 2), state, cost, pay1, pay2, idx)
    bench_op("sort 3 ops 2 keys", mk_sort(3, 2), state, cost, pay1, pay2, idx)
    bench_op("sort 3 ops 1 key", mk_sort(3, 1), state, cost, pay1, pay2, idx)
    bench_op("sort 2 ops 2 keys", mk_sort(2, 2), state, cost, pay1, pay2, idx)
    bench_op("sort 2 ops 1 key (current sort2 shape)", mk_sort(2, 1), state, cost, pay1,
        pay2, idx)

    def f_packed(s, co, p1):
        cq = jnp.clip((co * (32767.0 / 16.0)).astype(jnp.int32), 0, 32767)
        key = s * 32768 + cq
        return jax.vmap(lambda k, p: jax.lax.sort((k, p), num_keys=1))(key, p1)[0]
    bench_op("sort 2 ops 1 fused-i32 key (quantized)", f_packed, state, cost, pay1)

    def f_scan2(s, co):
        def one(sv, cv):
            leader = jnp.concatenate([jnp.ones((1,), bool), sv[1:] != sv[:-1]])
            def op(a, b):
                fa, ca = a
                fb, cb = b
                return (fa | fb, jnp.where(fb, cb, ca))
            _, rm = jax.lax.associative_scan(op, (leader, cv))
            return rm
        return jax.vmap(one)(s, co)
    bench_op("associative_scan 2-tuple (run-min fill)", f_scan2, state, cost)

    def f_scan3(s, co):
        def one(sv, cv):
            leader = jnp.concatenate([jnp.ones((1,), bool), sv[1:] != sv[:-1]])
            i = jnp.arange(sv.shape[0], dtype=jnp.int32)
            def op(a, b):
                fa, ca, ia = a
                fb, cb, ib = b
                keep_b = fb | (cb < ca)
                return (fa | fb, jnp.where(keep_b, cb, ca), jnp.where(keep_b, ib, ia))
            _, rm, ri = jax.lax.associative_scan(op, (leader, cv, i))
            return rm + ri
        return jax.vmap(one)(s, co)
    bench_op("associative_scan 3-tuple (argmin fill)", f_scan3, state, cost)

    for k in (4096, 16384):
        bench_op(f"top_k k={k}", lambda co, k=k: jax.vmap(
            lambda x: jax.lax.top_k(-x, k)[0]
        )(co), cost)

    pos_r = jnp.asarray(rng.integers(0, N, size=(B, R)).astype(np.int32))
    bench_op("gather N->R=8192 positions (1 array)",
             lambda p, i: jax.vmap(lambda pv, iv: pv[iv])(p, i), pay1, pos_r)
    pos_k = jnp.asarray(rng.integers(0, N, size=(B, K)).astype(np.int32))
    bench_op("scatter K=4096 set into N lanes",
             lambda i: jax.vmap(lambda iv: jnp.zeros(N, jnp.int32).at[iv].set(
                 jnp.arange(K, dtype=jnp.int32), mode="drop"))(i), pos_k)
    bench_op("scatter-min N updates into S table",
             lambda s, co: jax.vmap(
                 lambda sv, cv: jnp.full((S,), jnp.inf, jnp.float32)
                 .at[sv].min(cv, mode="drop")
             )(s, co), state, cost)
    tbl = jnp.asarray(rng.uniform(0, 9, size=(B, S)).astype(np.float32))
    bench_op("gather S-table at N positions",
             lambda t, s: jax.vmap(lambda tv, sv: tv[sv])(t, s), tbl, state)

    fextra = jnp.asarray(rng.uniform(0, 8, size=(B, K)).astype(np.float32))
    slot_r = jnp.asarray(rng.integers(0, K, size=(B, R)).astype(np.int32))
    bench_op("one-hot matmul R=8192 x K=4096 (MXU lookup)",
             lambda sl, fx: jax.vmap(
                 lambda s_, f_: jax.nn.one_hot(s_, K, dtype=jnp.float32) @ f_
             )(sl, fx), slot_r, fextra)
    scores_t = jnp.asarray(rng.standard_normal((B, V)).astype(np.float32))
    sidx = jnp.asarray(rng.integers(0, V, size=(B, N)).astype(np.int32))
    bench_op("one-hot matmul N x V=500 (score lookup)",
             lambda i, sc: jax.vmap(
                 lambda iv, scv: jax.nn.one_hot(iv, V, dtype=jnp.float32) @ scv
             )(i, sc), sidx, scores_t)

    le_r = jnp.asarray(rng.uniform(0, 10, size=(B, R)).astype(np.float32))
    bench_op("segment-min by slot over R=8192 (scatter-min)",
             lambda ss, le: jax.vmap(
                 lambda sv, lv: jnp.full((K,), jnp.inf, jnp.float32)
                 .at[sv].min(lv, mode="drop")
             )(ss, le), slot_r, le_r)


if __name__ == "__main__":
    main()
