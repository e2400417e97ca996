#!/usr/bin/env python
"""Round-4 gather attacks: sorted-index XLA gather, and a Pallas
VMEM-resident block-gather kernel (table fits VMEM at bench scale)."""

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8
K = 4096
S = 102400
WID = 16
REPS = 12
rng = np.random.default_rng(0)


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
                x ^ (d & 1) if x.dtype == jnp.int32 else x for x in acc
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


def pallas_block_gather(tbl, idx):
    """(S, WID) table, (B, K) indices -> (B, K, WID).  Table is DMA'd to
    VMEM once (first grid step) and rows are read with a scalar loop."""

    def kernel(idx_ref, tbl_hbm, out_ref, tbl_vmem, sem):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            cp = pltpu.make_async_copy(tbl_hbm, tbl_vmem, sem)
            cp.start()
            cp.wait()

        def loop(k, _):
            out_ref[0, k, :] = tbl_vmem[idx_ref[b, k], :]
            return 0

        jax.lax.fori_loop(0, K, loop, 0)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, K, WID), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, K, WID), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((S, WID), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(idx, tbl)


def main():
    tbl = jnp.asarray(rng.integers(0, 1 << 20, size=(S, WID)).astype(np.int32))
    idx_np = rng.integers(0, S, size=(B, K)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np, axis=1))

    bench("XLA gather (random idx)",
          lambda i, t=tbl: jax.vmap(lambda iv: t[iv].sum())(i % S), idx)
    bench("XLA gather (sorted idx, flag off)",
          lambda i, t=tbl: jax.vmap(lambda iv: t[iv].sum())(i % S), idx_sorted)

    def take_sorted(i, t=tbl):
        def one(iv):
            g = jax.lax.gather(
                t, iv[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,),
                ),
                slice_sizes=(1, WID),
                indices_are_sorted=True,
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            return g.sum()
        return jax.vmap(one)(i % S)
    bench("XLA gather (sorted idx, indices_are_sorted)", take_sorted, idx_sorted)

    try:
        bench("pallas VMEM block gather",
              lambda i, t=tbl: pallas_block_gather(t, i % S).sum(axis=(1, 2)),
              idx)
    except Exception as e:
        print(f"pallas block gather failed: {type(e).__name__}: {e}"[:2000])


if __name__ == "__main__":
    main()
