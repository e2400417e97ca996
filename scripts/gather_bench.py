#!/usr/bin/env python
"""Characterize TPU row-gather cost vs (#rows, table size, row width) and
try Pallas VMEM-resident gather alternatives (round 4)."""

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


def main():
    for rows, trows, width in [
        (4096, 102400, 11),
        (4096, 102400, 26),
        (4096, 102400, 4),
        (4096, 102400, 1),
        (4096, 8192, 11),
        (8192, 102400, 11),
        (8192, 1 << 20, 12),
        (2048, 1 << 20, 48),
    ]:
        tbl = jnp.asarray(rng.integers(0, 1 << 20, size=(trows, width)).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, trows, size=(B, rows)).astype(np.int32))
        bench(
            f"gather {rows} rows from ({trows}, {width})",
            lambda i, t=tbl: jax.vmap(lambda iv: t[iv].sum())(i % t.shape[0]),
            idx,
        )

    # Pallas: VMEM-resident table, scalar-loop row gather.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, WID, K = 102400, 16, 4096  # row width padded to 16 words

    def gather_kernel(idx_ref, tbl_ref, out_ref):
        def body(scratch, sem):
            cp = pltpu.make_async_copy(tbl_ref, scratch, sem)
            cp.start()
            cp.wait()

            def loop(i, _):
                out_ref[i, :] = scratch[idx_ref[i], :]
                return 0

            jax.lax.fori_loop(0, K, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((S, WID), jnp.int32),
            sem=pltpu.SemaphoreType.DMA,
        )

    tbl = jnp.asarray(rng.integers(0, 1 << 20, size=(S, WID)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, S, size=(B, K)).astype(np.int32))

    def pallas_gather(i, t=tbl):
        def one(iv):
            return pl.pallas_call(
                gather_kernel,
                out_shape=jax.ShapeDtypeStruct((K, WID), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(iv, t).sum()
        return jax.vmap(one)(i % S)

    try:
        bench("pallas VMEM gather 4096 rows (102400, 16) scalar loop", pallas_gather, idx)
    except Exception as e:
        print(f"pallas scalar gather failed: {type(e).__name__}: {e}")

    # Pallas variant: keep the table copy OUT of the loop cost by batching
    # all B gathers in one kernel (table DMA'd once).
    def gather_kernel_b(idx_ref, tbl_ref, out_ref):
        def body(scratch, sem):
            cp = pltpu.make_async_copy(tbl_ref, scratch, sem)
            cp.start()
            cp.wait()

            def loop(i, _):
                b = i // K
                k = i % K
                out_ref[b, k, :] = scratch[idx_ref[b, k], :]
                return 0

            jax.lax.fori_loop(0, B * K, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((S, WID), jnp.int32),
            sem=pltpu.SemaphoreType.DMA,
        )

    def pallas_gather_b(i, t=tbl):
        return pl.pallas_call(
            gather_kernel_b,
            out_shape=jax.ShapeDtypeStruct((B, K, WID), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i % S, t).sum(axis=(1, 2))

    try:
        bench("pallas VMEM gather BxK rows one kernel", pallas_gather_b, idx)
    except Exception as e:
        print(f"pallas batched gather failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
