#!/usr/bin/env python
"""Pallas VMEM block-gather, attempt 2: scalar-prefetch indices, chunked
output blocks.  Validates in interpret mode (CPU) before compiling."""

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


def block_gather(tbl, idx, interpret=False):
    """(S, WID) int32 table, (B*K,) int32 indices -> (B*K, WID).

    Grid over output chunks; table DMA'd to VMEM once (persists across
    the sequential TPU grid); a scalar loop reads rows from VMEM."""
    CH = 2048  # output rows per grid step
    n = idx.shape[0]

    def kernel(idx_ref, tbl_hbm, out_ref, tbl_vmem, sem):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            cp = pltpu.make_async_copy(tbl_hbm, tbl_vmem, sem)
            cp.start()
            cp.wait()

        base = step * CH

        def loop(k, _):
            out_ref[k, :] = tbl_vmem[idx_ref[base + k], :]
            return 0

        jax.lax.fori_loop(0, CH, loop, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // CH,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (CH, WID), lambda step, idx: (step, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((S, WID), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, WID), jnp.int32),
        interpret=interpret,
    )(idx, tbl)


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def main():
    tbl_np = rng.integers(0, 1 << 20, size=(S, WID)).astype(np.int32)
    idx_np = rng.integers(0, S, size=(B * K,)).astype(np.int32)

    # interpret-mode validation on CPU
    with jax.default_device(jax.devices("cpu")[0]):
        out = block_gather(jnp.asarray(tbl_np), jnp.asarray(idx_np), interpret=True)
        ref = tbl_np[idx_np]
        assert np.array_equal(np.asarray(out), ref), "interpret mismatch"
        print("interpret mode OK", flush=True)

    tbl = jnp.asarray(tbl_np)
    idx = jnp.asarray(idx_np)

    @jax.jit
    def run(i, t):
        acc = i
        out = None
        for _ in range(REPS):
            out = block_gather(t, acc % S)
            acc = acc ^ (out.ravel()[0] & 1)
        return out

    out = run(idx, tbl)
    ref = tbl_np[idx_np % S]
    assert np.array_equal(np.asarray(out), ref), "device mismatch"
    sync(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = run(idx, tbl)
        sync(out)
        best = min(best, time.time() - t0)
    print(f"pallas block gather (B*K={B*K} rows): {best / REPS * 1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
