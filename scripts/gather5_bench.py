#!/usr/bin/env python
"""Probe Mosaic's vectorized VMEM gather support (round 5).

The scalar-loop VMEM gather (gather4_bench.py) runs at ~52ns/row — the
scalar core is the bottleneck, losing to XLA's HBM gather (~42ns/row).
A win requires a VECTOR gather from VMEM.  This probes which
formulations Mosaic actually compiles, then times the survivors.
"""

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

B = 16
K = 4096
S = 102298
WID = 16
G = 8
REPS = 12
rng = np.random.default_rng(0)
SP = -(-S // G)
N = B * K


def pack_table(tbl):
    pad = SP * G - tbl.shape[0]
    if pad:
        tbl = np.concatenate([tbl, np.zeros((pad, WID), tbl.dtype)], axis=0)
    return tbl.reshape(SP, G * WID)


def mk_take(ch):
    """Vectorized: whole-table jnp.take inside the kernel per chunk.
    Indices ride a block-mapped VMEM input (vector loads are not allowed
    from scalar-prefetch SMEM)."""

    def kernel(idx_ref, tbl_hbm, out_ref, tbl_vmem, sem):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            cp = pltpu.make_async_copy(tbl_hbm, tbl_vmem, sem)
            cp.start()
            cp.wait()

        idx = idx_ref[...] // G
        out_ref[...] = jnp.take(tbl_vmem[...], idx, axis=0, mode="clip")

    def f(idx, tbl_packed):
        return pl.pallas_call(
            kernel,
            grid=(N // ch,),
            in_specs=[
                pl.BlockSpec((ch,), lambda step: (step,)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (ch, G * WID), lambda step: (step, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((SP, G * WID), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            out_shape=jax.ShapeDtypeStruct((N, G * WID), jnp.int32),
        )(idx, tbl_packed)

    return f


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def bench(name, f, *args):
    @jax.jit
    def run(i, *rest):
        acc = i
        out = None
        for _ in range(REPS):
            out = f(acc % S, *rest)
            acc = acc ^ (out.ravel()[0] & 1)
        return out

    try:
        out = run(*args)
        sync(out)
    except Exception as e:
        print(f"{name:50s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = run(*args)
        sync(out)
        best = min(best, time.time() - t0)
    print(f"{name:50s} {best / REPS * 1e3:8.3f} ms", flush=True)
    return np.asarray(out)


def main():
    tbl_np = rng.integers(0, 1 << 20, size=(S, WID)).astype(np.int32)
    idx_np = rng.integers(0, S, size=(N,)).astype(np.int32)
    packed_np = pack_table(tbl_np)
    packed = jnp.asarray(packed_np)
    idx = jnp.asarray(idx_np)

    want_groups = packed_np[(idx_np % S) // G]

    for ch in (256, 1024, 4096):
        got = bench(f"pallas jnp.take VMEM gather ch={ch}", mk_take(ch), idx,
                    packed)
        if got is not None:
            assert np.array_equal(got, want_groups), f"take ch={ch} mismatch"
            print("   (correct)", flush=True)


if __name__ == "__main__":
    main()
