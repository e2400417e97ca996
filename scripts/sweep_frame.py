#!/usr/bin/env python
"""Sweep (block_width, flat_group, rem_budget) on the real bench HLG and
report per-frame device cost of the lattice chunk fn (round-4 tuning)."""

import itertools
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

B, V, T = 8, 500, 64
K = 4096
R = 8192


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x))


def main():
    from kaldi_decoder_tpu.fst.csr import load_graph_npz
    from kaldi_decoder_tpu.decoders.frontier import config_for_graph
    from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder

    g = load_graph_npz(REPO / ".bench_cache/hlg_v500_w5000_s0.npz")
    rng = np.random.default_rng(0)
    scores = np.log(
        rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32)
    ).astype(np.float32)
    lengths = np.full(B, T, np.int32)
    sc = jnp.asarray(scores)
    ln = jnp.asarray(lengths)

    grid = []
    for W, G, rem in itertools.product(
        [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 else [3, 6, 8],
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [4, 8, 16],
        [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [16384, 32768],
    ):
        grid.append((W, G, rem))

    for W, G, rem in grid:
        fc = config_for_graph(
            g, beam=15.0, max_active=4000, min_active=200, frontier_size=K,
            rem_budget=rem, eps_rem_budget=2048, block_width=W, flat_group=G,
        )
        dec = BatchedLatticeDecoder(
            g, fc, lattice_beam=8.0, em_records=R, eps_records=1024,
            pad_time_to=T,
        )
        st0 = dec._init(B)[0]
        t0 = time.time()
        out = dec._chunk_fn(dec._pg_dev, sc, ln, st0)
        sync(np.asarray(out[0].base))
        compile_s = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = dec._chunk_fn(dec._pg_dev, sc, ln, st0)
            sync(np.asarray(out[0].base))
            best = min(best, time.time() - t0)
        ovf = int(np.asarray(out[1].overflow).sum())
        sat = int(np.asarray(out[1].saturated).sum())
        n_cand = fc.num_candidates
        print(
            f"W={W:2d} G={G:2d} rem={rem:6d} N={n_cand:6d}  "
            f"{best / T * 1e3:7.3f} ms/frame  ovf={ovf:3d} sat={sat:3d} "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
