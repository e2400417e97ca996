#!/usr/bin/env python
"""Per-chip throughput vs batch size at the bench config (round 4)."""

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

V, T = 500, 64
K = 4096
R = 8192


def main():
    from kaldi_decoder_tpu.fst.csr import load_graph_npz
    from kaldi_decoder_tpu.decoders.frontier import config_for_graph
    from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder

    g = load_graph_npz(REPO / ".bench_cache/hlg_v500_w5000_s0.npz")
    rng = np.random.default_rng(0)
    fc = config_for_graph(
        g, beam=15.0, max_active=4000, min_active=200, frontier_size=K,
        rem_budget=32768, eps_rem_budget=2048,
    )
    dec = BatchedLatticeDecoder(
        g, fc, lattice_beam=8.0, em_records=R, eps_records=1024, pad_time_to=T,
    )
    for B in [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["8",
        "16", "32"])]:
        scores = np.log(
            rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32)
        ).astype(np.float32)
        sc = jnp.asarray(scores)
        ln = jnp.asarray(np.full(B, T, np.int32))
        st0 = dec._init(B)[0]
        t0 = time.time()
        out = dec._chunk_fn(dec._pg_dev, sc, ln, st0)
        np.asarray(out[0].base)
        compile_s = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = dec._chunk_fn(dec._pg_dev, sc, ln, st0)
            np.asarray(out[0].base)
            best = min(best, time.time() - t0)
        sps = B * T * 0.04 / best
        print(
            f"B={B:3d}  {best / T * 1e3:7.3f} ms/frame  "
            f"{sps:7.1f} audio-s/s/chip  (compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
