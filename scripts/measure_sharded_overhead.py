#!/usr/bin/env python
"""Single-chip overhead of the sharded-graph lattice decoder (VERDICT r2
next #6): decode the bench HLG with (a) the unsharded batched decoder
(fold on and off) and (b) ShardedLatticeDecoder on a 1-device mesh, and
report steady-state audio-s/s for each.  The ratio (b)/(a, fold=False)
isolates the cost of the routing/global-cutoff program structure; the
fold=True column shows what the sharded path additionally forgoes by
running unfolded (see graph_shard.py module docstring for why).
"""

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

import bench as B  # noqa: E402
from kaldi_decoder_tpu.decoders.frontier import config_for_graph  # noqa: E402
from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder  # noqa: E402
from kaldi_decoder_tpu.parallel.graph_shard import ShardedLatticeDecoder  # noqa: E402

import os

T = int(os.environ.get("KDTPU_SHARD_T", "200"))
BB = int(os.environ.get("KDTPU_SHARD_B", "0")) or None  # override bench B
PASSES = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(label, decode):
    decode()  # compile + warm
    times = []
    for _ in range(PASSES):
        t0 = time.time()
        decode()
        times.append(time.time() - t0)
    best = min(times)
    sps = B.B * T * B.FRAME_SECONDS / best
    log(f"  {label}: {best:.3f}s  ({sps:.1f} audio-s/s)")
    return sps


def main():
    graph, scores, lengths, refs = B.build_hlg_workload()
    if BB:
        B.B = BB
        scores = scores[:BB]
    sc = scores[:, :T]
    ln = np.full(B.B, T, np.int32)

    results = {}
    for fold in (True, False):
        dec = BatchedLatticeDecoder(
            graph,
            config_for_graph(
                graph, beam=B.BEAM, max_active=B.MAX_ACTIVE, min_active=200,
                frontier_size=4096, rem_budget=8192, eps_rem_budget=2048,
            ),
            lattice_beam=B.LATTICE_BEAM, em_records=B.EM_RECORDS,
            eps_records=1024, pad_time_to=T, fold=fold,
        )
        st0, _, _, _ = dec._init(B.B)
        scd, lnd = jnp.asarray(sc), jnp.asarray(ln)

        def run(dec=dec, st0=st0, scd=scd, lnd=lnd):
            stf, outs = dec._chunk_fn(dec._pg_dev, scd, lnd, st0)
            float(np.asarray(stf.base)[0])

        results[f"unsharded_fold={fold}"] = timed(
            f"unsharded fold={fold}", run
        )

    n_dev = len(jax.devices())
    parts = [1] if n_dev == 1 else [p for p in (1, 2, 4, 8) if p <= n_dev]
    for P in parts:
        mesh = Mesh(np.array(jax.devices()[:P]), ("model",))
        sdec = ShardedLatticeDecoder(
            graph,
            config_for_graph(
                graph, beam=B.BEAM, max_active=B.MAX_ACTIVE, min_active=200,
                frontier_size=4096, rem_budget=8192, eps_rem_budget=2048,
            ),
            lattice_beam=B.LATTICE_BEAM, mesh=mesh, pad_time_to=T,
            em_records=B.EM_RECORDS, eps_records=1024,
        )
        # Apples-to-apples with the unsharded rows (VERDICT r4 #4): time
        # the sharded DEVICE chunk only — same sync-barrier pattern, no
        # record download, no host pruning.
        st0 = sdec._init_state(B.B)
        st0, _ = sdec._init_fn(sdec._pg_dev, sdec._eps_off, st0)
        scd, lnd = jnp.asarray(sc), jnp.asarray(ln)

        def sdev(sdec=sdec, st0=st0, scd=scd, lnd=lnd):
            stf, outs = sdec._chunk_fn(
                sdec._pg_dev, sdec._em_off, sdec._eps_off, scd, lnd, st0
            )
            float(np.asarray(stf.base.ravel())[0])

        results[f"sharded_device_only_P{P}"] = timed(
            f"sharded device chunk only (P={P})", sdev
        )

        if P == 1:
            def srun(sdec=sdec):
                sdec.decode(sc, ln)

            results["sharded_full_decode_P1"] = timed(
                "sharded full decode incl. download+host prune (P=1)", srun
            )
    results["overhead_vs_unfolded"] = round(
        results["unsharded_fold=False"] / results["sharded_device_only_P1"], 3
    )
    results["overhead_vs_folded"] = round(
        results["unsharded_fold=True"] / results["sharded_device_only_P1"], 3
    )
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
