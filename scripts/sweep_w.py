#!/usr/bin/env python
"""Sweep block_width/rem_budget for the folded bench graph on TPU."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from kaldi_decoder_tpu.decoders.frontier import config_for_graph
from kaldi_decoder_tpu.decoders.lattice_dev import (
    build_lattice_chunk_fn,
    lattice_config_for_graph,
)
from kaldi_decoder_tpu.fst.fold import fold_eps
from kaldi_decoder_tpu.fst.pack import pack_graph
from kaldi_decoder_tpu.fst.synthetic import synthetic_graph

B, T, V = 8, 100, 500
g0 = synthetic_graph(200_000, 1_000_000, V, seed=0, eps_arcs=100_000)
f = fold_eps(g0)
g = f.device
deg = np.diff(g.arrays.em_row_ptr)
print(
    f"folded: E={g.num_emitting_arcs} deg p50={np.median(deg[deg>0]):.0f} "
    f"p90={np.quantile(deg[deg>0],0.9):.0f} p99={np.quantile(deg[deg>0],0.99):.0f} "
    f"max={deg.max()}",
    file=sys.stderr,
)

rng = np.random.default_rng(0)
scores = np.log(rng.dirichlet(np.ones(V), size=(B, T))).astype(np.float32)
lengths = jnp.full((B,), T, jnp.int32)

configs = []
auto = config_for_graph(g, beam=15.0, max_active=4000, min_active=200, frontier_size=4096)
configs.append(("auto", auto))
for W, R in [(4, 8192), (6, 6144), (8, 4096), (10, 2048), (12, 2048)]:
    configs.append(
        (
            f"W={W},R={R}",
            config_for_graph(
                g, beam=15.0, max_active=4000, min_active=200,
                frontier_size=4096, block_width=W, rem_budget=R,
            ),
        )
    )

from kaldi_decoder_tpu.decoders.viterbi import _folded_init

for name, fc in configs:
    cfg = lattice_config_for_graph(g, fc, em_records=4096, eps_records=8)
    pg = jax.tree.map(jnp.asarray, pack_graph(g, fc.block_width, fc.eps_block_width))
    fn = build_lattice_chunk_fn(g, cfg)
    st0, _ = _folded_init(f, fc, B)
    t0 = time.time()
    stf, outs = fn(pg, jnp.asarray(scores), lengths, st0)
    float(np.asarray(stf.base)[0])
    tc = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        stf, outs = fn(pg, jnp.asarray(scores), lengths, st0)
        float(np.asarray(stf.base)[0])
        times.append(time.time() - t0)
    ovf = int(np.asarray(outs.overflow).sum())
    print(
        f"{name:14s} N={fc.num_candidates:6d} compile={tc:5.1f}s "
        f"run={min(times):6.3f}s/{T}f  ovf={ovf}"
    )
