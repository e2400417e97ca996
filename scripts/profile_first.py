#!/usr/bin/env python
"""Decompose bench.py's 'compile+first chunk' time stage by stage."""
import pathlib
import sys, time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg, t0=[time.time()]):
    print(f"[{time.time() - t0[0]:7.1f}s] {msg}", flush=True)


SEED, V, S, E_EM, E_EPS = 0, 500, 200_000, 1_000_000, 100_000
B, T, CHUNK = 8, 200, 200

log("imports done")
from kaldi_decoder_tpu.decoders.frontier import config_for_graph, StepState
from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder
from kaldi_decoder_tpu.decoders.lattice_dev import init_closure_rec
from kaldi_decoder_tpu.fst.synthetic import synthetic_graph
import jax.numpy as jnp

graph = synthetic_graph(S, E_EM, V, seed=SEED, eps_arcs=E_EPS)
log("synthetic graph built")
fc = config_for_graph(
    graph, beam=15.0, max_active=4000, min_active=200,
    frontier_size=4096, rem_budget=8192, eps_rem_budget=2048,
)
dec = BatchedLatticeDecoder(
    graph, fc, lattice_beam=8.0, em_records=4096, eps_records=1024,
    pad_time_to=CHUNK,
)
log(f"decoder built (cfg {dec.cfg.frontier.block_width=} )")

ga = dec._pg_dev
# Force-transfer every graph array and block.
ga_arrays = jax.tree.leaves(ga)
tot = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in ga_arrays)
for a in ga_arrays:
    jax.device_put(a).block_until_ready() if hasattr(a, "shape") else None
log(f"graph arrays resident ({tot/1e6:.1f} MB)")

st, _ = init_closure_rec(ga, graph.start_state, graph.num_states, dec.cfg)
float(np.asarray(st.base))
log("init closure done")

rng = np.random.default_rng(SEED)
scores = np.log(
    rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32)
).astype(np.float32)
lengths = jnp.full((B,), CHUNK, jnp.int32)
st0 = StepState(
    states=jnp.broadcast_to(st.states, (B,) + st.states.shape),
    costs=jnp.broadcast_to(st.costs, (B,) + st.costs.shape),
    base=jnp.broadcast_to(st.base, (B,)),
)
chunk0 = jnp.asarray(scores[:, :CHUNK])
chunk0.block_until_ready()
log("scores transferred")

lowered = dec._chunk_fn.lower(ga, chunk0, lengths, st0)
log("lowered (trace)")
compiled = lowered.compile()
log("compiled (cache or fresh)")

t0 = time.time()
stf, outs = compiled(ga, chunk0, lengths, st0)
float(np.asarray(stf.base)[0])
log(f"first execution: {time.time() - t0:.1f}s")

t0 = time.time()
stf, outs = compiled(ga, chunk0, lengths, st0)
float(np.asarray(stf.base)[0])
log(f"second execution: {time.time() - t0:.1f}s")
