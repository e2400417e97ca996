"""Worker for the two-process multi-host smoke test (run via subprocess).

Each process owns 2 virtual CPU devices; `jax.distributed.initialize`
forms a 2-process job with a global 4-device `data` mesh.  Both processes
generate the same global batch, feed their local shard through the
batched Viterbi chunk function jitted over the global mesh, and compare
their addressable result rows against a plain single-process decode —
validating that the multi-host wrapper in parallel/mesh.py is a real
capability, not just an initialize() passthrough.

Usage: python _multihost_worker.py <process_id> <port>
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid, port = int(sys.argv[1]), sys.argv[2]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaldi_decoder_tpu.parallel import initialize_distributed  # noqa: E402

initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from kaldi_decoder_tpu.decoders.frontier import (  # noqa: E402
    StepState,
    config_for_graph,
)
from kaldi_decoder_tpu.decoders.viterbi import (  # noqa: E402
    BatchedViterbiDecoder,
    _build_init_fn,
    build_chunk_fn,
)
from kaldi_decoder_tpu.fst import compile_fst, ctc_topo  # noqa: E402
from kaldi_decoder_tpu.fst.pack import pack_graph  # noqa: E402

V, T, B = 5, 8, 4
graph = compile_fst(ctc_topo(V))
cfg = config_for_graph(graph, beam=16.0, min_active=0)
rng = np.random.default_rng(0)  # same seed on both processes
scores = np.log(rng.dirichlet(np.ones(V), size=(B, T))).astype(np.float32)
lengths = np.full((B,), T, np.int32)

mesh = Mesh(np.array(jax.devices()), ("data",))
batch_sh = NamedSharding(mesh, P("data"))

pg = jax.tree.map(jnp.asarray, pack_graph(graph, cfg.block_width, cfg.eps_block_width))
st, _ = _build_init_fn(graph.num_states, cfg)(pg, jnp.int32(graph.start_state))
st_states = np.broadcast_to(np.asarray(st.states), (B,) + st.states.shape)
st_costs = np.broadcast_to(np.asarray(st.costs), (B,) + st.costs.shape)
st_base = np.broadcast_to(np.asarray(st.base), (B,))

# Global arrays from each process's local batch rows (2 rows per process).
lo, hi = 2 * pid, 2 * pid + 2
mk = jax.make_array_from_process_local_data
st0 = StepState(
    states=mk(batch_sh, st_states[lo:hi]),
    costs=mk(batch_sh, st_costs[lo:hi]),
    base=mk(batch_sh, st_base[lo:hi]),
)
g_scores = mk(batch_sh, scores[lo:hi])
g_lengths = mk(batch_sh, lengths[lo:hi])

chunk = build_chunk_fn(graph, cfg, mesh)
stf, outs = chunk(pg, g_scores, g_lengths, st0)

# Addressable rows of the distributed result.
mine = {}
for shard in stf.costs.addressable_shards:
    row = shard.index[0].start or 0
    mine[row] = np.asarray(shard.data)[0]

# Single-process baseline over the full batch (identical on both procs).
base = BatchedViterbiDecoder(graph, cfg, pad_time_to=T, fold=False)
rb = base.decode(scores, lengths)
base_final = rb.frontier_costs - np.float32(0)  # absolute costs

ok = True
for row, costs in mine.items():
    want = np.sort(base_final[row][np.isfinite(base_final[row])])
    got_abs = costs + np.asarray(
        [s.data for s in stf.base.addressable_shards if (s.index[0].start or 0) == row]
    )[0]
    got = np.sort(got_abs[np.isfinite(got_abs)])
    if not np.allclose(got, want, atol=1e-4):
        print(f"[{pid}] row {row} MISMATCH", got[:5], want[:5], flush=True)
        ok = False

print(f"MULTIHOST_{'OK' if ok else 'FAIL'} pid={pid} rows={sorted(mine)}", flush=True)
sys.exit(0 if ok else 1)
