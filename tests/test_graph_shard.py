"""Sharded-graph (model-axis) decoding on the virtual 8-device CPU mesh.

States partitioned over a 'model' mesh axis; per-frame all_to_all routing.
Must reproduce the unsharded best-path decode exactly (same cost semantics,
global beam, global slot ids).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from kaldi_decoder_tpu.decoders import BatchedViterbiDecoder, config_for_graph
from kaldi_decoder_tpu.fst import compile_fst, ctc_topo, path_labels, random_fst
from kaldi_decoder_tpu.parallel.graph_shard import ShardedViterbiDecoder


def rand_logp(rng, T, V):
    return np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)


@pytest.fixture(scope="module")
def model_mesh():
    devs = jax.devices()
    assert len(devs) >= 8
    return Mesh(np.array(devs[:4]), ("model",))


@pytest.fixture(scope="module")
def mp_dp_mesh():
    devs = jax.devices()
    return Mesh(np.array(devs[:8]).reshape(2, 4), ("data", "model"))


class TestShardedGraphViterbi:
    def test_matches_unsharded_ctc_topo(self, model_mesh):
        rng = np.random.default_rng(0)
        V, T, B = 6, 12, 4
        g = compile_fst(ctc_topo(V))
        cfg = config_for_graph(g, beam=16.0, min_active=0)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])
        lengths = np.array([12, 9, 5, 12], np.int32)

        plain = BatchedViterbiDecoder(g, cfg, pad_time_to=8)
        shard = ShardedViterbiDecoder(g, cfg, mesh=model_mesh, pad_time_to=8)
        rp = plain.decode(scores, lengths)
        rs = shard.decode(scores, lengths)
        for b in range(B):
            lp, ls = rp.best_path(b), rs.best_path(b)
            assert (lp is None) == (ls is None)
            if lp is not None:
                assert path_labels(lp) == path_labels(ls), f"utt {b}"

    def test_matches_unsharded_random_fst(self, model_mesh):
        rng = np.random.default_rng(3)
        V, T, B = 5, 10, 4
        fst = random_fst(30, V, rng)
        g = compile_fst(fst)
        cfg = config_for_graph(g, beam=1000.0, min_active=0, frontier_size=16)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])

        plain = BatchedViterbiDecoder(g, cfg, pad_time_to=8)
        shard = ShardedViterbiDecoder(g, cfg, mesh=model_mesh, pad_time_to=8)
        rp, rs = plain.decode(scores), shard.decode(scores)
        for b in range(B):
            lp, ls = rp.best_path(b), rs.best_path(b)
            assert (lp is None) == (ls is None)
            if lp is not None:
                assert path_labels(lp) == path_labels(ls), f"utt {b}"
                # total best-path cost must match too
                cp = rp.frontier_costs[b][np.isfinite(rp.frontier_costs[b])]
                cs = rs.frontier_costs[b][np.isfinite(rs.frontier_costs[b])]
                assert cp.min() == pytest.approx(cs.min(), abs=1e-4)

    def test_model_plus_data_mesh(self, mp_dp_mesh):
        rng = np.random.default_rng(5)
        V, T, B = 6, 8, 4
        g = compile_fst(ctc_topo(V))
        cfg = config_for_graph(g, beam=16.0, min_active=0)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])

        plain = BatchedViterbiDecoder(g, cfg, pad_time_to=8)
        shard = ShardedViterbiDecoder(g, cfg, mesh=mp_dp_mesh, pad_time_to=8)
        rp, rs = plain.decode(scores), shard.decode(scores)
        for b in range(B):
            assert path_labels(rp.best_path(b)) == path_labels(rs.best_path(b))
