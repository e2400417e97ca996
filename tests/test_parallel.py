"""Multi-device data-parallel decode on the virtual 8-device CPU mesh.

Validates the sharded path the driver's dryrun_multichip exercises: batch
sharded over a 1-D 'data' mesh axis, graph replicated, results identical
to the unsharded decode.
"""

import jax
import numpy as np
import pytest

from kaldi_decoder_tpu.decoders import (
    BatchedLatticeDecoder,
    BatchedViterbiDecoder,
    config_for_graph,
)
from kaldi_decoder_tpu.fst import compile_fst, ctc_topo, path_labels, random_fst
from kaldi_decoder_tpu.lattice.post import nbest
from kaldi_decoder_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def rand_logp(rng, T, V):
    return np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)


class TestShardedViterbi:
    def test_sharded_matches_unsharded(self, mesh):
        rng = np.random.default_rng(0)
        V, T, B = 6, 12, 8
        g = compile_fst(ctc_topo(V))
        cfg = config_for_graph(g, beam=16.0, min_active=0)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])
        lengths = np.array([12, 10, 8, 12, 5, 12, 3, 12], np.int32)

        plain = BatchedViterbiDecoder(g, cfg, pad_time_to=8)
        shard = BatchedViterbiDecoder(g, cfg, pad_time_to=8, mesh=mesh)
        rp = plain.decode(scores, lengths)
        rs = shard.decode(scores, lengths)
        for b in range(B):
            lp, ls = rp.best_path(b), rs.best_path(b)
            assert (lp is None) == (ls is None)
            if lp is not None:
                assert path_labels(lp) == path_labels(ls), f"utt {b}"

    def test_batch_padding_to_mesh(self, mesh):
        # B=3 not divisible by 8: padded internally, results unchanged.
        rng = np.random.default_rng(1)
        V, T, B = 5, 10, 3
        g = compile_fst(ctc_topo(V))
        cfg = config_for_graph(g, beam=16.0, min_active=0)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])
        plain = BatchedViterbiDecoder(g, cfg, pad_time_to=8)
        shard = BatchedViterbiDecoder(g, cfg, pad_time_to=8, mesh=mesh)
        rp, rs = plain.decode(scores), shard.decode(scores)
        for b in range(B):
            assert path_labels(rp.best_path(b)) == path_labels(rs.best_path(b))


class TestShardedLattice:
    def test_sharded_lattice_matches(self, mesh):
        rng = np.random.default_rng(2)
        V, T, B = 4, 8, 8
        fst = random_fst(12, V, rng)
        g = compile_fst(fst)
        fc = config_for_graph(g, beam=1000.0, min_active=0, frontier_size=16)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])

        plain = BatchedLatticeDecoder(g, fc, lattice_beam=4.0, pad_time_to=8)
        shard = BatchedLatticeDecoder(
            g, fc, lattice_beam=4.0, pad_time_to=8, mesh=mesh
        )
        rp, rs = plain.decode(scores), shard.decode(scores)
        for b in range(B):
            lp, ls = rp.raw_lattice(b), rs.raw_lattice(b)
            assert (lp is None) == (ls is None)
            if lp is None:
                continue
            pa = {
                ols: g_ + a
                for _, ols, g_, a in nbest(lp, 200, unique_word_sequences=True)
            }
            pb = {
                ols: g_ + a
                for _, ols, g_, a in nbest(ls, 200, unique_word_sequences=True)
            }
            assert set(pa) == set(pb)
            for k in pa:
                assert pa[k] == pytest.approx(pb[k], abs=1e-3)
