"""Eps-precomposition (fst/fold.py) parity: folded decode must reproduce
the runtime-eps decode exactly — best paths, costs, and lattice contents —
on graphs with epsilon arcs."""

import numpy as np
import pytest

from kaldi_decoder_tpu.decoders import (
    BatchedLatticeDecoder,
    BatchedViterbiDecoder,
    config_for_graph,
)
from kaldi_decoder_tpu.fst import compile_fst, path_labels, random_fst
from kaldi_decoder_tpu.fst.fold import fold_eps
from kaldi_decoder_tpu.lattice.post import nbest


def rand_logp(rng, T, V):
    return np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)


def test_fold_structure():
    rng = np.random.default_rng(0)
    g = compile_fst(random_fst(20, 5, rng))
    assert g.has_eps
    f = fold_eps(g)
    assert f is not None
    assert f.device.num_eps_arcs == 0
    assert f.device.num_emitting_arcs >= g.num_emitting_arcs
    # Every folded arc's path starts with an emitting arc whose weight sums
    # with its eps path to the folded weight.
    ga, oa = f.device.arrays, g.arrays
    for i in range(f.device.num_emitting_arcs):
        lo, hi = int(f.path_ptr[i]), int(f.path_ptr[i + 1])
        arcs = f.path_arcs[lo:hi]
        w = float(oa.em_weight[arcs[0]]) + sum(
            float(oa.eps_weight[a]) for a in arcs[1:]
        )
        assert w == pytest.approx(float(ga.em_weight[i]), abs=1e-5)
        assert int(ga.em_ilabel[i]) == int(oa.em_ilabel[arcs[0]])
        # path endpoint == folded nextstate
        dst = int(oa.em_next[arcs[0]])
        for a in arcs[1:]:
            assert int(f.eps_src[a]) == dst
            dst = int(oa.eps_next[a])
        assert dst == int(ga.em_next[i])


def test_fold_refuses_negative_eps():
    rng = np.random.default_rng(1)
    fst = random_fst(10, 4, rng)
    g = compile_fst(fst)
    if not g.has_eps:
        pytest.skip("random fst drew no eps arcs")
    ga = g.arrays
    ga.eps_weight[0] = -0.5
    assert fold_eps(g) is None


class TestFoldedViterbiParity:
    @pytest.mark.parametrize("seed", [0, 3, 7])
    def test_best_path_matches(self, seed):
        rng = np.random.default_rng(seed)
        V, T, B = 5, 12, 4
        g = compile_fst(random_fst(30, V, rng))
        assert g.has_eps
        cfg = config_for_graph(g, beam=1000.0, min_active=0, frontier_size=32)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])

        plain = BatchedViterbiDecoder(g, cfg, pad_time_to=8, fold=False)
        folded = BatchedViterbiDecoder(g, cfg, pad_time_to=8, fold=True)
        assert folded.fold is not None
        rp, rf = plain.decode(scores), folded.decode(scores)
        for b in range(B):
            lp, lf = rp.best_path(b), rf.best_path(b)
            assert (lp is None) == (lf is None)
            if lp is None:
                continue
            assert path_labels(lp) == path_labels(lf), f"utt {b}"
            assert rp.best_cost(b) == pytest.approx(rf.best_cost(b), abs=1e-3)

    def test_beam_pruned_parity(self):
        rng = np.random.default_rng(11)
        V, T = 6, 16
        g = compile_fst(random_fst(40, V, rng))
        cfg = config_for_graph(g, beam=6.0, min_active=0, frontier_size=32)
        scores = rand_logp(rng, T, V)
        plain = BatchedViterbiDecoder(g, cfg, pad_time_to=8, fold=False)
        folded = BatchedViterbiDecoder(g, cfg, pad_time_to=8, fold=True)
        rp, rf = plain.decode(scores), folded.decode(scores)
        lp, lf = rp.best_path(0), rf.best_path(0)
        assert (lp is None) == (lf is None)
        if lp is not None:
            assert path_labels(lp) == path_labels(lf)
            assert rp.best_cost(0) == pytest.approx(rf.best_cost(0), abs=1e-3)


class TestFoldedLatticeParity:
    def test_nbest_matches(self):
        rng = np.random.default_rng(2)
        V, T, B = 4, 8, 4
        g = compile_fst(random_fst(12, V, rng))
        assert g.has_eps
        fc = config_for_graph(g, beam=1000.0, min_active=0, frontier_size=16)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])

        # Generous record budgets: with beam=1000 every arc is in-beam, and
        # a tight eps-record buffer overflows (flagged) and drops links.
        plain = BatchedLatticeDecoder(
            g, fc, lattice_beam=4.0, pad_time_to=8, fold=False,
            em_records=512, eps_records=256,
        )
        folded = BatchedLatticeDecoder(
            g, fc, lattice_beam=4.0, pad_time_to=8, fold=True,
            em_records=512, eps_records=256,
        )
        assert folded.fold is not None
        rp, rf = plain.decode(scores), folded.decode(scores)
        assert not np.any(rp.overflows[:, :B]) and not np.any(rf.overflows[:, :B])
        for b in range(B):
            lp, lf = rp.raw_lattice(b), rf.raw_lattice(b)
            assert (lp is None) == (lf is None)
            if lp is None:
                continue
            pa = {
                ols: gc + ac
                for _, ols, gc, ac in nbest(lp, 200, unique_word_sequences=True)
            }
            pb = {
                ols: gc + ac
                for _, ols, gc, ac in nbest(lf, 200, unique_word_sequences=True)
            }
            assert set(pa) == set(pb), f"utt {b}"
            for kk in pa:
                assert pa[kk] == pytest.approx(pb[kk], abs=1e-3)
