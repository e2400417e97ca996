"""Cyclic-epsilon fallback validation (VERDICT r2 weak #7).

Graphs with a *cyclic* epsilon subgraph have no closure depth;
``config_for_graph`` falls back to a 16-iteration fixed-point budget
(``frontier.py`` eps branch, ``eps_exact=False``).  The reference's
worklist (`faster-decoder.cc:59-119`) iterates until quiescence, so two
things must hold for parity:

* when the fixed point is reached within budget, device == oracle exactly;
* when it is NOT (improvements still propagating at the last iteration),
  the decode must be *flagged* (overflow output), never silently wrong.

The fixture is an epsilon ring: relaxations propagate exactly one hop per
closure iteration, so a ring of n states needs n-1 iterations — n=8
converges inside the budget, n=24 provably cannot.
"""

import numpy as np
import pytest

from kaldi_decoder_tpu.decodable import DecodableCtc
from kaldi_decoder_tpu.decoders import BatchedLatticeDecoder
from kaldi_decoder_tpu.decoders.frontier import config_for_graph
from kaldi_decoder_tpu.decoders.ref_lattice import OracleLatticeDecoder
from kaldi_decoder_tpu.fst import compile_fst, path_labels, path_total_cost
from kaldi_decoder_tpu.fst.fst import EPSILON, StdVectorFst

V = 3


def eps_ring(n: int, eps_w: float = 0.0) -> StdVectorFst:
    """n-state epsilon ring + emitting arcs entering at state 0."""
    fst = StdVectorFst()
    for _ in range(n):
        fst.add_state()
    fst.set_start(0)
    for i in range(n):
        fst.add_arc(i, EPSILON, 0, eps_w, (i + 1) % n)
        # Emitting arcs: collapse to state 0 with state-dependent weight so
        # the ring is re-seeded every frame from one entry point.
        for v in range(1, V + 1):
            fst.add_arc(i, v, v, 0.1 * i, 0)
        fst.set_final(i, 0.05 * i)
    return fst


def scores_for(rng, T):
    return np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)


class TestCyclicEps:
    def test_cyclic_depth_is_none_and_budget_configured(self):
        g = compile_fst(eps_ring(8))
        assert g.eps_depth is None
        fc = config_for_graph(g, beam=50.0)
        assert fc.eps_iters == 16
        assert fc.eps_exact is False

    def test_converged_ring_matches_oracle_exactly(self):
        fst = eps_ring(8)
        g = compile_fst(fst)
        rng = np.random.default_rng(0)
        scores = scores_for(rng, 6)
        fc = config_for_graph(g, beam=50.0, min_active=0, frontier_size=16)
        dec = BatchedLatticeDecoder(
            g, fc, lattice_beam=30.0, em_records=256, eps_records=64,
            pad_time_to=8,
        )
        res = dec.decode(scores[None], device_prune=False)
        assert res.stats(0).arc_budget_overflows == 0, (
            "8-ring must converge inside the 16-iteration budget"
        )
        oracle = OracleLatticeDecoder(
            fst, beam=50.0, lattice_beam=30.0, deterministic_cutoff=True
        )
        oracle.decode(DecodableCtc(scores))
        olat = oracle.get_best_path()
        dlat = res.best_path(0)
        assert path_labels(dlat) == path_labels(olat)
        assert path_total_cost(dlat) == pytest.approx(
            path_total_cost(olat), abs=1e-3
        )
        # Every ring state's alpha equals the oracle's on every frame
        # (the closure reached the true fixed point).
        for f in range(1, 7):
            toks = {
                int(s): float(c)
                for s, c in zip(res.frame_states[f - 1, 0],
                                res.frame_costs[f - 1, 0])
                if np.isfinite(c)
            }
            otoks = {s: t.tot_cost for s, t in oracle.active_toks[f].items()}
            assert set(toks) == set(otoks)
            for s in toks:
                assert toks[s] == pytest.approx(otoks[s], abs=1e-4)

    def test_unconverged_ring_is_flagged_not_silent(self):
        g = compile_fst(eps_ring(24))
        rng = np.random.default_rng(0)
        scores = scores_for(rng, 4)
        fc = config_for_graph(g, beam=50.0, min_active=0, frontier_size=32)
        assert fc.eps_iters == 16 and not fc.eps_exact
        dec = BatchedLatticeDecoder(
            g, fc, lattice_beam=30.0, em_records=256, eps_records=64,
            pad_time_to=4,
        )
        res = dec.decode(scores[None], device_prune=False)
        # 24-ring needs 23 relaxation hops; the budget is 16 — the decode
        # must be flagged as possibly-unconverged on every frame.
        assert res.stats(0).arc_budget_overflows >= 4
