"""Folded-graph lattice correctness under pruning pressure.

Closes VERDICT r2 weak #3 / ADVICE r1 item 4: on eps-precomposed graphs
(`fst/fold.py`) an eps-intermediate token can be evicted at the frontier-K
boundary while its composite destination survives; lattice reconstruction
must not silently drop the em link and eps chain.  The fix synthesizes the
missing intermediate tokens from the record's path-prefix costs
(``FoldedGraph.expand_with_alphas``), making reconstruction independent of
intermediate frontier survival — the reference creates intermediate tokens
unconditionally in ``FindOrAddToken`` (`lattice-simple-decoder.cc:82-120`).

Pressure regimes covered (all fold=True, the bench configuration):

* **binding max_active, no saturation** — exact link parity vs the oracle
  running GetCutoff semantics (`faster-decoder.cc:244-336`) on the
  *original* graph.  With nonnegative eps weights an intermediate can
  never be beam-pruned while its composite destination survives (cost is
  monotone along the chain), so parity must be exact here.
* **frontier saturation (K pressure)** — the hazard actually fires
  (records whose intermediates were evicted exist); the decode must flag
  saturation, keep the oracle's best path exactly, and reconstruct every
  recorded link (quantified recall vs the oracle printed).
"""

import numpy as np
import pytest

from kaldi_decoder_tpu.decodable import DecodableCtc
from kaldi_decoder_tpu.decoders import BatchedLatticeDecoder
from kaldi_decoder_tpu.decoders.frontier import config_for_graph
from kaldi_decoder_tpu.decoders.ref_lattice import OracleLatticeDecoder
from kaldi_decoder_tpu.fst import compile_fst, path_labels, path_total_cost
from kaldi_decoder_tpu.fst.fold import fold_eps
from kaldi_decoder_tpu.fst.fst import EPSILON, StdVectorFst
from kaldi_decoder_tpu.fst.hlg import make_hlg, make_utterances

from tests._lattice_util import (
    device_link_set,
    oracle_link_set,
    records_with_evicted_intermediates,
)

BEAM = 14.0
LATTICE_BEAM = 7.0
MAX_ACTIVE = 400


@pytest.fixture(scope="module")
def hlg_setup():
    g = make_hlg(num_words=200, num_tokens=30, num_sentences=500, seed=0)
    rng = np.random.default_rng(5)
    scores, lengths, refs = make_utterances(
        g, 1, rng, words_per_utt=(6, 8), peak=2.5, noise_alpha=0.5
    )
    T = int(lengths[0])
    G = compile_fst(g.hlg)
    oracle = OracleLatticeDecoder(
        g.hlg, beam=BEAM, lattice_beam=LATTICE_BEAM,
        deterministic_cutoff=True, max_active=MAX_ACTIVE,
    )
    oracle.decode(DecodableCtc(scores[0, :T]))
    return g, G, scores[:, :T], np.array([T], np.int32), oracle


class TestFoldUnderPressure:
    def test_binding_max_active_exact_parity(self, hlg_setup):
        g, G, scores, lengths, oracle = hlg_setup
        fc = config_for_graph(
            G, beam=BEAM, max_active=MAX_ACTIVE, min_active=0,
            frontier_size=2048,
        )
        dec = BatchedLatticeDecoder(
            G, fc, lattice_beam=LATTICE_BEAM, em_records=16384,
            eps_records=2048, pad_time_to=int(lengths[0]), fold=True,
        )
        assert dec.fold is not None, "HLG must be eps-foldable"
        res = dec.decode(scores, lengths, device_prune=False)
        st = res.stats(0)
        # max_active must actually bind (the pressure being tested) while
        # the frontier never saturates (exactness precondition).
        assert float(np.max(st.active_per_frame)) >= MAX_ACTIVE
        assert st.frontier_saturated_frames == 0
        assert st.arc_budget_overflows == 0

        olat = oracle.get_best_path()
        dlat = res.best_path(0)
        assert path_labels(dlat) == path_labels(olat)
        assert path_total_cost(dlat) == pytest.approx(
            path_total_cost(olat), abs=1e-2
        )
        olinks = oracle_link_set(oracle)
        dlinks = device_link_set(res)
        assert len(olinks) > 2000, "workload too easy to be meaningful"
        extra = dlinks - olinks
        missing = olinks - dlinks
        assert not extra, f"{len(extra)} extra links, e.g. {sorted(extra)[:3]}"
        assert not missing, (
            f"{len(missing)} missing links, e.g. {sorted(missing)[:3]}"
        )

    def test_saturated_frontier_reconstructs_recorded_links(self, hlg_setup):
        g, G, scores, lengths, oracle = hlg_setup
        fc = config_for_graph(
            G, beam=BEAM, max_active=MAX_ACTIVE, min_active=0,
            frontier_size=256,
        )
        dec = BatchedLatticeDecoder(
            G, fc, lattice_beam=LATTICE_BEAM, em_records=16384,
            eps_records=2048, pad_time_to=int(lengths[0]), fold=True,
        )
        res = dec.decode(scores, lengths, device_prune=False)
        st = res.stats(0)
        assert st.frontier_saturated_frames > 0, "fixture must saturate"
        hit, total = records_with_evicted_intermediates(res, dec.fold)
        assert hit > 0, "fixture must exercise the eviction hazard"

        # The decode is flagged as diverged (hidden max_active=K), but the
        # lattice must stay internally complete and the best path exact.
        olat = oracle.get_best_path()
        dlat = res.best_path(0)
        assert dlat is not None
        assert path_labels(dlat) == path_labels(olat)
        assert path_total_cost(dlat) == pytest.approx(
            path_total_cost(olat), abs=1e-2
        )
        olinks = oracle_link_set(oracle)
        dlinks = device_link_set(res)
        recall = len(olinks & dlinks) / len(olinks)
        print(
            f"saturated fold: {hit}/{total} hazard records, "
            f"{st.frontier_saturated_frames} saturated frames, "
            f"link recall {recall:.3f}"
        )
        assert recall > 0.8

    def test_chunked_decode_equals_one_shot(self, hlg_setup):
        """decode(chunk_frames=...) re-invokes one compiled chunk program
        with carried state; the assembled result must equal the one-shot
        decode exactly (lattice link set and best path)."""
        g, G, scores, lengths, oracle = hlg_setup
        fc = config_for_graph(
            G, beam=BEAM, max_active=MAX_ACTIVE, min_active=0,
            frontier_size=2048,
        )
        dec = BatchedLatticeDecoder(
            G, fc, lattice_beam=LATTICE_BEAM, em_records=16384,
            eps_records=2048, pad_time_to=8, fold=True,
        )
        r1 = dec.decode(scores, lengths, device_prune=False)
        r2 = dec.decode(scores, lengths, chunk_frames=40, device_prune=False)
        lp, lc = r1.best_path(0), r2.best_path(0)
        assert path_labels(lp) == path_labels(lc)
        assert device_link_set(r1) == device_link_set(r2)

    def test_expand_with_alphas_synthesizes_evicted_intermediate(self):
        """Unit check of the fix: a record whose eps chain crosses a state
        missing from the frontier yields that state as a synthesized token
        with its path-prefix alpha, and the em/eps records survive."""
        fst = StdVectorFst()
        s0, s1, s2 = (fst.add_state() for _ in range(3))
        fst.set_start(s0)
        fst.add_arc(s0, 1, 0, 1.0, s1)        # em arc a (ilabel 1)
        fst.add_arc(s1, EPSILON, 7, 0.5, s2)  # eps chain s1 -> s2
        fst.add_arc(s0, 2, 0, 0.25, s2)       # cheap direct arc (ilabel 2)
        fst.set_final(s2)
        G = compile_fst(fst)
        fold = fold_eps(G)
        assert fold is not None
        dev = fold.device.arrays
        # The composite arc s0 -> s2 via (a, eps).
        comp = [
            i for i in range(fold.device.num_emitting_arcs)
            if int(dev.em_next[i]) == s2
            and fold.path_ptr[i + 1] - fold.path_ptr[i] == 2
        ]
        assert len(comp) == 1
        records = np.array([[s0, comp[0]]], np.int32)
        scores_t = np.zeros(2, np.float32)
        # Frontier contains only s2 (s1 "evicted").
        em, eps, ts, ta = fold.expand_with_alphas(
            records,
            np.array([s0], np.int64),
            np.array([0.0]),
            scores_t,
        )
        assert (s0, 0) in {tuple(r) for r in em.tolist()} or len(em) == 1
        assert len(eps) == 1 and int(eps[0, 0]) == s1
        tok = dict(zip(ts.tolist(), ta.tolist()))
        assert s1 in tok and tok[s1] == pytest.approx(1.0)  # 0 + w1 - score
        assert s2 in tok and tok[s2] == pytest.approx(1.5)
