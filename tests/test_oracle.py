"""Tests for the numpy oracle decoder (SimpleDecoder semantics).

The oracle is itself validated here against hand-computed Viterbi results
and brute-force path enumeration; the device decoders are then tested
against the oracle (test_viterbi.py).
"""

import itertools

import numpy as np
import pytest

from kaldi_decoder_tpu.decodable import DecodableCtc, DecodableInterface
from kaldi_decoder_tpu.decoders.ref_simple import OracleSimpleDecoder
from kaldi_decoder_tpu.fst import (
    EPSILON,
    StdVectorFst,
    ctc_topo,
    path_labels,
    path_total_cost,
    random_fst,
)

INF = float("inf")


def brute_force_best(fst, logp, beam=None):
    """Exhaustive best path cost by enumerating all label paths of length T.

    Only feasible for tiny graphs; ignores beam (exact Viterbi).
    Returns (best_cost_with_final, best_olabel_seq).
    """
    T = logp.shape[0]
    # DP over (frame, state) with eps closure done exactly.
    def eps_closure(frontier):
        # frontier: {state: (cost, olabels)}
        changed = True
        while changed:
            changed = False
            for s, (c, labs) in list(frontier.items()):
                for arc in fst.arcs(s):
                    if arc.ilabel != EPSILON:
                        continue
                    nc = c + arc.weight
                    nl = labs + ((arc.olabel,) if arc.olabel else ())
                    if arc.nextstate not in frontier or nc < frontier[arc.nextstate][0]:
                        frontier[arc.nextstate] = (nc, nl)
                        changed = True
        return frontier

    frontier = eps_closure({fst.start: (0.0, ())})
    for t in range(T):
        new = {}
        for s, (c, labs) in frontier.items():
            for arc in fst.arcs(s):
                if arc.ilabel == EPSILON:
                    continue
                nc = c + arc.weight - logp[t, arc.ilabel - 1]
                nl = labs + ((arc.olabel,) if arc.olabel else ())
                if arc.nextstate not in new or nc < new[arc.nextstate][0]:
                    new[arc.nextstate] = (nc, nl)
        frontier = eps_closure(new)
    best = (INF, ())
    for s, (c, labs) in frontier.items():
        if fst.is_final(s):
            total = c + fst.final(s)
            if total < best[0]:
                best = (total, labs)
    return best


class TestOracleAgainstBruteForce:
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_exact_viterbi(self, seed):
        rng = np.random.default_rng(seed)
        fst = random_fst(8, 3, rng, mean_arcs_per_state=2.0)
        T, V = 6, 3
        logp = np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)
        dec = OracleSimpleDecoder(fst, beam=1e9)  # effectively no pruning
        ok = dec.decode(DecodableCtc(logp))
        assert ok
        exact_cost, _ = brute_force_best(fst, logp)
        if exact_cost == INF:
            assert not dec.reached_final()
            return
        assert dec.reached_final()
        bp = dec.get_best_path()
        assert path_total_cost(bp) == pytest.approx(exact_cost, abs=1e-3)

    @pytest.mark.parametrize("seed", range(3))
    def test_beam_keeps_best_path(self, seed):
        # A wide beam must not change the best path cost.
        rng = np.random.default_rng(100 + seed)
        fst = random_fst(10, 4, rng)
        T, V = 8, 4
        logp = np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)
        d1 = OracleSimpleDecoder(fst, beam=1e9)
        d2 = OracleSimpleDecoder(fst, beam=30.0)
        d1.decode(DecodableCtc(logp))
        d2.decode(DecodableCtc(logp))
        if d1.reached_final() and d2.reached_final():
            assert path_total_cost(d1.get_best_path()) == pytest.approx(
                path_total_cost(d2.get_best_path()), abs=1e-3
            )


class TestOracleCtc:
    def test_h_decode_equals_collapsed_greedy_when_peaked(self):
        # With very peaked posteriors, Viterbi through the CTC topo equals
        # collapsed greedy.
        rng = np.random.default_rng(0)
        V, T = 6, 20
        ids = rng.integers(0, V, size=T)
        logp = np.full((T, V), -20.0, dtype=np.float32)
        logp[np.arange(T), ids] = -0.001
        h = ctc_topo(V)
        dec = OracleSimpleDecoder(h, beam=50.0)
        dec.decode(DecodableCtc(logp))
        hyp = path_labels(dec.get_best_path())
        # collapse repeats then drop blanks
        ref = [int(k) for k, _ in itertools.groupby(ids.tolist()) if k != 0]
        assert hyp == ref

    def test_streaming_advance_matches_full(self):
        rng = np.random.default_rng(1)
        V, T = 5, 30
        logp = np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)
        h = ctc_topo(V)

        full = OracleSimpleDecoder(h, beam=16.0)
        full.decode(DecodableCtc(logp))

        # Chunked decode via offset decodables (decodable-ctc.h:16-24).
        stream = OracleSimpleDecoder(h, beam=16.0)
        stream.init_decoding()
        for lo in range(0, T, 7):
            hi = min(lo + 7, T)
            stream.advance_decoding(DecodableCtc(logp[lo:hi], offset=lo))
        assert stream.num_frames_decoded == T
        assert path_labels(stream.get_best_path()) == path_labels(full.get_best_path())
        assert path_total_cost(stream.get_best_path()) == pytest.approx(
            path_total_cost(full.get_best_path()), abs=1e-4
        )

    def test_max_num_frames_limit(self):
        rng = np.random.default_rng(2)
        V, T = 4, 10
        logp = np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)
        dec = OracleSimpleDecoder(ctc_topo(V), beam=16.0)
        dec.init_decoding()
        dec.advance_decoding(DecodableCtc(logp), max_num_frames=3)
        assert dec.num_frames_decoded == 3
        dec.advance_decoding(DecodableCtc(logp))
        assert dec.num_frames_decoded == T


class TestPythonDecodable:
    def test_custom_decodable(self):
        # Python-subclassed decodable (trampoline parity,
        # python/csrc/decodable-itf.cc:16-39).
        class Peaked(DecodableInterface):
            def __init__(self, ids, V):
                self.ids, self.V = ids, V

            def log_likelihood(self, frame, index):
                return -0.01 if (index - 1) == self.ids[frame] else -15.0

            def num_frames_ready(self):
                return len(self.ids)

            def num_indices(self):
                return self.V

            def is_last_frame(self, frame):
                return frame == len(self.ids) - 1

        ids = [2, 2, 0, 1, 1, 0, 3]
        dec = OracleSimpleDecoder(ctc_topo(4), beam=20.0)
        dec.decode(Peaked(ids, 4))
        assert path_labels(dec.get_best_path()) == [2, 1, 3]


class TestFinalSemantics:
    def test_final_relative_cost(self):
        f = StdVectorFst()
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, 1, 1, 0.0, s1)
        f.add_arc(s0, 2, 2, 1.0, s2)
        f.set_final(s2, 0.5)
        logp = np.zeros((1, 2), dtype=np.float32)
        dec = OracleSimpleDecoder(f, beam=10.0)
        dec.decode(DecodableCtc(logp))
        # best token (s1, cost 0) is not final; final token (s2) costs 1+0.5
        assert dec.reached_final()
        assert dec.final_relative_cost() == pytest.approx(1.5)
        # best path must go to the final state despite higher cost
        assert path_labels(dec.get_best_path()) == [2]

    def test_no_final_reached(self):
        f = StdVectorFst()
        s0, s1 = f.add_state(), f.add_state()
        f.set_start(s0)
        f.add_arc(s0, 1, 7, 0.0, s1)  # s1 not final
        logp = np.zeros((1, 1), dtype=np.float32)
        dec = OracleSimpleDecoder(f, beam=10.0)
        ok = dec.decode(DecodableCtc(logp))
        assert ok
        assert not dec.reached_final()
        assert dec.final_relative_cost() == INF
        # use_final_probs falls back to best token (simple-decoder.cc:110-114)
        assert path_labels(dec.get_best_path()) == [7]


class TestDedupSelectRec:
    def test_records_cover_live_links_and_match_selection(self):
        """dedup_select_rec must (a) select the identical frontier as
        dedup_select and (b) record exactly the candidates whose
        destination token survived the frontier top-K (with an unbounded
        slack beam and ample budget): links into dropped tokens are dead
        and must not spend budget; everything else must be present."""
        import jax.numpy as jnp
        from kaldi_decoder_tpu.ops.segment import dedup_select, dedup_select_rec

        rng = np.random.default_rng(7)
        for _ in range(50):
            N, S, K, R = 64, 10, 8, 64 + 8
            st_np = rng.integers(0, S, N).astype(np.int32)
            st = jnp.asarray(st_np)
            c = (rng.random(N).astype(np.float32) * 5 + 2.0)  # minc > 1
            c[rng.random(N) < 0.4] = np.inf
            cj = jnp.asarray(c)
            a = dedup_select(st, cj, K, S)
            b = dedup_select_rec(st, cj, K, S, R)
            assert np.array_equal(np.asarray(a.states), np.asarray(b.states))
            assert np.allclose(
                np.asarray(a.costs), np.asarray(b.costs), equal_nan=True
            )
            assert np.array_equal(
                np.asarray(a.cand_idx), np.asarray(b.cand_idx)
            )
            live_states = {
                int(s)
                for s, cost in zip(np.asarray(a.states), np.asarray(a.costs))
                if np.isfinite(cost)
            }
            want = {
                i
                for i in np.flatnonzero(np.isfinite(c)).tolist()
                if int(st_np[i]) in live_states
            }
            got = {int(x) for x in np.asarray(b.recs[0]) if x >= 0}
            assert got == want
            assert not bool(np.asarray(b.rec_overflow))

    def test_slack_beam_filters_and_orders_extras(self):
        """Extras above the slack beam are provably-dead links and must be
        filtered; under budget pressure the smallest-slack extras win."""
        import jax.numpy as jnp
        from kaldi_decoder_tpu.ops.segment import dedup_select_rec

        # One state, five candidates with slacks 0,1,2,3,9.
        st = jnp.asarray(np.zeros(5, np.int32))
        c = jnp.asarray(np.array([2.0, 3.0, 4.0, 5.0, 11.0], np.float32))
        K = 4
        b = dedup_select_rec(st, c, K, 2, K + 4, slack_beam=5.0)
        got = {int(x) for x in np.asarray(b.recs[0]) if x >= 0}
        assert got == {0, 1, 2, 3}  # slack-9 candidate filtered
        assert not bool(np.asarray(b.rec_overflow))
        # Records come out winners-first then slack-ascending: with a
        # K=2 frontier and only 3 record slots the winner (idx 0) and the
        # two smallest-slack extras (1, 2) survive, and the dropped
        # slack-3 link flags overflow.
        b = dedup_select_rec(st, c, 2, 2, 3, slack_beam=5.0)
        rows = [int(x) for x in np.asarray(b.recs[0]) if x >= 0]
        assert rows == [0, 1, 2]
        assert bool(np.asarray(b.rec_overflow))
