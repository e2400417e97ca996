"""Differential tests for the device lattice decoder.

Strategy (SURVEY §4): with the search beam set far wider than the lattice
beam, beam pruning never fires and the lattice content is determined purely
by lattice_beam — then the device lattice and the oracle
(reference-semantics) lattice must contain exactly the same word sequences
at the same costs.  With realistic beams we check the invariants that are
order-independent: best-path equality, every lattice path within
lattice_beam of the best, and the best path always contained.
"""

import numpy as np
import pytest

from kaldi_decoder_tpu.decodable import DecodableCtc
from kaldi_decoder_tpu.decoders.lattice import (
    BatchedLatticeDecoder,
    LatticeFasterDecoder,
    LatticeFasterDecoderConfig,
    LatticeSimpleDecoder,
    LatticeSimpleDecoderConfig,
)
from kaldi_decoder_tpu.decoders.frontier import config_for_graph
from kaldi_decoder_tpu.decoders.ref_lattice import OracleLatticeDecoder
from kaldi_decoder_tpu.fst import (
    compile_fst,
    ctc_topo,
    path_labels,
    path_total_cost,
    random_fst,
)
from kaldi_decoder_tpu.lattice.post import (
    determinize_lattice,
    nbest,
    rescore_lattice_with_lm,
    scale_lattice,
)

INF = float("inf")


def rand_logp(rng, T, V):
    return np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)


def word_seq_costs(lat, n=500):
    """{olabel seq: best total cost} over up to n unique word sequences."""
    return {
        ols: g + a
        for _, ols, g, a in nbest(lat, n, unique_word_sequences=True)
    }


def assert_same_paths(lat_a, lat_b, atol=1e-3):
    pa, pb = word_seq_costs(lat_a), word_seq_costs(lat_b)
    assert set(pa) == set(pb), (
        f"word-sequence sets differ: only_a={set(pa)-set(pb)}, "
        f"only_b={set(pb)-set(pa)}"
    )
    for k in pa:
        assert pa[k] == pytest.approx(pb[k], abs=atol), f"cost mismatch for {k}"


class TestLatticeVsOracle:
    @pytest.mark.parametrize("seed", range(6))
    def test_exact_path_set_wide_beam(self, seed):
        rng = np.random.default_rng(seed)
        V = 4
        fst = random_fst(12, V, rng, mean_arcs_per_state=2.5)
        g = compile_fst(fst)
        beam, lattice_beam = 1000.0, 4.0
        fc = config_for_graph(
            g, beam=beam, max_active=2**31 - 1, min_active=0, frontier_size=16
        )
        dec = BatchedLatticeDecoder(g, fc, lattice_beam=lattice_beam, pad_time_to=8)
        logp = rand_logp(rng, 7, V)
        res = dec.decode(logp)
        oracle = OracleLatticeDecoder(fst, beam=beam, lattice_beam=lattice_beam)
        oracle.decode(DecodableCtc(logp))

        dlat = res.raw_lattice(0)
        olat = oracle.get_raw_lattice()
        assert (dlat is None) == (olat is None)
        if dlat is None:
            return
        assert_same_paths(dlat, olat)
        assert res.final_relative_cost(0) == pytest.approx(
            oracle.final_relative_cost(), abs=1e-3
        ) or (
            res.final_relative_cost(0) == INF
            and oracle.final_relative_cost() == INF
        )

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_best_path_realistic_beam(self, seed):
        rng = np.random.default_rng(100 + seed)
        V = 5
        fst = random_fst(25, V, rng)
        g = compile_fst(fst)
        fc = config_for_graph(g, beam=12.0, min_active=0, frontier_size=32)
        dec = BatchedLatticeDecoder(g, fc, lattice_beam=6.0, pad_time_to=8)
        logp = rand_logp(rng, 10, V)
        res = dec.decode(logp)
        oracle = OracleLatticeDecoder(fst, beam=12.0, lattice_beam=6.0)
        oracle.decode(DecodableCtc(logp))
        dbest, obest = res.best_path(0), oracle.get_best_path()
        assert (dbest is None) == (obest is None)
        if dbest is not None:
            assert path_labels(dbest) == path_labels(obest)
            assert path_total_cost(dbest) == pytest.approx(
                path_total_cost(obest), abs=1e-3
            )

    def test_lattice_beam_invariant(self):
        # The lattice-beam guarantee (lattice-simple-decoder.h:188-194):
        # every ARC lies on at least one complete path within lattice_beam
        # of the best (complete paths themselves may combine slack and
        # exceed it — same as the reference).
        from kaldi_decoder_tpu.fst.ops import topological_order

        rng = np.random.default_rng(7)
        V = 4
        fst = random_fst(15, V, rng)
        g = compile_fst(fst)
        lattice_beam = 5.0
        fc = config_for_graph(g, beam=30.0, min_active=0, frontier_size=16)
        dec = BatchedLatticeDecoder(g, fc, lattice_beam=lattice_beam, pad_time_to=8)
        logp = rand_logp(rng, 8, V)
        res = dec.decode(logp)
        lat = res.raw_lattice(0)
        if lat is None:
            pytest.skip("no lattice for this seed")
        order = topological_order(lat)
        S = lat.num_states
        alpha = np.full(S, INF)
        beta = np.full(S, INF)
        alpha[lat.start] = 0.0
        for s in order:
            for arc in lat.arcs(s):
                c = alpha[s] + arc.weight[0] + arc.weight[1]
                alpha[arc.nextstate] = min(alpha[arc.nextstate], c)
        for s in reversed(order):
            if lat.is_final(s):
                fw = lat.final(s)
                beta[s] = fw[0] + fw[1]
            for arc in lat.arcs(s):
                c = arc.weight[0] + arc.weight[1] + beta[arc.nextstate]
                beta[s] = min(beta[s], c)
        best = beta[lat.start]
        for s in order:
            for arc in lat.arcs(s):
                through = (
                    alpha[s]
                    + arc.weight[0]
                    + arc.weight[1]
                    + beta[arc.nextstate]
                )
                assert through <= best + lattice_beam + 1e-3


class TestLatticeApi:
    def test_lattice_simple_decoder_ctc(self):
        rng = np.random.default_rng(0)
        V, T = 6, 20
        h = ctc_topo(V)
        logp = rand_logp(rng, T, V)
        dec = LatticeSimpleDecoder(
            h, LatticeSimpleDecoderConfig(beam=16.0, lattice_beam=8.0)
        )
        dec.chunk_pad = 8
        ok = dec.decode(DecodableCtc(logp))
        assert ok
        ok2, raw = dec.get_raw_lattice()
        assert ok2 and raw.num_states > 0
        ok3, best = dec.get_best_path()
        assert ok3
        oracle = OracleLatticeDecoder(h, beam=16.0, lattice_beam=8.0)
        oracle.decode(DecodableCtc(logp))
        assert path_labels(best) == path_labels(oracle.get_best_path())
        assert dec.num_frames_decoded() == T
        assert str(dec.get_config()).startswith("LatticeSimpleDecoderConfig")

    def test_lattice_faster_decoder(self):
        # the capability union: lattice output under max_active pruning
        rng = np.random.default_rng(1)
        V, T = 8, 15
        h = ctc_topo(V)
        logp = rand_logp(rng, T, V)
        cfg = LatticeFasterDecoderConfig(
            beam=16.0, lattice_beam=8.0, max_active=5, min_active=2
        )
        dec = LatticeFasterDecoder(h, cfg)
        dec.chunk_pad = 8
        ok = dec.decode(DecodableCtc(logp))
        assert ok
        ok2, best = dec.get_best_path()
        assert ok2
        # under pruning the best path may differ from unpruned decode, but
        # must still be a valid in-beam path of the unpruned lattice
        wide = LatticeFasterDecoder(
            h, LatticeFasterDecoderConfig(beam=16.0, lattice_beam=8.0)
        )
        wide.chunk_pad = 8
        wide.decode(DecodableCtc(logp))
        _, wbest = wide.get_best_path()
        assert path_total_cost(best) >= path_total_cost(wbest) - 1e-4

    def test_config_validation(self):
        with pytest.raises(ValueError):
            LatticeFasterDecoderConfig(prune_scale=1.5).check()
        with pytest.raises(ValueError):
            LatticeSimpleDecoderConfig(lattice_beam=-1.0).check()

    def test_streaming_lattice_matches_batch(self):
        rng = np.random.default_rng(2)
        V, T = 5, 24
        h = ctc_topo(V)
        logp = rand_logp(rng, T, V)
        full = LatticeSimpleDecoder(h, LatticeSimpleDecoderConfig(beam=14.0))
        full.chunk_pad = 8
        full.decode(DecodableCtc(logp))
        _, flat = full.get_raw_lattice()

        stream = LatticeSimpleDecoder(h, LatticeSimpleDecoderConfig(beam=14.0))
        stream.chunk_pad = 8
        stream.init_decoding()
        for lo in range(0, T, 7):
            stream.advance_decoding(DecodableCtc(logp[lo : lo + 7], offset=lo))
        stream.finalize_decoding()
        _, slat = stream.get_raw_lattice()
        assert_same_paths(flat, slat)

    def test_use_final_probs_after_finalize_raises(self):
        rng = np.random.default_rng(3)
        h = ctc_topo(4)
        dec = LatticeSimpleDecoder(h)
        dec.chunk_pad = 8
        dec.decode(DecodableCtc(rand_logp(rng, 5, 4)))
        with pytest.raises(RuntimeError, match="use_final_probs"):
            dec.get_raw_lattice(use_final_probs=False)


class TestPost:
    def _small_lattice(self):
        rng = np.random.default_rng(5)
        V = 4
        fst = random_fst(12, V, rng)
        g = compile_fst(fst)
        fc = config_for_graph(g, beam=1000.0, min_active=0, frontier_size=16)
        dec = BatchedLatticeDecoder(g, fc, lattice_beam=6.0, pad_time_to=8)
        res = dec.decode(rand_logp(rng, 6, V))
        lat = res.raw_lattice(0)
        assert lat is not None
        return lat

    def test_nbest_sorted_and_valid(self):
        lat = self._small_lattice()
        paths = nbest(lat, 20)
        costs = [g + a for _, _, g, a in paths]
        assert costs == sorted(costs)
        # first path == shortest path cost
        from kaldi_decoder_tpu.fst.ops import shortest_path, path_total_cost

        assert costs[0] == pytest.approx(
            path_total_cost(shortest_path(lat)), abs=1e-4
        )

    def test_determinize_unique_words(self):
        lat = self._small_lattice()
        det = determinize_lattice(lat)
        paths = nbest(det, 5000, unique_word_sequences=False)
        seqs = [ols for _, ols, _, _ in paths]
        assert len(seqs) == len(set(seqs)), "determinized lattice has dup word seqs"
        # exact: same word-sequence set at the same minimal costs
        orig = word_seq_costs(lat, 5000)
        assert set(seqs) == set(orig)
        for _, ols, g, a in paths:
            assert g + a == pytest.approx(orig[ols], abs=1e-3)

    def test_nbest_suboptimal_final_stop_not_emitted_first(self):
        """Regression: a final state whose *stopping* cost is worse than
        continuing must not claim its word sequence at the higher cost —
        completions are heap events popped at exact total cost."""
        from kaldi_decoder_tpu.fst.fst import Lattice

        lat = Lattice()
        s0, s1, s2 = (lat.add_state() for _ in range(3))
        lat.set_start(s0)
        lat.add_arc(s0, 1, 1, (0.0, 0.0), s1)
        lat.set_final(s1, (5.0, 0.0))  # stopping here costs 5
        lat.add_arc(s1, 2, 0, (0.0, 0.0), s2)  # continuing is free
        lat.set_final(s2, (0.0, 0.0))
        paths = nbest(lat, 5, unique_word_sequences=True)
        assert paths[0][1] == (1,)
        assert paths[0][2] + paths[0][3] == pytest.approx(0.0)
        # non-unique: both completions, cheapest first
        both = [g + a for _, ols, g, a in nbest(lat, 5) if ols == (1,)]
        assert both == pytest.approx([0.0, 5.0])

    def test_determinize_is_label_deterministic(self):
        det = determinize_lattice(self._small_lattice())
        for s in range(det.num_states):
            labs = [a.olabel for a in det.arcs(s)]
            assert len(labs) == len(set(labs)), f"state {s} not deterministic"
            assert 0 not in labs, "determinized lattice must be eps-free"

    def test_determinize_keeps_all_sequences_beyond_nbest_horizon(self):
        """The capability an n-best-100 approximation cannot provide
        (VERDICT r2 missing #2): a lattice with 2^10 = 1024 in-beam word
        sequences determinizes to a compact DAG containing every one of
        them at its exact cost."""
        from kaldi_decoder_tpu.fst.fst import Lattice

        k = 10
        lat = Lattice()
        cur = lat.add_state()
        lat.set_start(cur)
        rng = np.random.default_rng(0)
        diamonds = []
        for i in range(k):
            a, b, join = lat.add_state(), lat.add_state(), lat.add_state()
            w1, w2 = float(rng.uniform(0, 0.2)), float(rng.uniform(0, 0.2))
            lat.add_arc(cur, 1, 2 * i + 1, (w1, 0.1), a)
            lat.add_arc(cur, 1, 2 * i + 2, (w2, 0.1), b)
            lat.add_arc(a, 2, 0, (0.0, 0.0), join)  # word-eps arcs too
            lat.add_arc(b, 2, 0, (0.0, 0.0), join)
            diamonds.append((2 * i + 1, w1, 2 * i + 2, w2))
            cur = join
        lat.set_final(cur, (0.0, 0.0))
        det = determinize_lattice(lat)
        # Count word sequences in the det DAG (exact DAG path count).
        from kaldi_decoder_tpu.fst.ops import topological_order

        order = topological_order(det)
        npaths = [0] * det.num_states
        for s in reversed(order):
            npaths[s] = int(det.is_final(s)) + sum(
                npaths[a.nextstate] for a in det.arcs(s)
            )
        assert npaths[det.start] == 2 ** k
        # Spot-check exact costs of the best and a random sequence.
        best = nbest(det, 1)[0]
        exp_best = sum(min(w1, w2) for _, w1, _, w2 in diamonds)
        assert best[2] + best[3] == pytest.approx(exp_best + 0.1 * k, abs=1e-4)

    def test_determinize_beam_prunes_during_construction(self):
        lat = self._small_lattice()
        full = word_seq_costs(determinize_lattice(lat), 500)
        best = min(full.values())
        det = determinize_lattice(lat, beam=1.0)
        pruned = word_seq_costs(det, 500)
        for ols, c in pruned.items():
            assert c <= best + 1.0 + 1e-6
            assert c == pytest.approx(full[ols], abs=1e-3)
        # everything within the beam survives
        for ols, c in full.items():
            if c <= best + 1.0 - 1e-6:
                assert ols in pruned

    def test_scale_lattice(self):
        lat = self._small_lattice()
        sc = scale_lattice(lat, acoustic_scale=0.5, lm_scale=2.0)
        p0 = nbest(lat, 1)[0]
        # find same word seq in scaled lattice
        for p in nbest(sc, 50, unique_word_sequences=True):
            if p[1] == p0[1]:
                assert p[2] == pytest.approx(2.0 * p0[2], abs=1e-3)
                assert p[3] == pytest.approx(0.5 * p0[3], abs=1e-3)
                return
        pytest.fail("scaled lattice lost the best word sequence")

    def test_rescore_with_lm(self):
        lat = self._small_lattice()
        # constant per-word LM cost added on top of existing graph costs
        # (old_lm_scale=1): each word sequence's graph cost grows by
        # n_words * c; acoustic costs unchanged.
        c = 0.7
        res = rescore_lattice_with_lm(
            lat, lambda hist, w: c, lm_scale=1.0, old_lm_scale=1.0
        )
        orig = {
            ols: (g, a)
            for _, ols, g, a in nbest(lat, 20, unique_word_sequences=True)
        }
        hits = 0
        for _, ols, g, a in nbest(res, 20, unique_word_sequences=True):
            if ols in orig:
                og, oa = orig[ols]
                assert g == pytest.approx(og + len(ols) * c, abs=1e-3)
                assert a == pytest.approx(oa, abs=1e-3)
                hits += 1
        assert hits > 0


class TestDeterminizeAlignments:
    """DeterminizeLatticePruned's alignment capability (VERDICT r3 #7):
    token strings carried through subset construction in the
    (weight x left-string) semiring; the exact alignment of ANY word
    sequence is recoverable from the determinized lattice alone
    (`lattice-simple-decoder.h:57-60`)."""

    def _lat(self, seed=5, t=6):
        rng = np.random.default_rng(seed)
        V = 4
        fst = random_fst(12, V, rng)
        g = compile_fst(fst)
        fc = config_for_graph(g, beam=1000.0, min_active=0, frontier_size=16)
        dec = BatchedLatticeDecoder(g, fc, lattice_beam=6.0, pad_time_to=8)
        res = dec.decode(rand_logp(rng, t, V))
        lat = res.raw_lattice(0)
        assert lat is not None
        return lat

    @pytest.mark.parametrize("seed", [5, 6, 9])
    def test_alignments_match_bruteforce(self, seed):
        from kaldi_decoder_tpu.lattice.post import alignment_of

        lat = self._lat(seed)
        det, aligns = determinize_lattice(lat, with_alignments=True)
        # Brute force: best alignment per word sequence from the raw
        # lattice (nbest paths come out cheapest-first).
        best_align = {}
        best_cost = {}
        for ils, ols, gc, ac in nbest(lat, 20000):
            if ols not in best_align:
                best_align[ols] = ils
                best_cost[ols] = gc + ac
        assert best_align, "empty lattice"
        checked = 0
        for ols, ils in best_align.items():
            got = alignment_of(det, aligns, list(ols))
            assert got is not None, f"word seq {ols} missing from det lattice"
            assert got == ils, (ols, got, ils)
            checked += 1
        assert checked >= 3  # non-trivial case

    def test_alignment_weights_match_weight_only_det(self):
        lat = self._lat(6)
        det_w = determinize_lattice(lat)
        det_a, _ = determinize_lattice(lat, with_alignments=True)
        # Same word sequences at the same minimal costs (states may split
        # more in the string semiring, but the weighted language is equal).
        def seq_costs(d):
            out = {}
            for _, ols, gc, ac in nbest(d, 20000):
                out.setdefault(ols, round(gc + ac, 4))
            return out
        assert seq_costs(det_w) == seq_costs(det_a)

    def test_alignment_absent_sequence_is_none(self):
        from kaldi_decoder_tpu.lattice.post import alignment_of

        lat = self._lat(9)
        det, aligns = determinize_lattice(lat, with_alignments=True)
        assert alignment_of(det, aligns, [1, 1, 1, 1, 1, 1, 1, 2]) is None


def test_decode_async_pipelined_matches_serial():
    """Two decode_async batches in flight (the bench's pipelined shape)
    produce identical lattices/best paths to serial decode() calls —
    the dispatch-time download slices and init memoization must not
    leak state across batches."""
    import numpy as np

    from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder
    from kaldi_decoder_tpu.fst import path_labels, random_fst
    from kaldi_decoder_tpu.fst.csr import compile_fst

    rng = np.random.default_rng(17)
    fst = random_fst(num_states=120, num_symbols=14, rng=rng, eps_prob=0.2)
    graph = compile_fst(fst)
    dec = BatchedLatticeDecoder(graph, lattice_beam=6.0, pad_time_to=8)
    sc1 = np.log(
        rng.dirichlet(np.ones(14), size=(2, 19)).astype(np.float32)
    ).astype(np.float32)
    sc2 = np.log(
        rng.dirichlet(np.ones(14), size=(2, 19)).astype(np.float32)
    ).astype(np.float32)

    p1 = dec.decode_async(sc1, chunk_frames=8)
    p2 = dec.decode_async(sc2, chunk_frames=8)
    r1, r2 = p1.result(), p2.result()

    s1 = dec.decode(sc1, chunk_frames=8)
    s2 = dec.decode(sc2, chunk_frames=8)
    for got, want in ((r1, s1), (r2, s2)):
        for b in range(2):
            gp, wp = got.best_path(b), want.best_path(b)
            if wp is None:
                assert gp is None
            else:
                assert gp == wp
            assert got.best_path_labels(b) == want.best_path_labels(b)
