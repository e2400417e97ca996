"""Device backward sweep == full host path (round 4).

The device-side windowed extra-cost sweep (`decoders/sweep.py`) prunes
tokens/links on device and downloads only survivors; by the
IncrementalLattice argument (true extras only grow as more audio
arrives, and chunk boundaries/utterance finals use extra 0 exactly like
`lattice-simple-decoder.h:200`'s Token constructor) everything it drops
is provably outside the final lattice.  These tests pin that claim:
``decode(device_prune=True)`` must produce the IDENTICAL raw lattice to
``decode(device_prune=False)`` — arcs, weights, finals — across eps-free
and eps-heavy graphs, folded and unfolded, chunked and one-shot, and
varied utterance lengths.
"""

import numpy as np
import pytest

from kaldi_decoder_tpu.decoders import BatchedLatticeDecoder
from kaldi_decoder_tpu.decoders.frontier import config_for_graph
from kaldi_decoder_tpu.fst import path_labels
from kaldi_decoder_tpu.fst.hlg import make_hlg, make_utterances
from kaldi_decoder_tpu.fst.synthetic import synthetic_graph


def lattice_sig(lat):
    """Canonical arc-set signature of a Lattice (state ids normalized by
    sorted outgoing-arc structure is overkill; decoder lattices from both
    paths are built frame-major from identical token sets, so state ids
    match when the structures match)."""
    if lat is None:
        return None
    arcs = []
    for s in range(lat.num_states):
        for a in lat.arcs(s):
            arcs.append(
                (s, a.ilabel, a.olabel, round(a.weight[0], 5),
                 round(a.weight[1], 5), a.nextstate)
            )
    finals = [
        (s, tuple(round(w, 5) for w in lat.final(s)))
        for s in range(lat.num_states)
        if lat.is_final(s)
    ]
    return (lat.start, tuple(sorted(arcs)), tuple(sorted(finals)))


def compare_paths(graph_or_fst, scores, lengths, fold, chunk_frames, **kw):
    common = dict(
        lattice_beam=kw.pop("lattice_beam", 5.0),
        em_records=kw.pop("em_records", 512),
        eps_records=kw.pop("eps_records", 128),
        pad_time_to=kw.pop("pad_time_to", 8),
        fold=fold,
    )
    fc_kw = dict(beam=kw.pop("beam", 10.0), max_active=kw.pop("max_active", 64))
    dec = BatchedLatticeDecoder(graph_or_fst, frontier=None, **common)
    fc = config_for_graph(dec._dev_graph, **fc_kw)
    dec = BatchedLatticeDecoder(graph_or_fst, frontier=fc, **common)
    full = dec.decode(scores, lengths, chunk_frames=chunk_frames,
                      device_prune=False)
    swept = dec.decode(scores, lengths, chunk_frames=chunk_frames,
                       device_prune=True)
    B = scores.shape[0]
    for b in range(B):
        assert not swept.sweep_overflowed(b), f"sweep buffers overflowed b={b}"
        lat_f = full.raw_lattice(b)
        lat_s = swept.raw_lattice(b)
        assert lattice_sig(lat_f) == lattice_sig(lat_s), f"b={b}"
        bp_f = full.best_path(b)
        bp_s = swept.best_path(b)
        if bp_f is None:
            assert bp_s is None
        else:
            assert path_labels(bp_f) == path_labels(bp_s)
        assert np.isclose(
            full.final_relative_cost(b), swept.final_relative_cost(b),
            atol=1e-4, equal_nan=True,
        ) or (
            not np.isfinite(full.final_relative_cost(b))
            and not np.isfinite(swept.final_relative_cost(b))
        )


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("chunk", [None, 8])
def test_sweep_matches_full_hlg(fold, chunk):
    g = make_hlg(num_words=40, num_tokens=12, num_sentences=120, seed=3)
    rng = np.random.default_rng(7)
    scores, lengths, refs = make_utterances(
        g, 3, rng, words_per_utt=(3, 5), peak=2.0, noise_alpha=0.6
    )
    compare_paths(g.hlg, scores, lengths, fold, chunk)


@pytest.mark.parametrize("chunk", [None, 16])
def test_sweep_matches_full_synthetic_eps(chunk):
    # Random graph with a real eps sub-CSR (unfolded -> D > 0 sweep path).
    graph = synthetic_graph(300, 1500, 20, seed=11, eps_arcs=150)
    rng = np.random.default_rng(2)
    B, T, V = 2, 37, 20
    scores = np.log(
        rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32)
    ).astype(np.float32)
    lengths = np.array([T, T - 9], np.int32)
    compare_paths(graph, scores, lengths, False, chunk, beam=8.0,
                  lattice_beam=4.0)


def test_sweep_varied_lengths_mid_chunk():
    g = make_hlg(num_words=30, num_tokens=10, num_sentences=80, seed=9)
    rng = np.random.default_rng(13)
    scores, lengths, _ = make_utterances(
        g, 4, rng, words_per_utt=(2, 6), peak=2.2, noise_alpha=0.7
    )
    # Force utterance ends strictly inside chunks.
    lengths = np.maximum(lengths - np.array([0, 3, 11, 5], np.int32), 5)
    compare_paths(g.hlg, scores, lengths, True, 8)


@pytest.mark.parametrize("fold", [False, True])
def test_sweep_matches_full_under_record_overflow(fold):
    """Record-budget overflow drops links on device; both paths consume
    the SAME record set, so the final lattices must still be identical
    (and degrade gracefully — never crash)."""
    g = make_hlg(num_words=40, num_tokens=12, num_sentences=120, seed=5)
    rng = np.random.default_rng(21)
    scores, lengths, _ = make_utterances(
        g, 2, rng, words_per_utt=(4, 6), peak=1.2, noise_alpha=2.0
    )
    compare_paths(
        g.hlg, scores, lengths, fold, 8,
        em_records=48, eps_records=16, beam=12.0, max_active=48,
        lattice_beam=6.0,
    )
