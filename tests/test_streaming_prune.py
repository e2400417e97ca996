"""Windowed lattice pruning (``prune_interval``, VERDICT r1 item #3).

The streaming decoder must fold device records into the incremental host
lattice as chunks arrive and prune provably-dead tokens/links every
``prune_interval`` frames (`lattice-simple-decoder.cc:53-73`, `:198-223`),
so live host state tracks the *pruned* lattice size instead of the raw
record volume — while producing an identical final lattice to a one-shot
decode (mid-decode extra costs are lower bounds, so nothing prunable can
resurface).
"""

import numpy as np
import pytest

from kaldi_decoder_tpu.decodable import DecodableCtc
from kaldi_decoder_tpu.decoders import BatchedLatticeDecoder
from kaldi_decoder_tpu.decoders.lattice import (
    LatticeFasterDecoder,
    LatticeFasterDecoderConfig,
)
from kaldi_decoder_tpu.fst import compile_fst, path_labels, random_fst
from kaldi_decoder_tpu.lattice.prune import PrunedLattice

V, T, BEAM, LB = 6, 160, 14.0, 7.0


def rand_scores(rng, t=T):
    return np.log(rng.dirichlet(np.ones(V) * 0.5, size=t)).astype(np.float32)


def links_of(pl: PrunedLattice):
    out = set()
    for f in range(pl.num_frames + 1):
        toks = pl.tokens[f]
        for lk, fd in (
            (pl.eps_links[f], f),
            (pl.em_links[f] if f < pl.num_frames else None, f + 1),
        ):
            if lk is None:
                continue
            dtoks = pl.tokens[fd]
            for i in range(len(lk.src)):
                if not lk.keep[i]:
                    continue
                out.add(
                    (f, int(toks.states[lk.src[i]]), fd,
                     int(dtoks.states[lk.dst[i]]), int(lk.ilabel[i]),
                     int(lk.olabel[i]), round(float(lk.graph_cost[i]), 3),
                     round(float(lk.ac_cost[i]), 3))
                )
    return out


def stream_decode(fst, scores, prune_interval, chunk=37, track=None):
    cfg = LatticeFasterDecoderConfig(
        beam=BEAM, lattice_beam=LB, min_active=0,
        prune_interval=prune_interval,
    )
    d = LatticeFasterDecoder(fst, cfg)
    d.init_decoding()
    dec = DecodableCtc(scores)
    done = 0
    while done < len(scores):
        d.advance_decoding(dec, max_num_frames=chunk)
        done = d.num_frames_decoded()
        if track is not None:
            track.append(d._inc.live_links())
    d.finalize_decoding()
    return d


class TestPruneInterval:
    @pytest.mark.parametrize("seed", range(3))
    def test_streaming_equals_oneshot(self, seed):
        rng = np.random.default_rng(seed)
        fst = random_fst(200, V - 1, rng, mean_arcs_per_state=4.0)
        scores = rand_scores(rng)

        d = stream_decode(fst, scores, prune_interval=10)
        pl_stream = d._pruned(True)

        g = compile_fst(fst)
        one = BatchedLatticeDecoder(
            g, lattice_beam=LB, pad_time_to=16,
            frontier=__import__(
                "kaldi_decoder_tpu.decoders.frontier", fromlist=["x"]
            ).config_for_graph(g, beam=BEAM, min_active=0),
        )
        pl_one = one.decode(scores)._prune(0)
        assert pl_stream is not None and pl_one is not None
        assert links_of(pl_stream) == links_of(pl_one)

        ok, sp_s = d.get_best_path()
        assert ok
        assert path_labels(sp_s) == path_labels(one.decode(scores).best_path(0))

    def test_live_state_is_bounded(self):
        """With pruning every 10 frames the peak live link count must stay
        near the pruned-lattice size; without pruning it grows ~linearly
        with the raw record volume."""
        rng = np.random.default_rng(11)
        fst = random_fst(200, V - 1, rng, mean_arcs_per_state=4.0)
        scores = rand_scores(rng)

        peak_pruned, peak_raw = [], []
        d1 = stream_decode(fst, scores, prune_interval=10, track=peak_pruned)
        d2 = stream_decode(fst, scores, prune_interval=10**9, track=peak_raw)
        assert links_of(d1._pruned(True)) == links_of(d2._pruned(True))
        assert max(peak_pruned) < 0.5 * max(peak_raw), (
            max(peak_pruned), max(peak_raw),
        )

    def test_long_stream_memory_flat(self):
        """A long stream's live link count plateaus (flat memory in T)."""
        rng = np.random.default_rng(5)
        fst = random_fst(120, V - 1, rng, mean_arcs_per_state=3.0)
        scores = rand_scores(rng, t=600)
        track = []
        d = stream_decode(fst, scores, prune_interval=25, chunk=64, track=track)
        # live links after 1/4 of the stream vs at the end: growth must be
        # ~linear in the pruned lattice (≈ T), not in raw records — and the
        # per-frame live rate must be far below the record budget.
        per_frame = track[-1] / 600
        budget = d._dev_cfg.em_records + d._dev_cfg.eps_records
        assert per_frame < 0.25 * budget, (per_frame, budget)
        ok, sp = d.get_best_path()
        assert ok and sp.num_states > 0
