"""Tracing/profiling hooks (SURVEY §5: the observability the reference
lacks entirely — its only hook is the commented-out token-count log at
`kaldi-decoder/csrc/faster-decoder.cc:164`)."""

import numpy as np
import pytest

from kaldi_decoder_tpu.decoders.frontier import config_for_graph
from kaldi_decoder_tpu.decoders.lattice import BatchedLatticeDecoder
from kaldi_decoder_tpu.decoders.viterbi import BatchedViterbiDecoder
from kaldi_decoder_tpu.fst.synthetic import synthetic_graph
from kaldi_decoder_tpu.utils import profiling
from kaldi_decoder_tpu.utils.logging import DecodeStats


@pytest.fixture(scope="module")
def graph():
    return synthetic_graph(60, 240, 12, seed=3, eps_arcs=20)


def _scores(B, T, V, seed=0):
    rng = np.random.default_rng(seed)
    return np.log(rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32))


def test_viterbi_stats_report_throughput(graph):
    dec = BatchedViterbiDecoder(graph, config_for_graph(graph, beam=12.0))
    res = dec.decode(_scores(3, 17, 12))
    st = res.stats(1)
    assert st.wall_seconds > 0.0
    assert st.batch_frames == 3 * 17
    assert st.frames_per_second > 0.0
    # RTF scales linearly with the frame rate.
    assert st.audio_seconds_per_second(0.04) == pytest.approx(
        st.frames_per_second * 0.04
    )
    assert "frames/s=" in st.summary()


def test_lattice_stats_report_throughput(graph):
    dec = BatchedLatticeDecoder(graph, config_for_graph(graph, beam=12.0))
    res = dec.decode(_scores(2, 11, 12))
    st = res.stats()
    assert st.wall_seconds > 0.0
    assert st.batch_frames == 2 * 11
    assert st.frames_per_second > 0.0


def test_unmeasured_stats_report_zero():
    st = DecodeStats(num_frames=10)
    assert st.frames_per_second == 0.0
    assert st.audio_seconds_per_second(0.04) == 0.0


def test_trace_context_runs(tmp_path, graph):
    """trace() must never break the decode it wraps (it degrades to a
    warning if the profiler backend is unavailable)."""
    dec = BatchedViterbiDecoder(graph, config_for_graph(graph, beam=12.0))
    with profiling.trace(str(tmp_path)):
        res = dec.decode(_scores(1, 5, 12))
    assert res.best_path(0) is not None


def test_annotate_is_context_manager():
    with profiling.annotate("kdtpu.test", step=3):
        pass
