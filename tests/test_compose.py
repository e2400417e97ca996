"""Differential tests for weighted composition.

``compose`` is validated at the *language* level against brute-force path
enumeration: for small acyclic transducers A and B, the set of
(input-string, output-string) -> min-cost mappings of ``compose(A, B)``
must equal the min-cost join of A's and B's path languages (matching A's
output strings to B's input strings) — the defining property of weighted
composition over the tropical semiring.
"""

import numpy as np
import pytest

from kaldi_decoder_tpu.fst.fst import EPSILON, StdVectorFst
from kaldi_decoder_tpu.fst.ops import compose, path_labels
from kaldi_decoder_tpu.fst.topo import ctc_topo, lexicon_fst


def enumerate_language(fst, max_paths=200000):
    """All accepted paths as {(istring, ostring): min_cost} (acyclic only)."""
    lang = {}
    if fst.start < 0 or fst.num_states == 0:
        return lang
    stack = [(fst.start, (), (), 0.0)]
    n = 0
    while stack:
        s, ist, ost, c = stack.pop()
        n += 1
        assert n < max_paths, "path explosion (graph not small/acyclic?)"
        f = fst.final(s)
        if f != float("inf"):
            key = (ist, ost)
            tot = c + f
            if tot < lang.get(key, float("inf")):
                lang[key] = tot
        for arc in fst.arcs(s):
            ni = ist + ((arc.ilabel,) if arc.ilabel != EPSILON else ())
            no = ost + ((arc.olabel,) if arc.olabel != EPSILON else ())
            stack.append((arc.nextstate, ni, no, c + arc.weight))
    return lang


def join_languages(la, lb):
    """Min-cost tropical join of A-paths and B-paths on the shared string."""
    out = {}
    for (xa, ya), ca in la.items():
        for (yb, zb), cb in lb.items():
            if ya != yb:
                continue
            key = (xa, zb)
            tot = ca + cb
            if tot < out.get(key, float("inf")):
                out[key] = tot
    return out


def random_acyclic_transducer(rng, n_states, n_labels, eps_prob=0.25):
    """Random acyclic transducer; arcs only go to higher-numbered states."""
    fst = StdVectorFst()
    fst.add_states(n_states)
    fst.set_start(0)
    for s in range(n_states - 1):
        for _ in range(int(rng.integers(1, 4))):
            dst = int(rng.integers(s + 1, n_states))
            il = 0 if rng.random() < eps_prob else int(rng.integers(1, n_labels + 1))
            ol = 0 if rng.random() < eps_prob else int(rng.integers(1, n_labels + 1))
            w = float(np.round(rng.uniform(0, 3), 2))
            fst.add_arc(s, il, ol, w, dst)
        if rng.random() < 0.3:
            fst.set_final(s, float(np.round(rng.uniform(0, 1), 2)))
    fst.set_final(n_states - 1, 0.0)
    return fst


class TestComposeLanguage:
    @pytest.mark.parametrize("seed", range(12))
    def test_matches_bruteforce_join(self, seed):
        rng = np.random.default_rng(seed)
        a = random_acyclic_transducer(rng, 6, 3)
        b = random_acyclic_transducer(rng, 6, 3)
        got = enumerate_language(compose(a, b))
        want = join_languages(enumerate_language(a), enumerate_language(b))
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-4), k

    def test_empty_inputs(self):
        assert compose(StdVectorFst(), StdVectorFst()).num_states == 0


class TestHLGraph:
    def test_ctc_topo_compose_lexicon_decodes_words(self):
        """An HL graph built natively decodes framewise CTC ids to words."""
        from kaldi_decoder_tpu.decodable import DecodableCtc
        from kaldi_decoder_tpu.decoders import OracleSimpleDecoder

        V = 6
        lex = [(100, [1, 2]), (101, [3]), (102, [2, 3, 1])]
        HL = compose(ctc_topo(V), lexicon_fst(lex))
        # Frames spelling: word 100 (tokens 1,2), blank, word 101 (token 3)
        ids = [1, 1, 2, 0, 3, 3]
        T = len(ids)
        logp = np.full((T, V), -10.0, np.float32)
        logp[np.arange(T), ids] = -0.01
        d = OracleSimpleDecoder(HL, beam=20.0)
        d.decode(DecodableCtc(logp))
        words = path_labels(d.get_best_path())
        assert words == [100, 101]

    def test_word_weights_break_ties(self):
        from kaldi_decoder_tpu.decodable import DecodableCtc
        from kaldi_decoder_tpu.decoders import OracleSimpleDecoder

        V = 4
        lex = [(7, [1]), (8, [1])]  # homophones
        HL = compose(
            ctc_topo(V), lexicon_fst(lex, word_weights=[2.0, 0.5])
        )
        logp = np.full((2, V), -5.0, np.float32)
        logp[:, 1] = -0.01
        d = OracleSimpleDecoder(HL, beam=20.0)
        d.decode(DecodableCtc(logp))
        assert path_labels(d.get_best_path()) == [8]
