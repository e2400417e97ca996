"""Standalone model layer: features -> CTC encoder -> WFST decoder.

The reference has no model layer (icefall/torch provides posteriors behind
``DecodableInterface``, SURVEY §1 L6); ``models/ctc.py`` exists so the
framework runs end-to-end standalone.  These tests pin the contract: the
encoder emits normalized log-softmax posteriors of the right shape under
jit, and they drive the decoder stack through the public API unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_decoder_tpu.decodable import DecodableCtc
from kaldi_decoder_tpu.decoders import FasterDecoder
from kaldi_decoder_tpu.fst import ctc_topo
from kaldi_decoder_tpu.models.ctc import (
    CtcEncoderConfig,
    init_params,
    make_forward_fn,
)


@pytest.fixture(scope="module")
def encoder():
    cfg = CtcEncoderConfig(
        num_features=16, hidden_dim=32, num_layers=2, vocab_size=12,
        subsampling=4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params, make_forward_fn(cfg)


class TestCtcEncoder:
    def test_shapes_and_normalization(self, encoder):
        cfg, params, fwd = encoder
        feats = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 40, cfg.num_features)),
            jnp.float32,
        )
        logp = fwd(params, feats)
        assert logp.shape == (2, 40 // cfg.subsampling, cfg.vocab_size)
        # log-softmax: rows sum to 1 in prob space
        s = jnp.exp(logp).sum(-1)
        np.testing.assert_allclose(np.asarray(s), 1.0, rtol=1e-4)

    def test_encoder_to_decoder_end_to_end(self, encoder):
        """The full standalone pipeline: jitted encoder posteriors feed the
        reference-parity decoder through DecodableCtc unchanged."""
        cfg, params, fwd = encoder
        feats = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 80, cfg.num_features)),
            jnp.float32,
        )
        logp = np.asarray(fwd(params, feats))[0]
        H = ctc_topo(cfg.vocab_size)
        dec = FasterDecoder(H)
        dec.decode(DecodableCtc(logp))
        ok, best = dec.get_best_path()
        assert ok  # untrained weights still yield a valid decode
        assert dec.num_frames_decoded() == logp.shape[0]
