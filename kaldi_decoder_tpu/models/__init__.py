from kaldi_decoder_tpu.models.ctc import (
    CtcEncoderConfig,
    forward,
    init_params,
    make_forward_fn,
)

__all__ = ["CtcEncoderConfig", "forward", "init_params", "make_forward_fn"]
