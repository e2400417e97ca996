from kaldi_decoder_tpu.utils.math import approx_equal
from kaldi_decoder_tpu.utils.logging import get_logger, DecodeStats

__all__ = ["approx_equal", "get_logger", "DecodeStats"]
