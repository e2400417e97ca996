from kaldi_decoder_tpu.decoders.ref_simple import OracleSimpleDecoder
from kaldi_decoder_tpu.decoders.frontier import FrontierConfig, config_for_graph
from kaldi_decoder_tpu.decoders.viterbi import BatchedViterbiDecoder, ViterbiResult
from kaldi_decoder_tpu.decoders.api import (
    FasterDecoder,
    FasterDecoderOptions,
    SimpleDecoder,
)

__all__ = [
    "OracleSimpleDecoder",
    "FrontierConfig",
    "config_for_graph",
    "BatchedViterbiDecoder",
    "ViterbiResult",
    "FasterDecoder",
    "FasterDecoderOptions",
    "SimpleDecoder",
]
