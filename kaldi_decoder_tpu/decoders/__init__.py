from kaldi_decoder_tpu.decoders.ref_simple import OracleSimpleDecoder
from kaldi_decoder_tpu.decoders.ref_lattice import OracleLatticeDecoder
from kaldi_decoder_tpu.decoders.frontier import FrontierConfig, config_for_graph
from kaldi_decoder_tpu.decoders.viterbi import BatchedViterbiDecoder, ViterbiResult
from kaldi_decoder_tpu.decoders.api import (
    FasterDecoder,
    FasterDecoderOptions,
    SimpleDecoder,
)
from kaldi_decoder_tpu.decoders.lattice import (
    BatchedLatticeDecoder,
    LatticeFasterDecoder,
    LatticeFasterDecoderConfig,
    LatticeResult,
    LatticeSimpleDecoder,
    LatticeSimpleDecoderConfig,
)

__all__ = [
    "OracleSimpleDecoder",
    "OracleLatticeDecoder",
    "FrontierConfig",
    "config_for_graph",
    "BatchedViterbiDecoder",
    "ViterbiResult",
    "FasterDecoder",
    "FasterDecoderOptions",
    "SimpleDecoder",
    "BatchedLatticeDecoder",
    "LatticeFasterDecoder",
    "LatticeFasterDecoderConfig",
    "LatticeResult",
    "LatticeSimpleDecoder",
    "LatticeSimpleDecoderConfig",
]
