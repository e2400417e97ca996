from kaldi_decoder_tpu.decoders.ref_simple import OracleSimpleDecoder

__all__ = ["OracleSimpleDecoder"]
