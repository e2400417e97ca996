from kaldi_decoder_tpu.decodable.decodable import (
    DecodableCtc,
    DecodableInterface,
    DecodableMatrix,
    scores_from_decodable,
)

__all__ = [
    "DecodableCtc",
    "DecodableInterface",
    "DecodableMatrix",
    "scores_from_decodable",
]
