from kaldi_decoder_tpu.ops.segment import Expansion, Selection, dedup_select, expand
from kaldi_decoder_tpu.ops.cutoff import Cutoff, get_cutoff

__all__ = [
    "Expansion",
    "Selection",
    "dedup_select",
    "expand",
    "Cutoff",
    "get_cutoff",
]
