from kaldi_decoder_tpu.ops.segment import (
    LaneMap,
    Selection,
    dedup_select,
    map_lanes,
    score_lookup,
)
from kaldi_decoder_tpu.ops.cutoff import Cutoff, get_cutoff

__all__ = [
    "LaneMap",
    "Selection",
    "dedup_select",
    "map_lanes",
    "score_lookup",
    "Cutoff",
    "get_cutoff",
]
