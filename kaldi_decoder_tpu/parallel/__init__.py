from kaldi_decoder_tpu.parallel.mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    pad_batch,
    replicated,
)

__all__ = [
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "pad_batch",
    "replicated",
]
