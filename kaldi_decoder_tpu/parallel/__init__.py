from kaldi_decoder_tpu.parallel.graph_shard import (
    ShardedGraph,
    ShardedViterbiDecoder,
    shard_graph,
)
from kaldi_decoder_tpu.parallel.mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    pad_batch,
    replicated,
)

__all__ = [
    "ShardedGraph",
    "ShardedViterbiDecoder",
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "pad_batch",
    "replicated",
    "shard_graph",
]
