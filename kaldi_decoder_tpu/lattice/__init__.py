from kaldi_decoder_tpu.lattice.prune import (
    PrunedLattice,
    prune_lattice,
    raw_lattice_to_fst,
)

__all__ = ["PrunedLattice", "prune_lattice", "raw_lattice_to_fst"]
