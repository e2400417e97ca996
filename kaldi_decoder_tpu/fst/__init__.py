from kaldi_decoder_tpu.fst.fst import (
    EPSILON,
    NO_STATE,
    Arc,
    Lattice,
    LatticeArc,
    LatticeWeight,
    StdVectorFst,
    TropicalWeight,
    VectorFst,
)
from kaldi_decoder_tpu.fst.io import (
    fst_from_text,
    fst_to_text,
    read_fst,
    read_fst_text,
    write_fst,
    write_fst_text,
)
from kaldi_decoder_tpu.fst.topo import ctc_topo, linear_acceptor, random_fst
from kaldi_decoder_tpu.fst.csr import CsrGraph, GraphArrays, compile_fst
from kaldi_decoder_tpu.fst.ops import (
    connect,
    path_labels,
    path_total_cost,
    remove_eps_local,
    shortest_path,
    topological_order,
)

__all__ = [
    "EPSILON",
    "NO_STATE",
    "Arc",
    "Lattice",
    "LatticeArc",
    "LatticeWeight",
    "StdVectorFst",
    "TropicalWeight",
    "VectorFst",
    "fst_from_text",
    "fst_to_text",
    "read_fst",
    "read_fst_text",
    "write_fst",
    "write_fst_text",
    "ctc_topo",
    "linear_acceptor",
    "random_fst",
    "CsrGraph",
    "GraphArrays",
    "compile_fst",
    "connect",
    "path_labels",
    "path_total_cost",
    "remove_eps_local",
    "shortest_path",
    "topological_order",
]
