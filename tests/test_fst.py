"""Tests for the host FST layer: objects, IO, topologies, CSR compile."""

import io

import numpy as np
import pytest

from kaldi_decoder_tpu.fst import (
    EPSILON,
    Lattice,
    StdVectorFst,
    compile_fst,
    connect,
    ctc_topo,
    fst_from_text,
    fst_to_text,
    linear_acceptor,
    path_labels,
    path_total_cost,
    random_fst,
    read_fst,
    remove_eps_local,
    shortest_path,
    topological_order,
    write_fst,
)


def small_fst():
    f = StdVectorFst()
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, 1, 10, 0.5, s1)
    f.add_arc(s0, 2, 20, 1.5, s2)
    f.add_arc(s1, EPSILON, 0, 0.25, s2)
    f.set_final(s2, 0.75)
    return f


class TestVectorFst:
    def test_basic(self):
        f = small_fst()
        assert f.num_states == 3
        assert f.total_num_arcs == 3
        assert f.start == 0
        assert f.is_final(2) and not f.is_final(0)
        assert f.final(2) == 0.75
        assert f.num_input_epsilons(1) == 1
        assert f.num_input_epsilons(0) == 0
        arcs = list(f.arcs(0))
        assert [(a.ilabel, a.olabel, a.nextstate) for a in arcs] == [
            (1, 10, 1),
            (2, 20, 2),
        ]

    def test_arrays_roundtrip(self):
        f = random_fst(30, 4, np.random.default_rng(1))
        arr = f.to_arrays()
        f2 = StdVectorFst.from_arrays(
            arr["row_ptr"], arr["ilabel"], arr["olabel"], arr["weight"],
            arr["nextstate"], arr["final"], arr["start"],
        )
        assert f == f2

    def test_lattice_weights(self):
        lat = Lattice()
        s0, s1 = lat.add_state(), lat.add_state()
        lat.set_start(s0)
        lat.add_arc(s0, 1, 1, (2.0, 3.0), s1)
        lat.set_final(s1, (0.5, 0.0))
        arc = next(lat.arcs(s0))
        assert arc.weight == (2.0, 3.0)
        arr = lat.to_arrays()
        assert arr["weight"].shape == (1, 2)
        lat2 = Lattice.from_arrays(
            arr["row_ptr"], arr["ilabel"], arr["olabel"], arr["weight"],
            arr["nextstate"], arr["final"], arr["start"],
        )
        assert lat == lat2


class TestIO:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_binary_roundtrip(self, seed):
        f = random_fst(50, 6, np.random.default_rng(seed))
        buf = io.BytesIO()
        write_fst(f, buf)
        buf.seek(0)
        f2 = read_fst(buf)
        assert f == f2

    def test_binary_roundtrip_lattice(self):
        lat = Lattice()
        s0, s1 = lat.add_state(), lat.add_state()
        lat.set_start(s0)
        lat.add_arc(s0, 3, 7, (1.25, -2.5), s1)
        lat.set_final(s1, (0.0, 0.5))
        buf = io.BytesIO()
        write_fst(lat, buf)
        buf.seek(0)
        lat2 = read_fst(buf)
        assert isinstance(lat2, Lattice)
        assert lat == lat2

    @pytest.mark.parametrize("seed", [0, 3])
    def test_text_roundtrip(self, seed):
        f = random_fst(25, 4, np.random.default_rng(seed))
        assert fst_from_text(fst_to_text(f)) == f

    def test_const_fst_roundtrip(self, tmp_path):
        """text -> vector -> const path: ConstFst binaries must read back
        identically via BOTH the native parser and the Python fallback
        (ref binds ConstFst ctors, python/csrc/simple-decoder.cc:16-21)."""
        from kaldi_decoder_tpu.fst import write_const_fst
        from kaldi_decoder_tpu.fst.io import _read_fst_body

        for seed in (0, 3):
            f = random_fst(17, 6, np.random.default_rng(seed))
            p = tmp_path / f"c{seed}.fst"
            write_const_fst(f, p)
            g = read_fst(p)  # native parser when built
            assert fst_to_text(g) == fst_to_text(f)
            with open(p, "rb") as fh:  # pure-Python parser
                h = _read_fst_body(fh)
            assert fst_to_text(h) == fst_to_text(f)

    def test_const_fst_roundtrip_lattice(self, tmp_path):
        from kaldi_decoder_tpu.fst import write_const_fst
        from kaldi_decoder_tpu.fst.io import _read_fst_body

        lat = Lattice()
        s = [lat.add_state() for _ in range(3)]
        lat.set_start(s[0])
        lat.add_arc(s[0], 1, 2, (0.5, 1.5), s[1])
        lat.add_arc(s[1], 0, 3, (0.25, 0.0), s[2])
        lat.set_final(s[2], (1.0, 2.0))
        p = tmp_path / "lat.fst"
        write_const_fst(lat, p)
        g = read_fst(p)
        assert isinstance(g, Lattice)
        assert fst_to_text(g) == fst_to_text(lat)
        with open(p, "rb") as fh:
            h = _read_fst_body(fh)
        assert fst_to_text(h) == fst_to_text(lat)

    def test_const_fst_aligned_v1(self, tmp_path):
        """File version 1 pads the state/arc arrays to 16-byte alignment
        (openfst MappedFile) — both parsers must skip the padding."""
        import io as _io
        import struct

        from kaldi_decoder_tpu.fst.io import FST_MAGIC, _read_fst_body
        from kaldi_decoder_tpu import native

        f = random_fst(9, 5, np.random.default_rng(1))
        arrays = f.to_arrays()
        row_ptr = np.asarray(arrays["row_ptr"], np.int64)
        S, E = f.num_states, int(row_ptr[-1])
        buf = _io.BytesIO()
        buf.write(struct.pack("<i", FST_MAGIC))
        for sname in (b"const", b"standard"):
            buf.write(struct.pack("<i", len(sname)))
            buf.write(sname)
        buf.write(struct.pack("<iiQqqq", 1, 0, 1, f.start, S, E))

        def pad16():
            buf.write(b"\0" * ((16 - (buf.tell() & 15)) & 15))

        pad16()
        fin = np.asarray(arrays["final"], np.float32)
        narcs = np.diff(row_ptr)
        for s in range(S):
            buf.write(struct.pack("<fIIII", float(fin[s]),
                                  int(row_ptr[s]), int(narcs[s]), 0, 0))
        pad16()
        il, ol = arrays["ilabel"], arrays["olabel"]
        w, ns = arrays["weight"], arrays["nextstate"]
        for a in range(E):
            buf.write(struct.pack("<iifi", int(il[a]), int(ol[a]),
                                  float(w[a]), int(ns[a])))
        p = tmp_path / "v1.fst"
        p.write_bytes(buf.getvalue())
        with open(p, "rb") as fh:
            g = _read_fst_body(fh)
        assert fst_to_text(g) == fst_to_text(f)
        if native.available():
            h = read_fst(p)
            assert fst_to_text(h) == fst_to_text(f)

    def test_text_parse_defaults(self):
        # Arc without weight -> One; final without weight -> One.
        f = fst_from_text("0 1 5 6\n1\n")
        assert f.start == 0
        arc = next(f.arcs(0))
        assert (arc.ilabel, arc.olabel, arc.weight) == (5, 6, 0.0)
        assert f.final(1) == 0.0

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="magic"):
            read_fst(io.BytesIO(b"\x00" * 64))


class TestTopo:
    def test_ctc_topo_standard(self):
        h = ctc_topo(4)
        g = compile_fst(h)
        assert g.num_eps_arcs == 0
        # ilabels are token+1 => score_idx == token id.
        assert g.max_score_idx == 3
        # blank never appears as olabel
        assert all(o == 0 or o in (1, 2, 3) for o in g.arrays.em_olabel)

    def test_ctc_topo_modified_has_eps(self):
        h = ctc_topo(4, modified=True)
        g = compile_fst(h)
        assert g.num_eps_arcs > 0
        assert g.eps_depth == 1

    def test_linear_acceptor(self):
        f = linear_acceptor([3, 1, 2], shift_ilabel=1)
        assert path_labels(shortest_path(f)) == [3, 1, 2]
        assert path_labels(shortest_path(f), side="ilabel") == [4, 2, 3]


class TestOps:
    def test_connect_trims(self):
        f = StdVectorFst()
        s0, s1, s2, s3 = (f.add_state() for _ in range(4))
        f.set_start(s0)
        f.add_arc(s0, 1, 1, 0.0, s1)
        f.add_arc(s0, 2, 2, 0.0, s2)  # s2 is a dead end
        f.add_arc(s3, 1, 1, 0.0, s1)  # s3 unreachable
        f.set_final(s1)
        out = connect(f)
        assert out.num_states == 2
        assert out.total_num_arcs == 1

    def test_topological_order(self):
        f = linear_acceptor([1, 2, 3])
        assert topological_order(f) is not None
        f.add_arc(3, 1, 1, 0.0, 0)  # make a cycle
        assert topological_order(f) is None

    def test_remove_eps_local_chain(self):
        # Linear chain with interleaved (0,0) eps arcs: they must vanish and
        # weights combine (the GetBestPath cleanup, faster-decoder.cc:422).
        lat = Lattice()
        states = [lat.add_state() for _ in range(5)]
        lat.set_start(states[0])
        lat.add_arc(states[0], 0, 0, (0.5, 0.0), states[1])
        lat.add_arc(states[1], 2, 5, (1.0, 2.0), states[2])
        lat.add_arc(states[2], 0, 0, (0.25, 0.0), states[3])
        lat.add_arc(states[3], 3, 6, (1.0, 1.0), states[4])
        lat.set_final(states[4], (0.0, 0.0))
        out = remove_eps_local(lat)
        labels = [(a.ilabel, a.olabel) for s in range(out.num_states) for a in out.arcs(s)]
        assert (0, 0) not in labels
        assert path_labels(out) == [5, 6]
        assert path_total_cost(out) == pytest.approx(0.5 + 3.0 + 0.25 + 2.0)

    def test_remove_eps_keeps_labeled_eps(self):
        # Arcs with olabel != 0 but ilabel == 0 must be preserved.
        lat = Lattice()
        s = [lat.add_state() for _ in range(3)]
        lat.set_start(s[0])
        lat.add_arc(s[0], 0, 9, (0.5, 0.0), s[1])
        lat.add_arc(s[1], 1, 1, (1.0, 0.0), s[2])
        lat.set_final(s[2], (0.0, 0.0))
        out = remove_eps_local(lat)
        assert path_labels(out) == [9, 1]

    def test_shortest_path_dag(self):
        f = StdVectorFst()
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, 1, 1, 5.0, s2)
        f.add_arc(s0, 2, 2, 1.0, s1)
        f.add_arc(s1, 3, 3, 1.0, s2)
        f.set_final(s2, 0.5)
        best = shortest_path(f)
        assert path_labels(best) == [2, 3]
        assert path_total_cost(best) == pytest.approx(2.5)

    def test_shortest_path_cyclic(self):
        f = StdVectorFst()
        s0, s1 = f.add_state(), f.add_state()
        f.set_start(s0)
        f.add_arc(s0, 1, 1, 1.0, s1)
        f.add_arc(s1, 2, 2, 1.0, s0)  # cycle
        f.set_final(s1, 0.0)
        best = shortest_path(f)
        assert path_labels(best) == [1]

    def test_shortest_path_empty(self):
        f = StdVectorFst()
        s0 = f.add_state()
        f.set_start(s0)  # no final state
        assert shortest_path(f).num_states == 0

    def test_lattice_weight_tiebreak_plus(self):
        """LatticeWeight natural order: equal totals -> smaller value1
        (graph cost) wins Plus (fstext/lattice-weight.h Compare, used via
        faster-decoder.h:20)."""
        from kaldi_decoder_tpu.fst.fst import LatticeWeight as LS

        assert LS.plus((1.0, 3.0), (2.0, 2.0)) == (1.0, 3.0)
        assert LS.plus((2.0, 2.0), (1.0, 3.0)) == (1.0, 3.0)
        # Full tie: first argument wins (Compare == 0 -> w1).
        assert LS.plus((2.0, 2.0), (2.0, 2.0)) == (2.0, 2.0)
        # Different totals: total rules regardless of components.
        assert LS.plus((0.0, 5.0), (4.0, 0.0)) == (4.0, 0.0)

    @pytest.mark.parametrize("native_on", [True, False])
    def test_shortest_path_lattice_tiebreak(self, native_on, monkeypatch):
        """Two paths with identical total cost: the one with the smaller
        graph-cost component must win, in both the native and the pure
        Python shortest path."""
        if not native_on:
            from kaldi_decoder_tpu import native

            monkeypatch.setattr(native, "available", lambda: False)
        lat = Lattice()
        s = [lat.add_state() for _ in range(4)]
        lat.set_start(s[0])
        # Path A (labels 1,2): graph 3.0 + acoustic 1.0 = 4.0 total.
        lat.add_arc(s[0], 1, 1, (2.0, 0.5), s[1])
        lat.add_arc(s[1], 2, 2, (1.0, 0.5), s[3])
        # Path B (labels 3,4): graph 1.0 + acoustic 3.0 = 4.0 total.
        lat.add_arc(s[0], 3, 3, (0.5, 1.5), s[2])
        lat.add_arc(s[2], 4, 4, (0.5, 1.5), s[3])
        lat.set_final(s[3], (0.0, 0.0))
        best = shortest_path(lat)
        assert path_labels(best) == [3, 4]


class TestCsr:
    def test_partition(self):
        f = small_fst()
        g = compile_fst(f)
        assert g.num_states == 3
        assert g.num_emitting_arcs == 2
        assert g.num_eps_arcs == 1
        np.testing.assert_array_equal(g.arrays.em_row_ptr, [0, 2, 2, 2])
        np.testing.assert_array_equal(g.arrays.eps_row_ptr, [0, 0, 1, 1])
        np.testing.assert_array_equal(g.arrays.em_score_idx, [0, 1])
        assert g.arrays.final_cost[2] == pytest.approx(0.75)
        assert g.arrays.final_cost[0] == np.inf

    def test_eps_depth_acyclic(self):
        f = StdVectorFst()
        s = [f.add_state() for _ in range(4)]
        f.set_start(s[0])
        f.add_arc(s[0], 0, 0, 0.1, s[1])
        f.add_arc(s[1], 0, 0, 0.1, s[2])
        f.add_arc(s[2], 0, 0, 0.1, s[3])
        f.add_arc(s[0], 1, 1, 0.1, s[3])
        f.set_final(s[3])
        assert compile_fst(f).eps_depth == 3

    def test_eps_depth_cyclic(self):
        f = StdVectorFst()
        s0, s1 = f.add_state(), f.add_state()
        f.set_start(s0)
        f.add_arc(s0, 0, 0, 0.1, s1)
        f.add_arc(s1, 0, 0, 0.1, s0)
        f.add_arc(s0, 1, 1, 0.0, s1)
        f.set_final(s1)
        assert compile_fst(f).eps_depth is None

    def test_random_fst_eps_depth_bounded(self):
        g = compile_fst(random_fst(60, 8, np.random.default_rng(7)))
        assert g.eps_depth is not None  # acyclic_eps construction
