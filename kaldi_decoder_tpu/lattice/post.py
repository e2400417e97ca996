"""Lattice post-processing: n-best, determinization, scaling, rescoring.

Covers the post-decode pipeline the reference delegates to OpenFst/Kaldi
downstream (BASELINE config #4: "Lattice determinization + n-best /
LM-rescoring path extraction"):

* :func:`nbest` — best-first path enumeration over the lattice DAG using
  exact cost-to-go lower bounds (equivalent to ``fst::ShortestPath`` with
  n > 1 in the lattice semiring).
* :func:`determinize_lattice` — keep only the best-scoring path for each
  *word sequence* (the documented meaning of the reference's
  ``determinize_lattice`` flag, `lattice-simple-decoder.h:57-60`), emitted
  as a deterministic prefix-tree word lattice.
* :func:`scale_lattice` — (graph, acoustic) scaling with the conventional
  Kaldi scale matrix [[lm_scale, 0], [0, acoustic_scale]].
* :func:`rescore_lattice_with_lm` — replace/interpolate graph costs with
  an external word-level LM callback (the LM-rescoring hook).

Lattices here are decoder outputs: acyclic, modest size; host numpy/heapq
is the right tool (nothing to gain on TPU).
"""

from __future__ import annotations

import heapq
import itertools
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from kaldi_decoder_tpu.fst.fst import EPSILON, INF, Lattice
from kaldi_decoder_tpu.fst.ops import topological_order

Path = Tuple[Tuple[int, ...], Tuple[int, ...], float, float]
# (ilabels, olabels, graph_cost, ac_cost) — eps labels excluded from tuples


def _beta(lat: Lattice) -> List[float]:
    """Exact cost-to-final per state (DAG backward DP)."""
    order = topological_order(lat)
    if order is None:
        raise ValueError("lattice must be acyclic")
    beta = [INF] * lat.num_states
    for s in reversed(order):
        if lat.is_final(s):
            fw = lat.final(s)
            beta[s] = fw[0] + fw[1]
        for arc in lat.arcs(s):
            c = arc.weight[0] + arc.weight[1] + beta[arc.nextstate]
            if c < beta[s]:
                beta[s] = c
    return beta


def nbest(
    lat: Lattice,
    n: int,
    unique_word_sequences: bool = False,
    max_expansions: int = 1_000_000,
) -> List[Path]:
    """Up to ``n`` cheapest complete paths, cheapest first.

    A* over partial paths with the exact remaining cost as heuristic, so
    paths pop in true cost order.  With ``unique_word_sequences`` paths
    whose (eps-free) olabel sequence was already produced are skipped —
    poor man's determinization.
    """
    if lat.start < 0 or n <= 0:
        return []
    beta = _beta(lat)
    if beta[lat.start] == INF:
        return []
    counter = itertools.count()
    # (priority, tiebreak, state, g_graph, g_ac, ilabels, olabels)
    heap = [(beta[lat.start], next(counter), lat.start, 0.0, 0.0, (), ())]
    out: List[Path] = []
    seen_words = set()
    expansions = 0
    while heap and len(out) < n and expansions < max_expansions:
        prio, _, s, gg, ga, ils, ols = heapq.heappop(heap)
        expansions += 1
        if lat.is_final(s):
            fw = lat.final(s)
            key = ols
            if not unique_word_sequences or key not in seen_words:
                seen_words.add(key)
                out.append((ils, ols, gg + fw[0], ga + fw[1]))
        for arc in lat.arcs(s):
            w = arc.weight
            ng, na = gg + w[0], ga + w[1]
            nb = beta[arc.nextstate]
            if nb == INF:
                continue
            heapq.heappush(
                heap,
                (
                    ng + na + nb,
                    next(counter),
                    arc.nextstate,
                    ng,
                    na,
                    ils + ((arc.ilabel,) if arc.ilabel != EPSILON else ()),
                    ols + ((arc.olabel,) if arc.olabel != EPSILON else ()),
                ),
            )
    return out


def paths_to_fst(paths: Sequence[Path]) -> Lattice:
    """Build a prefix-tree lattice from explicit paths (deterministic in
    olabels; weights pushed to the first divergent arc's tail)."""
    lat = Lattice()
    root = lat.add_state()
    lat.set_start(root)
    # Simple prefix tree on olabel sequences; each path's full weight goes
    # on its final state to keep label-determinism trivial.
    children: Dict[Tuple[int, int], int] = {}
    for ils, ols, g, a in paths:
        cur = root
        for lab in ols:
            key = (cur, lab)
            if key not in children:
                nxt = lat.add_state()
                lat.add_arc(cur, lab, lab, (0.0, 0.0), nxt)
                children[key] = nxt
            cur = children[key]
        # Parallel word sequences that are prefixes of each other share a
        # final state only if identical; set/min the final weight.
        if lat.is_final(cur):
            old = lat.final(cur)
            if old[0] + old[1] <= g + a:
                continue
        lat.set_final(cur, (g, a))
    return lat


def determinize_lattice(
    lat: Lattice, n: int = 100, beam: Optional[float] = None
) -> Lattice:
    """Word-determinized lattice: best alignment/cost per word sequence.

    Implemented by bounded n-best extraction with word-sequence dedup
    (`determinize_lattice` flag semantics, lattice-simple-decoder.h:57-60).
    ``beam`` additionally drops word sequences worse than best + beam.
    """
    paths = nbest(lat, n, unique_word_sequences=True)
    if beam is not None and paths:
        best = min(g + a for _, _, g, a in paths)
        paths = [p for p in paths if p[2] + p[3] <= best + beam]
    return paths_to_fst(paths)


def scale_lattice(
    lat: Lattice, acoustic_scale: float = 1.0, lm_scale: float = 1.0
) -> Lattice:
    """Scale (graph, acoustic) weights (Kaldi's ScaleLattice with the
    diagonal scale matrix [[lm_scale, 0], [0, acoustic_scale]])."""
    out = Lattice()
    out.add_states(lat.num_states)
    for s in range(lat.num_states):
        if lat.is_final(s):
            g, a = lat.final(s)
            out.set_final(s, (g * lm_scale, a * acoustic_scale))
        for arc in lat.arcs(s):
            g, a = arc.weight
            out.add_arc(
                s, arc.ilabel, arc.olabel,
                (g * lm_scale, a * acoustic_scale), arc.nextstate,
            )
    if lat.start >= 0:
        out.set_start(lat.start)
    return out


def rescore_lattice_with_lm(
    lat: Lattice,
    lm_cost_fn: Callable[[Tuple[int, ...], int], float],
    lm_scale: float = 1.0,
    old_lm_scale: float = 0.0,
) -> Lattice:
    """LM rescoring hook: add ``lm_scale * lm_cost_fn(history, word)`` to
    each word arc's graph cost (optionally keeping ``old_lm_scale`` of the
    original graph cost on word arcs).

    ``lm_cost_fn(history_words, word) -> cost`` is any callable — e.g. an
    n-gram lookup or a neural LM scored on host.  States are visited with
    their lattice-topological word history; because a lattice state can be
    reached with different histories, states are split per history
    (standard lattice-rescoring expansion).
    """
    if lat.start < 0:
        return Lattice()
    out = Lattice()
    # (state, history) -> new state id; BFS expansion.
    idx: Dict[Tuple[int, Tuple[int, ...]], int] = {}

    def get(state: int, hist: Tuple[int, ...]) -> int:
        key = (state, hist)
        if key not in idx:
            idx[key] = out.add_state()
            if lat.is_final(state):
                out.set_final(idx[key], lat.final(state))
        return idx[key]

    start = get(lat.start, ())
    out.set_start(start)
    stack = [(lat.start, ())]
    visited = set()
    while stack:
        state, hist = stack.pop()
        if (state, hist) in visited:
            continue
        visited.add((state, hist))
        src = get(state, hist)
        for arc in lat.arcs(state):
            g, a = arc.weight
            if arc.olabel != EPSILON:
                lm_cost = lm_cost_fn(hist, arc.olabel)
                g = old_lm_scale * g + lm_scale * lm_cost
                nhist = hist + (arc.olabel,)
            else:
                nhist = hist
            dst = get(arc.nextstate, nhist)
            out.add_arc(src, arc.ilabel, arc.olabel, (g, a), dst)
            if (arc.nextstate, nhist) not in visited:
                stack.append((arc.nextstate, nhist))
    return out
