"""Device token-frontier machinery: the per-frame decoding step.

This is the TPU-native core of the framework.  The reference's per-frame
work — ``ProcessEmitting`` over a hash-indexed token list
(`kaldi-decoder/csrc/faster-decoder.cc:155-241`) followed by a
``ProcessNonemitting`` epsilon worklist (`faster-decoder.cc:59-119`) —
becomes a fixed-shape array program:

1. cutoff/adaptive-beam from the (cost-sorted) frontier
   (:mod:`kaldi_decoder_tpu.ops.cutoff`, GetCutoff parity);
2. arc-parallel emitting expansion over the emitting CSR with the acoustic
   gather ``-scores[t, score_idx]`` fused in (the reference's per-arc
   virtual ``LogLikelihood`` call, `faster-decoder.cc:209`);
3. post-hoc beam prune at ``best_new + adaptive_beam``.  The C++ evolves
   ``next_weight_cutoff`` token-by-token (`faster-decoder.cc:192-230`), an
   order-dependent *upper bound* of this value; pruning at the final bound
   is tighter but provably never drops a token the reference's final
   cutoff would keep, so best-path results agree;
4. scatter-min dedup by destination state + top-K frontier selection
   (replaces ``HashList::Insert`` collisions and implicitly bounds the
   frontier like ``max_active``);
5. bounded epsilon-closure iteration over the epsilon CSR (the worklist's
   fixed point; iteration count = precomputed eps depth, with early-out).

Costs are kept *relative* to a carried per-utterance base (the per-frame
minimum is subtracted and accumulated), so float32 stays precise for
arbitrarily long utterances — the reference needs double accumulators
instead (`faster-decoder.h:119`); the same idea is hinted at in
`lattice-faster-decoder.h:174-175`.

Everything here is single-utterance; batching is ``vmap`` outside.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from kaldi_decoder_tpu.fst.csr import CsrGraph, GraphArrays
from kaldi_decoder_tpu.ops.cutoff import get_cutoff
from kaldi_decoder_tpu.ops.segment import dedup_select, expand

INF = jnp.inf

# Backpointer arc-id sentinel: "no arc, token carried over" (identity).
NO_ARC = -1


@dataclasses.dataclass(frozen=True)
class FrontierConfig:
    """Static (shape-determining) decode parameters.

    ``beam``/``max_active``/``min_active``/``beam_delta`` carry the exact
    reference semantics (`faster-decoder.h:24-63`); the rest are TPU shape
    capacities with no reference analogue (the C++ grows its hash instead,
    `faster-decoder.cc:338-345`).
    """

    beam: float = 16.0
    max_active: int = 2**31 - 1
    min_active: int = 20
    beam_delta: float = 0.5
    # Frontier capacity K: max unique states tracked per frame.
    frontier_size: int = 2048
    # Flat arc-lane budget for emitting expansion (per frame).
    arc_budget: int = 16384
    # Flat arc-lane budget for one epsilon-closure iteration.
    eps_budget: int = 8192
    # Epsilon-closure iterations per frame (graph eps depth if known).
    eps_iters: int = 0

    def validate(self) -> None:
        if self.beam <= 0:
            raise ValueError("beam must be > 0")
        if self.max_active <= 1:
            raise ValueError("max_active must be > 1")  # faster-decoder.cc:27
        if not (0 <= self.min_active < self.max_active):
            raise ValueError("need 0 <= min_active < max_active")
        if self.frontier_size < 1 or self.arc_budget < 1:
            raise ValueError("frontier_size and arc_budget must be >= 1")


def _next_pow2(x: int) -> int:
    return 1 << max(3, (x - 1).bit_length())


def config_for_graph(graph: CsrGraph, base: Optional[FrontierConfig] = None, **kw):
    """Derive a FrontierConfig with capacities sized for ``graph``.

    Capacities are clamped to what the graph can actually produce (a
    frontier can never exceed the state count; an expansion never exceeds
    the emitting arc count), so small test graphs compile small programs.
    """
    cfg = base or FrontierConfig()
    kw.setdefault("beam", cfg.beam)
    kw.setdefault("max_active", cfg.max_active)
    kw.setdefault("min_active", cfg.min_active)
    kw.setdefault("beam_delta", cfg.beam_delta)

    K = kw.get("frontier_size", cfg.frontier_size)
    K = max(8, min(K, _next_pow2(max(graph.num_states, 2))))
    kw["frontier_size"] = K

    A = kw.get("arc_budget", max(cfg.arc_budget, graph.max_em_out_degree + K))
    A = min(A, max(graph.num_emitting_arcs, 8))
    # Must at least fit the fattest single state or nothing can expand it.
    A = max(8, A, min(graph.max_em_out_degree + 1, graph.num_emitting_arcs or 8))
    kw["arc_budget"] = A

    if graph.num_eps_arcs:
        Ae = kw.get(
            "eps_budget", min(cfg.eps_budget, graph.max_eps_out_degree + K)
        )
        kw["eps_budget"] = max(8, min(Ae, graph.num_eps_arcs))
        depth = graph.eps_depth
        if depth is None:
            depth = 16  # cyclic eps subgraph: bounded fixed-point iterations
        kw.setdefault("eps_iters", depth)
    else:
        kw["eps_budget"] = 1
        kw["eps_iters"] = 0
    out = FrontierConfig(**kw)
    out.validate()
    return out


class StepState(NamedTuple):
    """Carried frontier: states/costs sorted by increasing cost.

    ``costs`` are relative to ``base``; absolute cost = base + costs.
    Empty slots have cost +inf.
    """

    states: jnp.ndarray  # (K,) int32
    costs: jnp.ndarray  # (K,) float32
    base: jnp.ndarray  # () float32


class StepOut(NamedTuple):
    bp_emit: jnp.ndarray  # (K, 2) int32: (prev_slot, emitting arc id)
    bp_eps: jnp.ndarray  # (D, K, 2) int32: per eps iteration
    num_active: jnp.ndarray  # () int32
    best_cost: jnp.ndarray  # () float32, absolute
    cutoff: jnp.ndarray  # () float32, absolute cutoff used for expansion
    overflow: jnp.ndarray  # () bool — any arc budget overflow this frame


def _identity_bp(k: int) -> jnp.ndarray:
    return jnp.stack(
        [jnp.arange(k, dtype=jnp.int32), jnp.full((k,), NO_ARC, jnp.int32)], axis=-1
    )


def start_state(start: int, cfg: FrontierConfig) -> StepState:
    """Frontier containing only the start token at cost 0
    (`faster-decoder.cc:42-56` InitDecoding, before its eps closure)."""
    K = cfg.frontier_size
    states = jnp.zeros((K,), jnp.int32).at[0].set(start)
    costs = jnp.full((K,), INF, jnp.float32).at[0].set(0.0)
    return StepState(states, costs, jnp.float32(0.0))


def eps_iteration(
    st: StepState,
    cutoff_rel: jnp.ndarray,
    ga: GraphArrays,
    cfg: FrontierConfig,
    num_states: int,
) -> Tuple[StepState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One epsilon relaxation: expand eps arcs of every live token, merge
    with the incumbent frontier keeping per-state minima.

    Returns (new_state, bp (K,2), changed, overflowed).  Reference
    semantics (`faster-decoder.cc:59-119`): tokens with cost > cutoff are
    not expanded, new tokens with cost > cutoff are dropped, and an
    incumbent token is only replaced by a strictly cheaper one.
    """
    K = cfg.frontier_size
    active = jnp.isfinite(st.costs) & (st.costs <= cutoff_rel)
    ex = expand(st.states, active, ga.eps_row_ptr, cfg.eps_budget)
    ncost = st.costs[ex.src_slot] + ga.eps_weight[ex.arc_id]
    ncost = jnp.where(ex.valid & (ncost <= cutoff_rel), ncost, INF)
    ndst = ga.eps_next[ex.arc_id]

    # Incumbents first: stable sort makes them win cost ties, so `changed`
    # only fires on strict improvement (matching FindOrAddToken/Insert).
    cand_state = jnp.concatenate([st.states, ndst])
    cand_cost = jnp.concatenate([st.costs, ncost])
    cand_slot = jnp.concatenate(
        [jnp.arange(K, dtype=jnp.int32), ex.src_slot]
    )
    cand_arc = jnp.concatenate(
        [jnp.full((K,), NO_ARC, jnp.int32), ex.arc_id]
    )

    sel = dedup_select(cand_state, cand_cost, K, num_states)
    ok = sel.cand_idx >= 0
    safe_idx = jnp.where(ok, sel.cand_idx, 0)
    bp = jnp.stack(
        [
            jnp.where(ok, cand_slot[safe_idx], 0),
            jnp.where(ok, cand_arc[safe_idx], NO_ARC),
        ],
        axis=-1,
    ).astype(jnp.int32)
    changed = jnp.any(ok & (bp[:, 1] != NO_ARC))
    overflowed = ex.total > cfg.eps_budget
    return StepState(sel.states, sel.costs, st.base), bp, changed, overflowed


def eps_closure(
    st: StepState,
    cutoff_rel,
    ga: GraphArrays,
    cfg: FrontierConfig,
    num_states: int,
) -> Tuple[StepState, jnp.ndarray, jnp.ndarray]:
    """Run up to ``cfg.eps_iters`` epsilon relaxations with early-out.

    Returns (state, bp (D, K, 2), overflowed).  Iterations after
    convergence produce identity backpointers (host backtrace skips them).
    """
    K, D = cfg.frontier_size, cfg.eps_iters
    ident = _identity_bp(K)
    if D == 0:
        return st, jnp.zeros((0, K, 2), jnp.int32), jnp.bool_(False)

    def body(carry, _):
        cur, stop, ovf = carry
        nxt, bp, changed, o = eps_iteration(cur, cutoff_rel, ga, cfg, num_states)
        nxt = jax.tree.map(
            lambda new, old: jnp.where(stop, old, new), nxt, cur
        )
        bp = jnp.where(stop, ident, bp)
        new_stop = stop | ~changed
        return (nxt, new_stop, ovf | (~stop & o)), bp

    (st, _, ovf), bps = jax.lax.scan(
        body, (st, jnp.bool_(False), jnp.bool_(False)), None, length=D
    )
    return st, bps, ovf


def init_closure(
    ga: GraphArrays, start: int, num_states: int, cfg: FrontierConfig
) -> Tuple[StepState, jnp.ndarray]:
    """InitDecoding's unbounded eps closure (`faster-decoder.cc:53`).

    ``ga`` must be device (jnp) arrays.  Returns the initial frontier and
    its (D, K, 2) backpointers.
    """
    st = start_state(start, cfg)
    st, bp, _ = eps_closure(st, jnp.float32(INF), ga, cfg, num_states)
    return st, bp


def frame_step(
    st: StepState,
    scores_t: jnp.ndarray,  # (V,) float32 log-probs for this frame
    frame_active,  # () bool — False once past this utterance's length
    ga: GraphArrays,
    cfg: FrontierConfig,
    num_states: int,
) -> Tuple[StepState, StepOut]:
    """Process one frame: emitting expansion + epsilon closure + rebase."""
    K = cfg.frontier_size

    cut = get_cutoff(
        st.costs,
        cfg.beam,
        cfg.max_active,
        cfg.min_active,
        cfg.beam_delta,
        costs_sorted=True,
    )
    active = jnp.isfinite(st.costs) & (st.costs < cut.cutoff)
    ex = expand(st.states, active, ga.em_row_ptr, cfg.arc_budget)
    w = ga.em_weight[ex.arc_id]
    ac = -scores_t[ga.em_score_idx[ex.arc_id]]
    ncost = st.costs[ex.src_slot] + w + ac
    ncost = jnp.where(ex.valid, ncost, INF)
    ndst = ga.em_next[ex.arc_id]

    best_new = jnp.min(ncost)
    next_cutoff = best_new + cut.adaptive_beam
    ncost = jnp.where(ncost < next_cutoff, ncost, INF)

    sel = dedup_select(ndst, ncost, K, num_states)
    ok = sel.cand_idx >= 0
    safe_idx = jnp.where(ok, sel.cand_idx, 0)
    bp_emit = jnp.stack(
        [
            jnp.where(ok, ex.src_slot[safe_idx], 0),
            jnp.where(ok, ex.arc_id[safe_idx], NO_ARC),
        ],
        axis=-1,
    ).astype(jnp.int32)

    mid = StepState(sel.states, sel.costs, st.base)
    # Epsilon closure under the emitting-stage cutoff
    # (ProcessNonemitting(weight_cutoff), faster-decoder.cc:149-151).
    eps_cut_rel = next_cutoff
    mid, bp_eps, eps_ovf = eps_closure(mid, eps_cut_rel, ga, cfg, num_states)

    # Rebase relative costs so float32 never accumulates frame costs.
    m = mid.costs[0]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    out_state = StepState(mid.states, mid.costs - m_safe, mid.base + m_safe)

    # Inactive frames (t >= length) freeze the frontier with identity bps.
    ident = _identity_bp(K)
    ident_eps = jnp.broadcast_to(ident, (cfg.eps_iters, K, 2))
    final_state = jax.tree.map(
        lambda new, old: jnp.where(frame_active, new, old), out_state, st
    )
    out = StepOut(
        bp_emit=jnp.where(frame_active, bp_emit, ident),
        bp_eps=jnp.where(frame_active, bp_eps, ident_eps),
        num_active=jnp.where(
            frame_active, jnp.sum(jnp.isfinite(mid.costs)), jnp.sum(jnp.isfinite(st.costs))
        ).astype(jnp.int32),
        best_cost=jnp.where(
            frame_active, mid.base + m_safe, st.base + jnp.where(jnp.isfinite(st.costs[0]), st.costs[0], 0.0)
        ),
        cutoff=st.base + cut.cutoff,
        overflow=frame_active & ((ex.total > cfg.arc_budget) | eps_ovf),
    )
    return final_state, out
