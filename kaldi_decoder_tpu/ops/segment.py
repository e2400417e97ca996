"""Fixed-shape segmented primitives for frontier expansion and dedup.

These replace the reference's pointer/hash machinery with dense array ops
chosen for how XLA actually lowers them on TPU:

* :func:`map_lanes` — map ragged per-slot counts onto a flat lane budget
  (the exclusive-scan + "which slot owns lane j" problem).  A binary
  search per lane (``jnp.searchsorted``) costs ~46ms for 32k lanes on
  v5e; since both the lane ids and the segment starts are sorted, a
  scatter of slot ids at segment starts followed by a running max
  (``associative_scan``) computes the same mapping in O(A + K) vector
  ops.
* :func:`dedup_select` — scatter-min dedup by destination state plus
  top-K frontier selection, replacing ``HashList::Insert``'s
  keep-the-cheaper-token rule (`hash-list-inl.h:128-173` as used at
  `faster-decoder.cc:212-228`): candidates sorted by (state, cost), the
  first of each state segment is its minimum, then the K cheapest
  winners form the new frontier.  Ties prefer the earlier candidate,
  matching the reference's keep-existing-on-tie behavior when incumbents
  are passed first.
* :func:`score_lookup` — acoustic-score gather ``scores[t, idx]``.  An
  element gather from the (V,) row costs ~2.6ms for 32k lanes; a one-hot
  matmul runs on the MXU in <1ms, so that is the default.

Everything is fixed-shape and jit/vmap-friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

INF = jnp.inf


class LaneMap(NamedTuple):
    owner: jnp.ndarray  # (A,) int32 — slot that owns each lane
    within: jnp.ndarray  # (A,) int32 — lane's index within the owner's segment
    valid: jnp.ndarray  # (A,) bool
    total: jnp.ndarray  # () int32 — true number of lanes needed (may be > A)


def map_lanes(counts: jnp.ndarray, budget: int) -> LaneMap:
    """Distribute ``counts[i]`` consecutive lanes per slot over ``budget``
    flat lanes.  Lanes beyond the budget are dropped (callers keep slots
    sorted by cost, so dropped lanes belong to the worst slots)."""
    K = counts.shape[0]
    csum = jnp.cumsum(counts)
    total = csum[-1]
    starts = csum - counts
    slot_ids = jnp.arange(K, dtype=jnp.int32)
    # Scatter each non-empty slot's id at its segment start, then running
    # max fills the segment.  Starts of non-empty slots are strictly
    # increasing, so there are no collisions; drop-mode handles starts
    # beyond the budget.
    owner0 = jnp.zeros(budget, jnp.int32).at[
        jnp.where(counts > 0, starts, budget)
    ].max(slot_ids, mode="drop")
    owner = jax.lax.associative_scan(jnp.maximum, owner0)
    j = jnp.arange(budget, dtype=jnp.int32)
    within = j - (csum[owner] - counts[owner])
    valid = j < total
    return LaneMap(owner=owner, within=within, valid=valid, total=total)


class Selection(NamedTuple):
    states: jnp.ndarray  # (K,) int32 — new frontier states (sorted by cost)
    costs: jnp.ndarray  # (K,) float32 — +inf for empty slots
    cand_idx: jnp.ndarray  # (K,) int32 — winning candidate index (into inputs)
    # True number of distinct in-beam states (may exceed K: the frontier
    # then silently capped the beam at its K cheapest — a capacity
    # semantics divergence from the reference, which has no such limit).
    num_unique: jnp.ndarray  # () int32


class SelectionRec(NamedTuple):
    states: jnp.ndarray
    costs: jnp.ndarray
    cand_idx: jnp.ndarray
    num_unique: jnp.ndarray
    # Record compaction riding the same state-sort: candidate indices of
    # ALL valid candidates, packed to the front (state-grouped order),
    # -1 padded.  The ForwardLink analogue comes for free.
    rec_idx: jnp.ndarray  # (R,) int32
    rec_overflow: jnp.ndarray  # () bool — more valid candidates than R


def _dedup_core(cand_state, cand_cost, k, num_states):
    """Shared core: one state-sort, segmented min, top-k selection.

    Returns (Selection, sorted candidate idx i2, valid-candidate count,
    (s2, c2, leader, cmin, imin) sorted-domain aux arrays).
    One single-key sort + one scan + one ``top_k``: measured faster on TPU
    than two sorts (sort ~1.9ms vs top_k ~1.2ms at N~45k, B=8), and the
    state-sort doubles as record compaction (invalids sort to the end).
    """
    n = cand_state.shape[0]
    invalid = ~jnp.isfinite(cand_cost)
    skey = jnp.where(invalid, num_states, cand_state)
    idx = jnp.arange(n, dtype=jnp.int32)
    # Sort by state only (stable: equal states keep candidate order).
    s2, c2, i2 = jax.lax.sort((skey, cand_cost, idx), num_keys=1)
    leader = jnp.concatenate([jnp.ones((1,), bool), s2[1:] != s2[:-1]])
    # Segmented min over each equal-state run, via an inclusive scan on the
    # reversed array so every run's *first* element ends up holding the
    # run's min.  Ties keep the earliest candidate (matching HashList
    # keep-existing-on-tie when incumbents are passed first,
    # hash-list-inl.h:128-173).
    def op(a, b):
        fa, ca, ia = a
        fb, cb, ib = b
        take_b = fb | (cb <= ca)  # b = earlier original candidate
        return (
            fa | fb,
            jnp.where(take_b, cb, ca),
            jnp.where(take_b, ib, ia),
        )

    last = jnp.concatenate([(s2[:-1] != s2[1:]), jnp.ones((1,), bool)])
    _, cmin_r, imin_r = jax.lax.associative_scan(
        op, (last[::-1], c2[::-1], i2[::-1])
    )
    cmin, imin = cmin_r[::-1], imin_r[::-1]
    lcost = jnp.where(leader & (s2 < num_states), cmin, INF)
    # K cheapest run leaders are the new frontier.  top_k ties keep the
    # lower index, i.e. the earlier state-sorted position — the same
    # tie-break a stable cost-sort gives.
    neg, pos = jax.lax.top_k(-lcost, k)
    costs = -neg
    live = jnp.isfinite(costs)
    sel = Selection(
        states=jnp.where(live, s2[pos], 0).astype(jnp.int32),
        costs=costs,
        cand_idx=jnp.where(live, imin[pos], -1).astype(jnp.int32),
        num_unique=jnp.sum(jnp.isfinite(lcost)).astype(jnp.int32),
    )
    num_valid = (n - jnp.sum(invalid)).astype(jnp.int32)
    return sel, i2, num_valid, (s2, c2, leader, cmin, imin, pos, live)


def dedup_select(
    cand_state: jnp.ndarray,  # (N,) int32 destination state per candidate
    cand_cost: jnp.ndarray,  # (N,) float32 (+inf == invalid candidate)
    k: int,  # frontier capacity (static)
    num_states: int,  # S — used as the invalid-state sentinel (static)
) -> Selection:
    """Per-state min-cost dedup, then keep the K cheapest states.

    The returned frontier is sorted by increasing cost (empty slots at the
    end with cost +inf); ``cand_idx`` recovers backpointer info for each
    selected slot.
    """
    sel, _, _, _ = _dedup_core(cand_state, cand_cost, k, num_states)
    return sel


def dedup_select_rec(
    cand_state: jnp.ndarray,
    cand_cost: jnp.ndarray,
    k: int,
    num_states: int,
    r: int,  # record buffer capacity (static)
    slack_beam: float = INF,  # lattice_beam: links above can never survive
    rec_ok: Optional[jnp.ndarray] = None,  # (N,) candidates eligible as records
) -> SelectionRec:
    """dedup_select + lattice record selection by link slack.

    Records (`lattice-simple-decoder.cc:393-398`) are the frontier
    winners' own candidate indices (every surviving token's BEST incoming
    link — lattice connectivity and the exact best path are never lost to
    record overflow) plus up to ``r - k`` extra links chosen by smallest
    **slack** ``cand_cost - winner_cost(dst)``.  A link's eventual
    extra cost in the backward sweep is ``extra(dst) + slack >= slack``
    (`lattice-simple-decoder.cc:254-296`), so links with
    ``slack > lattice_beam`` are *provably* pruned later and are filtered
    out here for free — the budget holds exactly the links that can still
    matter, and record overflow means actual potential lattice loss, with
    the largest-slack (least likely to survive) links dropped first.

    ``rec_ok`` masks candidates that are not links at all (e.g. incumbent
    frontier tokens passed through an epsilon relaxation).
    """
    sel, i2, num_valid, (s2, c2, leader, cmin, imin, pos, live) = _dedup_core(
        cand_state, cand_cost, k, num_states
    )
    if r <= k:
        rec_idx = sel.cand_idx[:r]
        overflow = num_valid > r
        return SelectionRec(
            states=sel.states,
            costs=sel.costs,
            cand_idx=sel.cand_idx,
            num_unique=sel.num_unique,
            rec_idx=rec_idx,
            rec_overflow=overflow,
        )

    # Broadcast each run's (min cost, argmin, made-the-frontier flag) from
    # its leader over the run (forward segmented fill), giving
    # per-candidate slack, winner id and destination-token liveness.
    n = c2.shape[0]
    sel_leader = jnp.zeros((n,), bool).at[jnp.where(live, pos, n)].set(
        True, mode="drop"
    )

    def fill_op(a, b):
        fa, ca, ia, sa = a
        fb, cb, ib, sb = b
        return (
            fa | fb,
            jnp.where(fb, cb, ca),
            jnp.where(fb, ib, ia),
            jnp.where(fb, sb, sa),
        )

    _, run_min, run_imin, run_sel = jax.lax.associative_scan(
        fill_op,
        (
            leader,
            jnp.where(leader, cmin, 0.0),
            jnp.where(leader, imin, 0),
            sel_leader,
        ),
    )
    slack = c2 - run_min
    extra_ok = (
        jnp.isfinite(c2)
        & (slack <= slack_beam)
        & (i2 != run_imin)  # the winner itself rides in sel.cand_idx
        & run_sel  # links into tokens dropped from the frontier are dead
    )
    if rec_ok is not None:
        extra_ok = extra_ok & rec_ok[i2]
    # Smallest-slack extras first; ties keep state-sorted order.
    key = jnp.where(extra_ok, -slack, -INF)
    _, pos = jax.lax.top_k(key, r - k)
    got = extra_ok[pos]
    fill = jnp.where(got, i2[pos], -1)
    rec_idx = jnp.concatenate([sel.cand_idx, fill]).astype(jnp.int32)
    overflow = jnp.sum(extra_ok) > (r - k)
    return SelectionRec(
        states=sel.states,
        costs=sel.costs,
        cand_idx=sel.cand_idx,
        num_unique=sel.num_unique,
        rec_idx=rec_idx,
        rec_overflow=overflow,
    )


def score_lookup(
    score_idx: jnp.ndarray,  # (A,) int32 in [0, V)
    scores_t: jnp.ndarray,  # (V,) float32 log-probs for this frame
    use_onehot: bool = True,
) -> jnp.ndarray:
    """Acoustic log-prob per lane (the fused DecodableCtc lookup,
    `decodable-ctc.cc:22-29`)."""
    if not use_onehot:
        return scores_t[score_idx]
    V = scores_t.shape[0]
    onehot = jax.nn.one_hot(score_idx, V, dtype=scores_t.dtype)
    return onehot @ scores_t
