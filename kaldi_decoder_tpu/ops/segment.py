"""Fixed-shape segmented primitives for frontier expansion and dedup.

These replace the reference's pointer/hash machinery with dense array ops:

* :func:`expand` — arc-parallel expansion of a token frontier over a CSR
  arc table.  The C++ decoders iterate ``ArcIterator`` per token
  (`kaldi-decoder/csrc/faster-decoder.cc:196-237`), which is inherently
  serial and ragged; here every candidate arc gets an independent lane:
  out-degrees → exclusive scan → flat arc index space, with a vectorized
  binary search mapping each arc lane back to its source slot.
* :func:`dedup_select` — scatter-min dedup by destination state plus
  top-K frontier selection.  Replaces ``HashList::Insert``'s
  keep-the-cheaper-token collision rule (`hash-list-inl.h:128-173` as used
  at `faster-decoder.cc:212-228`) with a sort: candidates ordered by
  (state, cost), first-in-segment = per-state minimum, then the K cheapest
  winners form the new frontier.  Ties prefer the earlier candidate, which
  matches the reference's keep-existing-on-tie behavior when the incumbent
  frontier is passed first.

Everything is fixed-shape and jit/vmap-friendly; no data-dependent shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

INF = jnp.inf


class Expansion(NamedTuple):
    src_slot: jnp.ndarray  # (A,) int32 — frontier slot each arc lane came from
    arc_id: jnp.ndarray  # (A,) int32 — index into the CSR arc arrays
    valid: jnp.ndarray  # (A,) bool
    total: jnp.ndarray  # () int32 — true number of candidate arcs (may be > A)


def expand(
    states: jnp.ndarray,  # (K,) int32 frontier states (arbitrary where invalid)
    active: jnp.ndarray,  # (K,) bool — slots to expand
    row_ptr: jnp.ndarray,  # (S+1,) int32 CSR row pointers
    budget: int,  # A — static arc-lane budget
) -> Expansion:
    """Map K frontier slots onto ``budget`` flat arc lanes.

    If the frontier's total out-degree exceeds the budget the tail lanes
    are dropped; callers keep the frontier sorted by cost so the dropped
    arcs belong to the worst tokens (`total` lets callers count overflows).
    """
    K = states.shape[0]
    safe_states = jnp.where(active, states, 0)
    deg = jnp.where(
        active, row_ptr[safe_states + 1] - row_ptr[safe_states], 0
    ).astype(jnp.int32)
    csum = jnp.cumsum(deg)  # inclusive, (K,)
    total = csum[-1]
    j = jnp.arange(budget, dtype=jnp.int32)
    # Owner slot i: csum[i-1] <= j < csum[i].
    src_slot = jnp.searchsorted(csum, j, side="right").astype(jnp.int32)
    src_clip = jnp.minimum(src_slot, K - 1)
    base = csum[src_clip] - deg[src_clip]
    arc_id = row_ptr[safe_states[src_clip]] + (j - base)
    valid = j < total
    return Expansion(
        src_slot=src_clip,
        arc_id=jnp.where(valid, arc_id, 0),
        valid=valid,
        total=total,
    )


class Selection(NamedTuple):
    states: jnp.ndarray  # (K,) int32 — new frontier states (sorted by cost)
    costs: jnp.ndarray  # (K,) float32 — +inf for empty slots
    cand_idx: jnp.ndarray  # (K,) int32 — winning candidate index (into inputs)


def dedup_select(
    cand_state: jnp.ndarray,  # (N,) int32 destination state per candidate
    cand_cost: jnp.ndarray,  # (N,) float32 (+inf == invalid candidate)
    k: int,  # frontier capacity (static)
    num_states: int,  # S — used as the invalid-state sentinel (static)
) -> Selection:
    """Per-state min-cost dedup, then keep the K cheapest states.

    The returned frontier is sorted by increasing cost (empty slots at the
    end with cost +inf); ``cand_idx`` recovers backpointer info for each
    selected slot.  Candidates sharing a state with equal minimal cost
    resolve to the earliest candidate (stable sort), so passing incumbent
    tokens before fresh candidates reproduces the reference's
    keep-existing-on-tie rule (`faster-decoder.cc:219-227`).
    """
    invalid = ~jnp.isfinite(cand_cost)
    skey = jnp.where(invalid, num_states, cand_state)
    # Primary key: state; secondary: cost; ties: original order (lexsort is
    # stable).  After the sort each state's cheapest candidate leads its
    # segment.
    order = jnp.lexsort((cand_cost, skey))
    sstate = skey[order]
    scost = cand_cost[order]
    leader = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sstate[1:] != sstate[:-1]]
    )
    leader &= sstate < num_states
    lcost = jnp.where(leader, scost, INF)
    # K cheapest leaders. top_k on negated costs; -inf (from +inf costs)
    # sorts last as required.
    neg, sel = jax.lax.top_k(-lcost, k)
    costs = -neg
    live = jnp.isfinite(costs)
    return Selection(
        states=jnp.where(live, sstate[sel], 0).astype(jnp.int32),
        costs=costs,
        cand_idx=jnp.where(live, order[sel], -1).astype(jnp.int32),
    )
