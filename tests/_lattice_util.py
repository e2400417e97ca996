"""Shared helpers: canonical link sets from oracle and device lattices."""

import numpy as np


def oracle_link_set(d):
    """Canonical link set {(f_src, state_src, f_dst, state_dst, il, ol,
    g, a)} from an OracleLatticeDecoder's pruned token structure."""
    where = {}
    for f, toks in enumerate(d.active_toks):
        for state, tok in toks.items():
            where[id(tok)] = (f, state)
    links = set()
    for f, toks in enumerate(d.active_toks):
        for state, tok in toks.items():
            for l in tok.links:
                if id(l.next_tok) not in where:
                    continue
                fd, sd = where[id(l.next_tok)]
                links.add(
                    (f, state, fd, sd, l.ilabel, l.olabel,
                     round(float(l.graph_cost), 3), round(float(l.ac_cost), 3))
                )
    return links


def device_link_set(res, b=0):
    """Same canonical link set from a LatticeResult's pruned lattice."""
    pl = res._prune(b)
    assert pl is not None
    links = set()
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
                if not lk.keep[i]:
                    continue
                links.add(
                    (
                        f,
                        int(toks.states[lk.src[i]]),
                        fd,
                        int(dtoks.states[lk.dst[i]]),
                        int(lk.ilabel[i]),
                        int(lk.olabel[i]),
                        round(float(lk.graph_cost[i]), 3),
                        round(float(lk.ac_cost[i]), 3),
                    )
                )
    return links


def records_with_evicted_intermediates(res, fold, b=0):
    """Count device em records whose folded path crosses a state absent
    from the next frame's device frontier (the reconstruction hazard)."""
    ga = fold.orig.arrays
    L = int(res.lengths[b])
    hit = total = 0
    for t in range(L):
        live = np.isfinite(res.frame_costs[t, b])
        fr = set(res.frame_states[t, b][live].tolist())
        recs = res.em_records[t, b]
        for src, fa in recs[recs[:, 1] >= 0][:, :2]:
            path = fold.path_arcs[fold.path_ptr[fa]:fold.path_ptr[fa + 1]]
            states = [int(ga.em_next[path[0]])] + [
                int(ga.eps_next[a]) for a in path[1:]
            ]
            total += 1
            if any(s not in fr for s in states[:-1]):
                hit += 1
    return hit, total
