"""Fixed-round distributed MAXIMAL MATCHING over the CSR link graph.

Israeli–Itai / Luby-style mutual-proposal rounds with a deterministic
priority (the vertex id): each still-unmatched vertex points at its
minimum-id unmatched neighbor; mutual pairs match and leave the
graph.  Per round, ONE ``map_batches`` pull over the CSR blocks
computes the per-source masked neighbor MIN against the broadcast
unmatched-id vector (`ray.put` once per round) — the same
no-exchange superstep posture as k-core / BFS (`algos/kcore.py`):
blocks own disjoint source ranges, per-block results concatenate
without a shuffle, driver state is two V-sized arrays.

A fixed ``rounds`` makes the result a pure function of
(graph, rounds) that the SQL oracle unrolls round for round; each
round matches at least one edge in every non-isolated remaining
component, and on bounded-degree graphs the expected round count to
maximality is O(log n) (deterministic min-id proposals typically
converge much faster; the gate fixture saturates well inside the
default 8).

The reference has no matching primitive (its pairing logic is
community games over `hedonic/__init__.py`); this extends the
north-rule graph family with the standard symmetry-breaking
primitive used for coarsening/contraction at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import iter_block_views


def masked_neighbor_min(g, vec_ref, sentinel: int) -> np.ndarray:
    """Per-source MIN over neighbors of a broadcast int64 vector —
    one pass over the CSR blocks; sources with no neighbor (or only
    ``sentinel`` neighbors) get ``sentinel``.  The min sibling of
    `algos/kcore.py:masked_neighbor_count` (np.minimum.reduceat with
    the empty-row fixup: reduceat returns the NEXT row's first
    element for an empty segment, so empty rows are overwritten)."""
    import ray

    def f(batch: pa.Table) -> pa.Table:
        a = ray.get(vec_ref)
        lo_out, mn_out = [], []
        for bv in iter_block_views(batch):
            n_rows = len(bv.indptr) - 1
            vals = a[bv.indices]
            if len(vals) == 0:
                mn = np.full(n_rows, sentinel, np.int64)
            else:
                x = np.append(vals, np.int64(sentinel))
                starts = np.minimum(bv.indptr[:-1], len(vals))
                mn = np.minimum.reduceat(x, starts)
                mn[bv.indptr[:-1] == bv.indptr[1:]] = sentinel
            lo_out.append(bv.lo)
            mn_out.append(mn)
        return pa.table({"lo": pa.array(lo_out, pa.int64()),
                         "mn": pa.array([m.tolist() for m in mn_out],
                                        pa.list_(pa.int64()))})

    out = np.full(g.n, sentinel, dtype=np.int64)
    for batch in g.blocks.map_batches(
            f, batch_format="pyarrow").iter_batches(
            batch_size=64, batch_format="pyarrow"):
        los = batch.column("lo").to_pylist()
        for lo, mn in zip(los, batch.column("mn").to_pylist()):
            out[lo:lo + len(mn)] = mn
    return out


SHARDS_MIN_VERTICES = 200_000  # same switch point as PageRank/LP/Katz


class _MatchVecSpec:
    """Vector-superstep spec (`engine/shards.py:VectorShardPool`):
    ONE proposal round = TWO supersteps.  Phase 0: unmatched sources
    push their global id, per-destination min pre-combined per shard;
    merge = the candidate fold (``cand``, matched vertices forced to
    the ``big`` sentinel), ``active`` = local candidates (global 0 ⇔
    the Dataset's empty-``mutual`` break, nothing mutated).  Phase 1:
    every vertex with a candidate sends ONE proposal row (dst = its
    candidate — not necessarily resident messages, the range split
    routes them); merge detects mutuality as ``cand[dst] == val``,
    marks both endpoints matched in their own shards, and the SMALLER
    endpoint's shard records the (a, b, round) pair — the Dataset's
    ``a = mutual[mutual < cand[mutual]]`` row.  The driver lexsorts
    the collected pairs by (round, a), reproducing the Dataset
    ordering bit-for-bit (tested)."""

    def init_slice(self, lo, hi, n):
        return {"matched": np.zeros(hi - lo, bool),
                "cand": np.full(hi - lo, np.int64(n), np.int64),
                "pairs": np.empty((0, 3), np.int64),
                "big": np.int64(n),
                "phase": 0}

    def scatter(self, state, lo, hi, indptr, indices, src):
        empty = np.empty(0, np.int64)
        if state["phase"] == 0:
            live = ~state["matched"][src - lo]
            if not live.any():
                return empty, empty
            t_ = indices[live]
            u = np.unique(t_)
            best = np.full(len(u), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(best, np.searchsorted(u, t_), src[live])
            return u.astype(np.int64), best
        has = state["cand"] < state["big"]
        if not has.any():
            return empty, empty
        dst = state["cand"][has]
        val = lo + np.flatnonzero(has).astype(np.int64)
        order = np.argsort(dst, kind="stable")
        return dst[order], val[order]

    def merge(self, state, lo, hi, n, incoming, rnd):
        big = state["big"]
        if state["phase"] == 0:
            cand = np.full(hi - lo, big, np.int64)
            for dst, val in incoming:
                if len(dst):
                    np.minimum.at(cand, dst - lo, val)
            cand[state["matched"]] = big
            state["cand"] = cand
            state["phase"] = 1
            return {"active": int((cand < big).sum())}
        new_a, new_b = [], []
        for dst, val in incoming:
            if len(dst):
                d = dst - lo
                mut = state["cand"][d] == val
                if mut.any():
                    u = dst[mut]
                    v = val[mut]
                    state["matched"][d[mut]] = True
                    rec = u < v
                    if rec.any():
                        new_a.append(u[rec])
                        new_b.append(v[rec])
        state["phase"] = 0
        if not new_a:
            return {"active": 0}
        a = np.concatenate(new_a)
        b = np.concatenate(new_b)
        r = np.full(len(a), rnd // 2 + 1, np.int64)
        state["pairs"] = np.concatenate(
            [state["pairs"], np.stack([a, b, r], axis=1)])
        return {"active": len(a)}


def maximal_matching(g, *, rounds: int = 8, backend: str = "auto"):
    """Run ``rounds`` mutual-min-id proposal rounds; returns int64
    arrays ``(a, b, rnd)`` — matched pairs with a < b and the 1-based
    round that matched them, ordered by (rnd, a).

    ``backend="auto"`` picks the resident-shard-state path
    (`engine/shards.py:VectorShardPool`, two supersteps per round)
    above ``SHARDS_MIN_VERTICES`` or under ``HEDONIC_RAY_FORCE_SCALE``,
    else the Dataset pull loop; both are bit-identical (tested)."""
    import ray

    if g.directed:
        raise ValueError("maximal_matching needs an undirected LinkGraph")
    n = g.n
    if backend == "auto":
        from hedonic_ray.context import force_scale

        backend = "shards" if (force_scale() or
                               n >= SHARDS_MIN_VERTICES) else "dataset"
    if backend == "shards":
        from hedonic_ray.engine.shards import run_vector_supersteps

        pool = run_vector_supersteps(g, _MatchVecSpec(), rounds=2 * rounds)
        pairs = pool.collect("pairs")
        if pairs.shape[0] == 0:
            z = np.empty(0, np.int64)
            return z, z, z
        order = np.lexsort((pairs[:, 0], pairs[:, 2]))
        pairs = pairs[order]
        return pairs[:, 0].copy(), pairs[:, 1].copy(), pairs[:, 2].copy()
    big = np.int64(n)
    ids = np.arange(n, dtype=np.int64)
    unmatched = np.ones(n, dtype=bool)
    out_a, out_b, out_r = [], [], []
    for rnd in range(1, rounds + 1):
        vec = np.where(unmatched, ids, big)
        cand = masked_neighbor_min(g, ray.put(vec), int(big))
        cand[~unmatched] = big
        idx = np.flatnonzero(cand < big)
        mutual = idx[cand[cand[idx]] == idx]
        a = mutual[mutual < cand[mutual]]
        if len(a) == 0:
            break
        b = cand[a]
        unmatched[a] = False
        unmatched[b] = False
        out_a.append(a)
        out_b.append(b)
        out_r.append(np.full(len(a), rnd, np.int64))
    if not out_a:
        z = np.empty(0, np.int64)
        return z, z, z
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_r))
