"""Fixed-round distributed GREEDY GRAPH COLORING (Jones–Plassmann)
over the undirected CSR link graph.

Jones–Plassmann with the same deterministic md5 priorities as
`algos/mis.py`: a vertex colors itself in the round where every
STRICTLY-higher-priority (smaller hashed value) neighbor is already
colored, picking the minimum color unused by its colored neighbors —
so adjacent vertices never pick in the same round against each other
and the result is a proper coloring with ≤ Δ+1 colors.  Expected
round count is O(log n / log log n) with hashed priorities (an
id-priority chain would serialize).

Per round, ONE ``map_batches`` scatter over the CSR blocks against
the broadcast (priority, color) vectors computes, per vertex, (a) the
count of still-uncolored higher-priority neighbors and (b) the OR of
its colored neighbors' color bits — the only kernel in the family
whose mask depends on BOTH endpoints, so it is a dedicated scatter
rather than a `masked_neighbor_count` reuse.  V-sized driver state,
no exchange; same posture as k-core / BFS / matching / MIS.

Colors are asserted < 63 so the neighbor-color set fits one int64
bitmask (Δ+1 ≤ 63 covers every bounded-degree web graph after hub
splitting; beyond that the bitmask becomes a per-color pull).  NOTE:
at degree ≥ 63 the engine RAISES while the SQL oracle would emit a
NULL→−1 color — a deliberate fail-loud-vs-fail-soft divergence,
unreachable on any hub-split graph (fixture degrees are {3, 5}).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import iter_block_views

UNCOLORED = -1


def jones_plassmann_coloring(g, *, rounds: int = 16):
    """Run ``rounds`` JP rounds; returns int64 arrays
    ``(color, decided_round)`` — color ≥ 0 (or −1 if still uncolored
    at the cap), decided_round 1-based (0 if uncolored)."""
    import ray

    from hedonic_ray.algos.mis import _priorities

    if g.directed:
        raise ValueError("coloring needs an undirected LinkGraph")
    n = g.n
    p = _priorities(n)
    color = np.full(n, UNCOLORED, dtype=np.int64)
    decided = np.zeros(n, dtype=np.int64)
    p_ref = ray.put(p)   # immutable: broadcast once, not per round

    for rnd in range(1, rounds + 1):
        unc = color == UNCOLORED
        if not unc.any():
            break
        col_ref = ray.put(color)

        def scan(batch: pa.Table) -> pa.Table:
            pp = ray.get(p_ref)
            cc = ray.get(col_ref)
            lo_out, blk_out, msk_out = [], [], []
            for bv in iter_block_views(batch):
                src = bv.src_per_edge()
                tgt = bv.indices
                n_rows = len(bv.indptr) - 1
                blocked = np.zeros(n_rows, np.int64)
                mask = np.zeros(n_rows, np.int64)
                rel = src - bv.lo
                m1 = (cc[tgt] == UNCOLORED) & (pp[tgt] < pp[src])
                if m1.any():
                    np.add.at(blocked, rel[m1], 1)
                m2 = cc[tgt] != UNCOLORED
                if m2.any():
                    np.bitwise_or.at(mask, rel[m2],
                                     np.int64(1) << cc[tgt[m2]])
                lo_out.append(bv.lo)
                blk_out.append(blocked)
                msk_out.append(mask)
            return pa.table({
                "lo": pa.array(lo_out, pa.int64()),
                "blk": pa.array([b.tolist() for b in blk_out],
                                pa.list_(pa.int64())),
                "msk": pa.array([m.tolist() for m in msk_out],
                                pa.list_(pa.int64()))})

        blocked = np.zeros(n, np.int64)
        mask = np.zeros(n, np.int64)
        for b in g.blocks.map_batches(
                scan, batch_format="pyarrow").iter_batches(
                batch_size=64, batch_format="pyarrow"):
            for lo, bl, mk in zip(b.column("lo").to_pylist(),
                                  b.column("blk").to_pylist(),
                                  b.column("msk").to_pylist()):
                blocked[lo:lo + len(bl)] = bl
                mask[lo:lo + len(mk)] = mk
        ready = unc & (blocked == 0)
        if not ready.any():
            break
        free = np.zeros(ready.sum(), dtype=np.int64)
        rm = mask[ready]
        # lowest unset bit, vectorized over a Δ+1-bounded color range
        for c in range(63):
            hit = (rm >> c) & 1
            undecided_free = free == 0
            pick = undecided_free & (hit == 0)
            free[pick] = c + 1  # store c+1, 0 means "not yet found"
            if (free > 0).all():
                break
        assert (free > 0).all(), "color range exhausted (raise bitmask cap)"
        color[ready] = free - 1
        decided[ready] = rnd
    return color, decided
