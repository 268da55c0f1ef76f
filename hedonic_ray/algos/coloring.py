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

SHARDS_MIN_VERTICES = 200_000  # same switch point as PageRank/LP/Katz


def _pick_free_colors(rm: np.ndarray) -> np.ndarray:
    """Lowest unset bit per int64 neighbor-color mask, vectorized over
    the Δ+1-bounded color range; raises past 63 (shared by both
    backends so the pick loop is bit-identical by construction)."""
    free = np.zeros(len(rm), dtype=np.int64)
    for c in range(63):
        hit = (rm >> c) & 1
        undecided_free = free == 0
        pick = undecided_free & (hit == 0)
        free[pick] = c + 1  # store c+1, 0 means "not yet found"
        if (free > 0).all():
            break
    assert (free > 0).all(), "color range exhausted (raise bitmask cap)"
    return free - 1


class _ColorVecSpec:
    """Vector-superstep spec (`engine/shards.py:VectorShardPool`):
    color/decided slices resident in the shard actors, ONE superstep
    per Jones–Plassmann round.  Each edge message is a (kind, value)
    int64 row — kind 0 = an UNCOLORED source's priority (the
    destination counts incoming priorities below its own → ``blocked``;
    the compare needs the destination's priority, so these rows cannot
    pre-combine), kind 1 = a colored source's color bit (pre-OR'd per
    destination inside the source shard).  Merge folds both, picks
    the ready vertices' lowest free colors, reports ``active`` =
    local ready count (global 0 ⇔ the Dataset ``ready.any()`` break;
    the max-priority uncolored vertex is always ready, so 0 also
    covers the all-colored exit).  Bit-identical to the Dataset
    backend (tested)."""

    def init_slice(self, lo, hi, n):
        from hedonic_ray.ops.dedup import md5_low64

        p = np.fromiter((md5_low64(str(v)) for v in range(lo, hi)),
                        dtype=np.uint64, count=hi - lo)
        return {"p": (p ^ np.uint64(1 << 63)).view(np.int64),
                "color": np.full(hi - lo, UNCOLORED, np.int64),
                "decided": np.zeros(hi - lo, np.int64)}

    def scatter(self, state, lo, hi, indptr, indices, src):
        color = state["color"][src - lo]
        unc = color == UNCOLORED
        parts_d, parts_v = [], []
        if unc.any():
            parts_d.append(indices[unc])
            pv = state["p"][src[unc] - lo]
            parts_v.append(np.stack([np.zeros(len(pv), np.int64), pv],
                                    axis=1))
        col = ~unc
        if col.any():
            t_ = indices[col]
            bits = np.int64(1) << color[col]
            u = np.unique(t_)
            acc = np.zeros(len(u), np.int64)
            np.bitwise_or.at(acc, np.searchsorted(u, t_), bits)
            parts_d.append(u.astype(np.int64))
            parts_v.append(np.stack([np.ones(len(u), np.int64), acc],
                                    axis=1))
        if not parts_d:
            return np.empty(0, np.int64), np.empty((0, 2), np.int64)
        dst = np.concatenate(parts_d)
        val = np.concatenate(parts_v)
        order = np.argsort(dst, kind="stable")
        return dst[order], val[order]

    def merge(self, state, lo, hi, n, incoming, rnd):
        p, color = state["p"], state["color"]
        blocked = np.zeros(hi - lo, np.int64)
        mask = np.zeros(hi - lo, np.int64)
        for dst, val in incoming:
            if len(dst):
                d = dst - lo
                pr = val[:, 0] == 0
                if pr.any():
                    dp = d[pr]
                    np.add.at(blocked, dp,
                              (val[pr, 1] < p[dp]).astype(np.int64))
                if (~pr).any():
                    np.bitwise_or.at(mask, d[~pr], val[~pr, 1])
        ready = (color == UNCOLORED) & (blocked == 0)
        if ready.any():
            color[ready] = _pick_free_colors(mask[ready])
            state["decided"][ready] = rnd + 1
        return {"active": int(ready.sum())}


def jones_plassmann_coloring(g, *, rounds: int = 16, backend: str = "auto"):
    """Run ``rounds`` JP rounds; returns int64 arrays
    ``(color, decided_round)`` — color ≥ 0 (or −1 if still uncolored
    at the cap), decided_round 1-based (0 if uncolored).

    ``backend="auto"`` picks the resident-shard-state path
    (`engine/shards.py:VectorShardPool`, one superstep per round)
    above ``SHARDS_MIN_VERTICES`` or under ``HEDONIC_RAY_FORCE_SCALE``,
    else the Dataset scan loop; both are bit-identical (tested)."""
    import ray

    from hedonic_ray.algos.mis import _priorities

    if g.directed:
        raise ValueError("coloring needs an undirected LinkGraph")
    n = g.n
    if backend == "auto":
        from hedonic_ray.context import force_scale

        backend = "shards" if (force_scale() or
                               n >= SHARDS_MIN_VERTICES) else "dataset"
    if backend == "shards":
        from hedonic_ray.engine.shards import run_vector_supersteps

        pool = run_vector_supersteps(g, _ColorVecSpec(), rounds=rounds)
        return pool.collect("color"), pool.collect("decided")
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
        color[ready] = _pick_free_colors(mask[ready])
        decided[ready] = rnd
    return color, decided
