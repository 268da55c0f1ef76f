"""k-TRUSS edge decomposition (fixed-round support peel).

Not in the reference repo (its cohesion notions are community-level);
the truss is the standard edge-cohesion filter for web/link graphs
(Cohen 2008): iteratively remove edges supported by fewer than k−2
triangles within the surviving edge set.

Shape per round: ONE ``map_batches`` over the original CSR blocks —
each task filters its adjacency to the broadcast live-edge set,
enumerates lowest-vertex-ordered wedges (the same vectorized
triangular decode the triangle counter uses), probes the third edge by
``searchsorted``, and emits per-edge support partials pre-combined by
``np.unique``; the driver sums ≤ blocks small tables and shrinks the
live set (the triangles module's dense-gather posture).  The live set
is an E/2-key broadcast — the same fits-in-driver-memory posture as
the triangles broadcast probe, with the bucketed exchange
(`triangles.py:_triangle_count_bucketed`) as the documented
beyond-memory analog.  Mirrored round-for-round by the unrolled SQL
chain in ``__ray_entry__._truss_chain_sql``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import iter_block_views


def _canonical_edge_keys(g) -> np.ndarray:
    parts = []
    for batch in g.blocks.iter_batches(batch_size=4, batch_format="pyarrow"):
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            keep = src < bv.indices
            parts.append(src[keep] * np.int64(g.n) + bv.indices[keep])
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)


def _in_sorted(sorted_keys: np.ndarray, keys: np.ndarray) -> np.ndarray:
    if not len(sorted_keys):
        return np.zeros(len(keys), bool)
    pos = np.searchsorted(sorted_keys, keys)
    pos = np.minimum(pos, len(sorted_keys) - 1)
    return sorted_keys[pos] == keys


def ktruss_edges(g, k: int = 3, rounds: int = 6) -> pa.Table:
    """(a, b, in_truss) over the canonical undirected edges, sorted:
    in_truss = 1 iff the edge survives ``rounds`` peel iterations at
    support ≥ k−2.  Early-stops when a round removes nothing (a
    converged set is a fixed point, so the result equals the full
    fixed-round chain the SQL oracle unrolls)."""
    import ray
    from hedonic_ray.algos.triangles import _ordered_pairs

    if g.directed:
        raise ValueError("ktruss_edges needs an undirected graph")
    n = np.int64(g.n)
    all_edges = _canonical_edge_keys(g)
    live = all_edges
    if k <= 2:
        # support >= k-2 <= 0 holds for EVERY edge (including edges in
        # no triangle, which never appear in the support table) — the
        # 2-truss is the whole edge set, no peeling
        return pa.table({"a": pa.array(all_edges // n, pa.int64()),
                         "b": pa.array(all_edges % n, pa.int64()),
                         "in_truss": pa.array(
                             np.ones(len(all_edges), np.int64))})

    for _ in range(rounds):
        if not len(live):
            break
        live_ref = ray.put(live)

        def support(batch: pa.Table) -> pa.Table:
            lv = ray.get(live_ref)
            out_k: list[np.ndarray] = []
            for bv in iter_block_views(batch):
                src = bv.src_per_edge()
                dst = bv.indices
                keep = (src < dst) & _in_sorted(lv, src * n + dst)
                src_k, dst_k = src[keep], dst[keep]
                nv = bv.hi - bv.lo
                cnt = np.bincount(src_k - bv.lo, minlength=nv)
                indptr = np.zeros(nv + 1, dtype=np.int64)
                np.cumsum(cnt, out=indptr[1:])
                order = np.lexsort((dst_k, src_k))
                srt = dst_k[order]
                u, a, b = _ordered_pairs(indptr, srt, 0, nv)
                if not len(a):
                    continue
                u = u + bv.lo
                hit = _in_sorted(lv, a * n + b)
                u, a, b = u[hit], a[hit], b[hit]
                if len(a):
                    out_k.append(np.concatenate(
                        [u * n + a, u * n + b, a * n + b]))
            if not out_k:
                return pa.table({"key": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            uk, uc = np.unique(np.concatenate(out_k), return_counts=True)
            return pa.table({"key": pa.array(uk, pa.int64()),
                             "cnt": pa.array(uc.astype(np.int64))})

        parts = g.blocks.map_batches(support, batch_format="pyarrow",
                                     batch_size=4).take_all()
        if parts:
            keys = np.array([r["key"] for r in parts], np.int64)
            cnts = np.array([r["cnt"] for r in parts], np.int64)
            uk, inv = np.unique(keys, return_inverse=True)
            sup = np.zeros(len(uk), np.int64)
            np.add.at(sup, inv, cnts)
            new_live = uk[sup >= k - 2]
        else:
            new_live = np.empty(0, np.int64)
        if len(new_live) == len(live):
            break  # fixed point: further rounds are no-ops
        live = new_live

    flag = _in_sorted(live, all_edges).astype(np.int64)
    return pa.table({"a": pa.array(all_edges // n, pa.int64()),
                     "b": pa.array(all_edges % n, pa.int64()),
                     "in_truss": pa.array(flag)})
