"""Per-edge neighborhood similarity (common neighbors / Jaccard).

Link-prediction primitive over the undirected CSR graph: for every
canonical edge (a < b),

    common(a,b) = |N(a) ∩ N(b)|        (= triangles through the edge)
    jaccard(a,b) = common / (deg(a) + deg(b) − common)

Not in the reference repo (its similarity notions are community-level);
this is the standard first-order link-prediction / graph-cleaning
signal on hyperlink graphs.

Shape: the SAME ordered-wedge enumeration as `algos/triangles.py`
(orientation by (degree, id) rank caps hub wedge fan-out at ≈O(√E));
each confirmed triangle {u,a,b} credits its THREE canonical edge keys
(min·n+max packed int64), per-task partials are pre-combined with
``np.unique`` (the combiner), and one ``groupby().aggregate(Sum)``
shuffle merges them — O(distinct edges) rows, never raw wedges.  The
final Jaccard is a vectorized ``searchsorted`` join of the count table
against the canonical edge list with broadcast degrees.  The
beyond-driver-memory analog is the bucketed probe of
`triangles.py:_triangle_count_bucketed` (same key routing, counts
keyed by edge instead of corner); the broadcast probe here carries the
same `PROBE_BROADCAST_MAX` posture.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.algos.triangles import _oriented_segments, _ordered_pairs
from hedonic_ray.engine.superstep import gather_kv_shuffle, iter_block_views

_PAIR_CHUNK = 8_000_000


def _edge_wedges_batch(batch: pa.Table, keys_ref, rankkey_ref,
                       n_: int) -> pa.Table:
    """Undirected CSR block → (edge_key, partial common-neighbor count)
    rows; each confirmed triangle credits its three canonical edges."""
    import ray

    keys = ray.get(keys_ref)  # sorted oriented-edge keys u*n+v
    rankkey = ray.get(rankkey_ref)
    n = np.int64(n_)
    parts: list[np.ndarray] = []
    for bv in iter_block_views(batch):
        indptr, srt = _oriented_segments(bv, rankkey)
        nv = bv.hi - bv.lo
        cnt = np.diff(indptr)
        lo_u = 0
        while lo_u < nv:
            hi_u = lo_u
            pairs = 0
            while hi_u < nv and (pairs == 0 or pairs < _PAIR_CHUNK):
                pairs += int(cnt[hi_u] * (cnt[hi_u] - 1) // 2)
                hi_u += 1
            u_local, a, b = _ordered_pairs(indptr, srt, lo_u, hi_u)
            if len(u_local):
                q = a * n + b
                order = np.argsort(q)
                qs = q[order]
                pos = np.searchsorted(keys, qs)
                ok = pos < len(keys)
                hit = order[np.flatnonzero(
                    ok & (keys[np.where(ok, pos, 0)] == qs))]
                if len(hit):
                    u = u_local[hit] + bv.lo
                    ah, bh = a[hit], b[hit]
                    for x, y in ((u, ah), (u, bh), (ah, bh)):
                        parts.append(np.minimum(x, y) * n + np.maximum(x, y))
            lo_u = hi_u
    if not parts:
        return pa.table({"key": pa.array([], pa.int64()),
                         "val": pa.array([], pa.int64())})
    uk, uc = np.unique(np.concatenate(parts), return_counts=True)
    return pa.table({"key": pa.array(uk, pa.int64()),
                     "val": pa.array(uc.astype(np.int64), pa.int64())})


def edge_jaccard(g) -> pa.Table:
    """(a, b, common, jacc_e9) for every canonical undirected edge
    a < b; ``jacc_e9 = common·1e9 // (deg(a)+deg(b)−common)`` — exact
    integer floor, SQL-reproducible."""
    import ray

    if g.directed:
        raise ValueError("edge_jaccard needs an undirected LinkGraph")
    n = g.n
    assert n < (1 << 31), "edge keys pack two ids into int64"
    rankkey = (g.out_degree.astype(np.int64) * np.int64(n)
               + np.arange(n, dtype=np.int64))
    rk_ref = ray.put(rankkey)

    # one streaming pass: the sorted oriented probe array AND the
    # canonical (min,max) edge list (each undirected edge appears in
    # exactly one block's oriented view)
    probe_chunks: list[tuple[int, np.ndarray]] = []
    canon_chunks: list[np.ndarray] = []
    for batch in g.blocks.iter_batches(batch_size=4, batch_format="pyarrow"):
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            keep = rankkey[bv.indices] > rankkey[src]
            s, d = src[keep], bv.indices[keep]
            probe_chunks.append((bv.lo, s * np.int64(n) + d))
            canon_chunks.append(np.minimum(s, d) * np.int64(n)
                                + np.maximum(s, d))
    probe_chunks.sort(key=lambda t: t[0])
    keys = (np.concatenate([c[1] for c in probe_chunks]) if probe_chunks
            else np.empty(0, np.int64))
    keys_ref = ray.put(keys)
    canon = np.sort(np.concatenate(canon_chunks)) if canon_chunks \
        else np.empty(0, np.int64)

    msgs = g.blocks.map_batches(
        lambda t: _edge_wedges_batch(t, keys_ref, rk_ref, n),
        batch_format="pyarrow", batch_size=1)
    arrs = gather_kv_shuffle(msgs, ["key"], "val", "sum")

    common = np.zeros(len(canon), dtype=np.int64)
    if len(arrs["val"]):
        pos = np.searchsorted(canon, arrs["key"].astype(np.int64))
        common[pos] = arrs["val"].astype(np.int64)
    a = canon // n
    b = canon % n
    deg = g.out_degree.astype(np.int64)
    union = deg[a] + deg[b] - common
    jacc = np.zeros(len(canon), dtype=np.int64)
    nz = union > 0
    jacc[nz] = common[nz] * 1_000_000_000 // union[nz]
    return pa.table({"a": pa.array(a, pa.int64()),
                     "b": pa.array(b, pa.int64()),
                     "common": pa.array(common, pa.int64()),
                     "jacc_e9": pa.array(jacc, pa.int64())})
