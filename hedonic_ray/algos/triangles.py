"""Triangle counting via degree-ordered wedge generation.

Not in the reference repo (required by the north rule).  Classic
ordered-wedge algorithm over the engine's CSR blocks — no second graph
build: orientation (rank = (degree, id), the high-degree mitigation
that caps a hub's oriented out-degree ≈ O(√E)) is applied INSIDE each
task by filtering the symmetrized adjacency, so the only passes are

1. **probe build** — one streaming driver pass over the blocks filters
   each vertex's higher-rank neighbors; per-block key arrays are
   already sorted (src ascending, dst sorted per src) and blocks cover
   disjoint src ranges, so the ordered concat IS the sorted probe
   array (no sort anywhere);
2. **wedge pass** — ``map_batches`` over the same blocks: rank-sort
   each filtered adjacency segment (one vectorized lexsort), enumerate
   ordered pairs (vectorized triangular decode, chunked), probe via
   ``searchsorted`` — each triangle found exactly once;
3. gather per-vertex partial counts (all three corners credited).

Two probe strategies, tested equal: ``broadcast`` (sorted E/2-key
array via ``ray.put``; fastest while it fits driver memory) and
``bucketed`` (no broadcast: wedge and edge-key streams routed by
``key % B`` through the object store, membership-checked per bucket —
the beyond-driver-memory path).

Oracle in tests: brute-force enumeration.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import (
    gather_kv_shuffle,
    iter_block_views,
    resolve_gather,
)

_PAIR_CHUNK = 8_000_000


def _oriented_segments(bv, rankkey: np.ndarray):
    """Filter a block's adjacency to higher-rank neighbors, rank-sorted
    per source.  Returns (indptr, indices) over local vertices."""
    src = bv.src_per_edge()
    keep = rankkey[bv.indices] > rankkey[src]
    src_k = src[keep]
    dst_k = bv.indices[keep]
    nv = bv.hi - bv.lo
    cnt = np.bincount(src_k - bv.lo, minlength=nv)
    indptr = np.zeros(nv + 1, dtype=np.int64)
    np.cumsum(cnt, out=indptr[1:])
    order = np.lexsort((rankkey[dst_k], src_k))
    return indptr, dst_k[order]


def _ordered_pairs(indptr: np.ndarray, indices: np.ndarray, lo_u: int, hi_u: int):
    """All pairs (i < j) within each vertex's (rank-sorted) adjacency
    segment for local vertices [lo_u, hi_u) — vectorized triangular
    decode.  Yields (u_local, a, b)."""
    cnt = np.diff(indptr[lo_u:hi_u + 1])
    npairs = cnt * (cnt - 1) // 2
    total = int(npairs.sum())
    if total == 0:
        return (np.empty(0, np.int64),) * 3
    u_idx = np.repeat(np.arange(len(cnt), dtype=np.int64), npairs)
    base = np.repeat(np.cumsum(npairs) - npairs, npairs)
    off = np.arange(total, dtype=np.int64) - base
    c = cnt[u_idx]
    i = (c - 2 - np.floor(np.sqrt(-8.0 * off + 4.0 * c * (c - 1) - 7) / 2.0 - 0.5)
         ).astype(np.int64)
    j = off + i + 1 - c * (c - 1) // 2 + (c - i) * (c - i - 1) // 2
    starts = indptr[lo_u + u_idx]
    return u_idx + lo_u, indices[starts + i], indices[starts + j]


def _wedges_batch(batch: pa.Table, keys_ref, rankkey_ref, n_: int,
                  dense: bool = False) -> pa.Table:
    """Undirected CSR block → per-vertex partial triangle counts.
    Stateless task; probe set + rank array read zero-copy per task.
    ``dense=True`` returns the whole partial count VECTOR (one row) —
    the driver then sums P vectors instead of lexsorting ~V·P keyed
    rows (a measured multi-second serial term at 360k vertices)."""
    import ray

    keys = ray.get(keys_ref)  # sorted oriented-edge keys u*n+v
    rankkey = ray.get(rankkey_ref)
    n = np.int64(n_)
    acc = np.zeros(n_, dtype=np.int64)
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
                # probe with SORTED queries: consecutive binary searches
                # then touch adjacent key memory — measured ~3× over
                # random-order probing at 10M keys (the hit set feeds
                # unordered np.add.at, so no unsort pass is needed)
                order = np.argsort(q)
                qs = q[order]
                pos = np.searchsorted(keys, qs)
                ok = pos < len(keys)
                hit = order[np.flatnonzero(
                    ok & (keys[np.where(ok, pos, 0)] == qs))]
                if len(hit):
                    np.add.at(acc, u_local[hit] + bv.lo, 1)
                    np.add.at(acc, a[hit], 1)
                    np.add.at(acc, b[hit], 1)
            lo_u = hi_u
    if dense:
        from hedonic_ray.engine.superstep import dense_vec_table

        first = batch.column("part")[0].as_py() if batch.num_rows else 0
        return dense_vec_table(first, acc.astype(np.float64))
    nz = np.flatnonzero(acc)
    return pa.table({"dst": pa.array(nz, pa.int64()),
                     "val": pa.array(acc[nz].astype(np.float64), pa.float64())})


def _bucket_edge_keys(table: pa.Table, rankkey, n: int, n_buckets: int):
    """Task: block → oriented edge keys split by ``key % B``, each
    bucket sorted."""
    import ray

    rk = ray.get(rankkey) if not isinstance(rankkey, np.ndarray) else rankkey
    keys = []
    for bv in iter_block_views(table):
        src = bv.src_per_edge()
        keep = rk[bv.indices] > rk[src]
        keys.append(src[keep] * np.int64(n) + bv.indices[keep])
    k = np.concatenate(keys) if keys else np.empty(0, np.int64)
    b = k % n_buckets
    order = np.argsort(b, kind="stable")
    k, b = k[order], b[order]
    bounds = np.searchsorted(b, np.arange(n_buckets + 1))
    out = tuple(np.sort(k[bounds[i]:bounds[i + 1]]) for i in range(n_buckets))
    return out if n_buckets > 1 else out[0]


def _bucket_wedges(table: pa.Table, rankkey, n: int, n_buckets: int):
    """Task: block → candidate wedges (u, key=a*n+b) split by
    ``key % B``."""
    import ray

    rk = ray.get(rankkey) if not isinstance(rankkey, np.ndarray) else rankkey
    us, ks = [], []
    for bv in iter_block_views(table):
        indptr, srt = _oriented_segments(bv, rk)
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
                us.append(u_local + bv.lo)
                ks.append(a * np.int64(n) + b)
            lo_u = hi_u
    u = np.concatenate(us) if us else np.empty(0, np.int64)
    k = np.concatenate(ks) if ks else np.empty(0, np.int64)
    bkt = k % n_buckets
    order = np.argsort(bkt, kind="stable")
    u, k, bkt = u[order], k[order], bkt[order]
    bounds = np.searchsorted(bkt, np.arange(n_buckets + 1))
    out = tuple((u[bounds[i]:bounds[i + 1]].copy(),
                 k[bounds[i]:bounds[i + 1]].copy())
                for i in range(n_buckets))
    return out if n_buckets > 1 else out[0]


def _bucket_probe(n: int, n_edge_parts: int, *parts):
    """Task: one bucket — membership-check wedges against this bucket's
    sorted edge keys; return sparse per-vertex triangle count partial.
    (varargs so each partial is a top-level ObjectRef arg — Ray only
    auto-dereferences top-level refs, not refs inside lists)"""
    edge_parts = parts[:n_edge_parts]
    wedge_parts = parts[n_edge_parts:]
    ek = [e for e in edge_parts if len(e)]
    keys = np.sort(np.concatenate(ek)) if ek else np.empty(0, np.int64)
    us, ks = [], []
    for u, k in wedge_parts:
        if len(u):
            us.append(u)
            ks.append(k)
    if not us or not len(keys):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    u = np.concatenate(us)
    k = np.concatenate(ks)
    # sorted-query probe (cache locality, see _wedges_batch)
    order = np.argsort(k)
    ksort = k[order]
    pos = np.searchsorted(keys, ksort)
    ok = pos < len(keys)
    hit = order[np.flatnonzero(ok & (keys[np.where(ok, pos, 0)] == ksort))]
    if not len(hit):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    corners = np.concatenate([u[hit], k[hit] // n, k[hit] % n])
    vals, cnts = np.unique(corners, return_counts=True)
    return vals, cnts.astype(np.int64)


def _triangle_count_bucketed(g, n_buckets: int) -> np.ndarray:
    """Bucketed semi-join probe (scale path: no broadcast of the edge
    set; wedge and edge streams are routed by ``key % B`` and checked
    per bucket)."""
    import ray

    n = g.n
    rankkey = g.out_degree.astype(np.int64) * np.int64(n) + np.arange(n, dtype=np.int64)
    rk_ref = ray.put(rankkey)
    ek = ray.remote(_bucket_edge_keys)
    wk = ray.remote(_bucket_wedges)
    pb = ray.remote(_bucket_probe)
    nb = n_buckets
    e_parts = [ek.options(num_returns=nb if nb > 1 else 1).remote(r, rk_ref, n, nb)
               for r in g.arrow_refs()]
    w_parts = [wk.options(num_returns=nb if nb > 1 else 1).remote(r, rk_ref, n, nb)
               for r in g.arrow_refs()]
    if nb == 1:
        e_by, w_by = [tuple(e_parts)], [tuple(w_parts)]
    else:
        e_by, w_by = list(zip(*e_parts)), list(zip(*w_parts))
    futs = [pb.remote(n, len(e_by[b]), *e_by[b], *w_by[b]) for b in range(nb)]
    per_vertex = np.zeros(n, dtype=np.int64)
    for vals, cnts in ray.get(futs):
        per_vertex[vals] += cnts
    return per_vertex


@dataclass
class TriangleResult:
    total: int
    per_vertex: np.ndarray
    seconds: float
    edges_processed: int


PROBE_BROADCAST_MAX = 200_000_000  # oriented edges; ~1.6 GB of int64 keys


def triangle_count(g, *, gather: str = "auto", num_parts: int | None = None,
                   probe: str = "auto",
                   n_buckets: int | None = None) -> TriangleResult:
    """Exact triangle count of an undirected LinkGraph.

    ``per_vertex[v]`` = number of triangles containing v;
    ``total`` = Σ/3.  ``probe="bucketed"`` is the beyond-driver-memory
    path: no broadcast edge set; wedge and edge-key streams are routed
    by ``key % B`` and membership-checked per bucket.  ``"auto"``
    broadcasts while the oriented edge set fits comfortably in a worker
    heap (E/2 ≤ PROBE_BROADCAST_MAX) and switches to the bucketed
    semi-join beyond that — both tested equal.
    """
    import ray

    if g.directed:
        raise ValueError("triangle_count needs an undirected LinkGraph")
    t0 = time.perf_counter()
    if probe == "auto":
        from hedonic_ray.context import force_scale

        probe = ("bucketed" if force_scale()
                 else "broadcast" if g.m // 2 <= PROBE_BROADCAST_MAX
                 else "bucketed")
    if probe == "bucketed":
        per_vertex = _triangle_count_bucketed(
            g, n_buckets or max(4, g.num_parts))
        return TriangleResult(total=int(per_vertex.sum() // 3),
                              per_vertex=per_vertex,
                              seconds=time.perf_counter() - t0,
                              edges_processed=g.m)
    mode = resolve_gather(gather, g.n)
    n = g.n
    rankkey = g.out_degree.astype(np.int64) * np.int64(n) + np.arange(n, dtype=np.int64)
    rk_ref = ray.put(rankkey)

    # probe array: higher-rank (oriented) edge keys, already in sorted
    # order once blocks are walked by ascending src range
    chunks = []
    for batch in g.blocks.iter_batches(batch_size=4, batch_format="pyarrow"):
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            keep = rankkey[bv.indices] > rankkey[src]
            chunks.append((bv.lo, src[keep] * np.int64(n) + bv.indices[keep]))
    chunks.sort(key=lambda t: t[0])
    keys = (np.concatenate([c[1] for c in chunks]) if chunks
            else np.empty(0, np.int64))
    keys_ref = ray.put(keys)

    dense = mode == "dense"
    msgs = g.blocks.map_batches(
        lambda b: _wedges_batch(b, keys_ref, rk_ref, n, dense),
        batch_format="pyarrow", batch_size=1)
    if dense:
        from hedonic_ray.engine.superstep import gather_dense

        per_vertex = gather_dense(msgs, n, op="sum").astype(np.int64)
    else:
        arrs = gather_kv_shuffle(msgs, ["dst"], "val", "sum")
        per_vertex = np.zeros(n, dtype=np.int64)
        if arrs["val"].size:
            per_vertex[arrs["dst"].astype(np.int64)] = arrs["val"].astype(np.int64)
    total = int(per_vertex.sum() // 3)
    return TriangleResult(total=total, per_vertex=per_vertex,
                          seconds=time.perf_counter() - t0,
                          edges_processed=g.m)
