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

Scale note: the probe set holds E/2 uint64 keys broadcast via
``ray.put``; past driver memory the same check becomes a bucketed
semi-join on ``key % B`` (wedge and edge streams keyed alike).

Oracle in tests: brute-force enumeration.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import (
    gather_kv_driver,
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


def _wedges_batch(batch: pa.Table, keys_ref, rankkey_ref, n_: int) -> pa.Table:
    """Undirected CSR block → per-vertex partial triangle counts.
    Stateless task; probe set + rank array read zero-copy per task."""
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
                pos = np.searchsorted(keys, q)
                ok = pos < len(keys)
                hit = np.flatnonzero(ok & (keys[np.where(ok, pos, 0)] == q))
                if len(hit):
                    np.add.at(acc, u_local[hit] + bv.lo, 1)
                    np.add.at(acc, a[hit], 1)
                    np.add.at(acc, b[hit], 1)
            lo_u = hi_u
    nz = np.flatnonzero(acc)
    return pa.table({"dst": pa.array(nz, pa.int64()),
                     "val": pa.array(acc[nz].astype(np.float64), pa.float64())})


@dataclass
class TriangleResult:
    total: int
    per_vertex: np.ndarray
    seconds: float
    edges_processed: int


def triangle_count(g, *, gather: str = "auto", num_parts: int | None = None) -> TriangleResult:
    """Exact triangle count of an undirected LinkGraph.

    ``per_vertex[v]`` = number of triangles containing v;
    ``total`` = Σ/3.
    """
    import ray

    if g.directed:
        raise ValueError("triangle_count needs an undirected LinkGraph")
    t0 = time.perf_counter()
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

    msgs = g.blocks.map_batches(
        lambda b: _wedges_batch(b, keys_ref, rk_ref, n),
        batch_format="pyarrow", batch_size=1)
    if mode == "dense":
        arrs = gather_kv_driver(msgs, ["dst"], "val", "sum")
    else:
        arrs = gather_kv_shuffle(msgs, ["dst"], "val", "sum")
    per_vertex = np.zeros(n, dtype=np.int64)
    if arrs["val"].size:
        per_vertex[arrs["dst"].astype(np.int64)] = arrs["val"].astype(np.int64)
    total = int(per_vertex.sum() // 3)
    return TriangleResult(total=total, per_vertex=per_vertex,
                          seconds=time.perf_counter() - t0,
                          edges_processed=g.m)
