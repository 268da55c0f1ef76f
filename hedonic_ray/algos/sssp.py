"""Single-source shortest paths (Bellman-Ford supersteps) over the
directed CSR link graph, exact integer weights.

The reference has no weighted traversal (its loops are community
games, ``/root/reference/hedonic/__init__.py``); weighted SSSP is the
remaining headline member of the north-rule superstep family
(PageRank / CC / LP / BFS / HITS / Katz all ship already).

Synchronous Bellman-Ford relaxation, ``rounds`` fixed so the result
is a pure function of (graph, weights, seed, rounds) that the SQL
oracle unrolls CTE-by-CTE:

    dist_k(v) = min( dist_{k-1}(v),
                     min_{u→v} dist_{k-1}(u) + w(u, v) )

Each round is ONE ``map_batches`` scatter over the CSR blocks against
the broadcast distance vector (``ray.put`` once per round): a block
computes per-edge candidates vectorized (`np.minimum.at` per-dst min)
and emits only its IMPROVED (dst, cand) pairs — O(improved) rows
travel, never the edge list; the driver min-merges V-sized state,
the same posture as PageRank/BFS (V ≪ E at web scale).  Early exit
when a round improves nothing (fixed-round ≡ converged then).

Weights are a pure function of the endpoint ids (``1 +
(src·31 + dst·17) % 9`` by default) so CSR blocks need no weight
column and the SQL oracle reproduces them arithmetically; a weighted
edge table would carry the same kernel with ``w`` read per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import iter_block_views

INF = np.int64(1) << np.int64(62)
UNREACHED = -1

# default deterministic edge weight in [1, 9] (SQL-reproducible)
W_A, W_B, W_MOD = 31, 17, 9


def _edge_weights(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    return 1 + (src * W_A + dst * W_B) % W_MOD


SHARDS_MIN_VERTICES = 200_000  # same switch point as PageRank/LP/Katz


class _SsspVecSpec:
    """Vector-superstep spec (`engine/shards.py:VectorShardPool`):
    the distance slice lives in the shard actors; one round = per-dst
    min of live-edge candidates split by destination shard, then a
    min-merge into the slice.  The Dataset path additionally filters
    candidates against the broadcast global distances — a pure
    message-volume optimization the min-merge makes irrelevant, so
    the two backends are bit-identical (tested)."""

    def __init__(self, seed: int):
        self.seed = seed

    def init_slice(self, lo, hi, n):
        d = np.full(hi - lo, INF, dtype=np.int64)
        if lo <= self.seed < hi:
            d[self.seed - lo] = 0
        return {"dist": d}

    def scatter(self, state, lo, hi, indptr, indices, src):
        ds = state["dist"][src - lo]
        live = ds < INF
        if not live.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        s_, t_ = src[live], indices[live]
        cand = ds[live] + _edge_weights(s_, t_)
        u = np.unique(t_)
        best = np.full(len(u), INF, dtype=np.int64)
        np.minimum.at(best, np.searchsorted(u, t_), cand)
        return u.astype(np.int64), best

    def merge(self, state, lo, hi, n, incoming, rnd):
        dist = state["dist"]
        nxt = dist.copy()
        for dst, val in incoming:
            if len(dst):
                np.minimum.at(nxt, dst - lo, val)
        changed = int((nxt != dist).sum())
        state["dist"] = nxt
        return {"active": changed}


def sssp_distances(g, seed: int, *, rounds: int = 6,
                   backend: str = "auto") -> np.ndarray:
    """Exact shortest-path distance from ``seed`` along ≤ ``rounds``
    arcs of the DIRECTED CSR graph ``g`` under the deterministic
    integer weights (UNREACHED = -1 beyond the round cap).

    ``backend="auto"`` picks the resident-shard-state path above
    ``SHARDS_MIN_VERTICES`` or under ``HEDONIC_RAY_FORCE_SCALE``,
    else the Dataset relax loop; bit-identical (tested)."""
    import ray

    if backend == "auto":
        from hedonic_ray.context import force_scale

        backend = "shards" if (force_scale() or
                               g.n >= SHARDS_MIN_VERTICES) else "dataset"
    if backend == "shards":
        from hedonic_ray.engine.shards import run_vector_supersteps

        pool = run_vector_supersteps(g, _SsspVecSpec(seed), rounds=rounds)
        out = pool.collect("dist")
        out[out == INF] = UNREACHED
        return out

    dist = np.full(g.n, INF, dtype=np.int64)
    dist[seed] = 0

    def relax(batch: pa.Table) -> pa.Table:
        d = ray.get(dist_ref)
        dst_out, val_out = [], []
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            ds = d[src]
            live = ds < INF
            if not live.any():
                continue
            src, tgt = src[live], bv.indices[live]
            cand = ds[live] + _edge_weights(src, tgt)
            better = cand < d[tgt]
            if not better.any():
                continue
            tgt, cand = tgt[better], cand[better]
            u = np.unique(tgt)
            best = np.full(len(u), INF, dtype=np.int64)
            np.minimum.at(best, np.searchsorted(u, tgt), cand)
            dst_out.append(u)
            val_out.append(best)
        if not dst_out:
            return pa.table({"dst": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        return pa.table({"dst": pa.array(np.concatenate(dst_out)),
                         "val": pa.array(np.concatenate(val_out))})

    for _ in range(rounds):
        dist_ref = ray.put(dist)
        improved = False
        nxt = dist.copy()
        for batch in g.blocks.map_batches(
                relax, batch_format="pyarrow").iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            if batch.num_rows == 0:
                continue
            d_ = batch.column("dst").to_numpy()
            v_ = batch.column("val").to_numpy()
            np.minimum.at(nxt, d_, v_)
            improved = True
        if not improved or np.array_equal(nxt, dist):
            break
        dist = nxt
    out = dist.copy()
    out[out == INF] = UNREACHED
    return out
