"""Multi-source BFS hop distance over the CSR link graph.

Classic frontier superstep: per round, ONE ``map_batches`` pass over
the CSR blocks counts each vertex's neighbors inside the broadcast
frontier bitmap (`ray.put` once per round — the shared
``masked_neighbor_count`` kernel from `algos/kcore.py`); every
unvisited vertex touched by the frontier joins the next frontier at
distance ``round``.  O(rounds · m) work, no all-to-all exchange —
the frontier/visited state is two V-sized driver arrays, the same
posture as PageRank / CC / k-core (V ≪ E at web scale).

A fixed ``rounds`` makes the result a pure function of
(graph, seeds, rounds), which the SQL oracle unrolls CTE-by-CTE; when
the BFS saturates earlier the loop exits and fixed-round ≡ converged.

The reference has no traversal primitive (its loops are
community-detection games over `hedonic/__init__.py`); this extends
the north-rule graph family (PageRank / CC / LP / triangles / LCC /
k-core) with the standard reachability/eccentricity building block.
"""

from __future__ import annotations

import numpy as np

from hedonic_ray.algos.kcore import masked_neighbor_count

UNREACHED = -1

SHARDS_MIN_VERTICES = 200_000  # same switch point as PageRank/LP/Katz


class _BfsVecSpec:
    """Vector-superstep spec (`engine/shards.py:VectorShardPool`):
    the (dist, frontier) slices live in the shard actors; one round =
    frontier sources push a touch marker (unique destinations only),
    merge labels the untouched ones and swaps the frontier —
    bit-identical to the Dataset pull loop including its
    empty-frontier exit (``active`` = local new-frontier size)."""

    def __init__(self, seeds: np.ndarray):
        self.seeds = seeds

    def init_slice(self, lo, hi, n):
        dist = np.full(hi - lo, UNREACHED, np.int64)
        frontier = np.zeros(hi - lo, bool)
        mine = self.seeds[(self.seeds >= lo) & (self.seeds < hi)] - lo
        dist[mine] = 0
        frontier[mine] = True
        return {"dist": dist, "frontier": frontier}

    def scatter(self, state, lo, hi, indptr, indices, src):
        live = state["frontier"][src - lo]
        if not live.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        u = np.unique(indices[live])
        return u.astype(np.int64), np.ones(len(u), np.int64)

    def merge(self, state, lo, hi, n, incoming, rnd):
        hit = np.zeros(hi - lo, bool)
        for dst, val in incoming:
            if len(dst):
                hit[dst - lo] = True
        new = hit & (state["dist"] == UNREACHED)
        state["dist"][new] = rnd + 1
        state["frontier"] = new
        return {"active": int(new.sum())}


def bfs_distances(g, seeds, *, rounds: int | None = None,
                  backend: str = "auto") -> np.ndarray:
    """Hop distance from the nearest seed (``-1`` beyond ``rounds`` /
    unreachable).  ``rounds=None`` runs to the fixed point.

    ``backend="auto"`` picks the resident-shard-state path
    (`engine/shards.py:VectorShardPool`) above ``SHARDS_MIN_VERTICES``
    or under ``HEDONIC_RAY_FORCE_SCALE``, else the Dataset pull loop;
    both are bit-identical (tested)."""
    import ray

    if g.directed:
        raise ValueError("bfs_distances needs an undirected LinkGraph")
    seeds = np.asarray(seeds, dtype=np.int64)
    if seeds.size == 0:
        return np.full(g.n, UNREACHED, dtype=np.int64)
    if backend == "auto":
        from hedonic_ray.context import force_scale

        backend = "shards" if (force_scale() or
                               g.n >= SHARDS_MIN_VERTICES) else "dataset"
    if backend == "shards":
        from hedonic_ray.engine.shards import run_vector_supersteps

        cap = g.n if rounds is None else rounds
        pool = run_vector_supersteps(g, _BfsVecSpec(seeds), rounds=cap)
        return pool.collect("dist")
    dist = np.full(g.n, UNREACHED, dtype=np.int64)
    dist[seeds] = 0
    frontier = np.zeros(g.n, dtype=bool)
    frontier[seeds] = True
    r = 0
    while rounds is None or r < rounds:
        cnt = masked_neighbor_count(g, ray.put(frontier))
        new = (cnt > 0) & (dist == UNREACHED)
        r += 1
        if not new.any():
            break
        dist[new] = r
        frontier = new
    return dist


def bfs_downstream_paths(g, dist: np.ndarray) -> np.ndarray:
    """Shortest-path CONTINUATION counts down the BFS DAG labeled by
    ``dist``: rho(v) = Σ over DAG successors w (dist(w) = dist(v)+1)
    of (1 + rho(w)) — Brandes' backward dependency pass with raw
    integer path counts instead of float ratios, so
    sigma(v) · rho(v) is the EXACT number of (target, shortest-path)
    pairs from the seed passing through v (single-source stress /
    through-traffic centrality).

    One :func:`~hedonic_ray.algos.kcore.masked_neighbor_count` pull
    per level, run top level down: the broadcast vector is (1 + rho)
    masked to level r+1, so the all-neighbor sum over an undirected
    CSR row equals the DAG-successor sum.  Exact int64 throughout
    (the shared kernel's int path is an exact integer cumsum);
    per-level headroom asserted like the forward pass."""
    import ray

    from hedonic_ray.algos.kcore import masked_neighbor_count

    rho = np.zeros(g.n, dtype=np.int64)
    max_r = int(dist.max(initial=0))
    for r in range(max_r - 1, -1, -1):
        vec = np.where(dist == r + 1, 1 + rho, 0)
        # kernel cumsum bound: Σ_edges vec[idx] ≤ vec.sum() · max_deg
        assert int(vec.sum()) < (1 << 62) // max(g.n, 1), \
            "downstream-path overflow: lower rounds"
        pulled = masked_neighbor_count(g, ray.put(vec))
        lvl = dist == r
        rho[lvl] = pulled[lvl]
    return rho


def bfs_path_counts(g, seed: int, *, rounds: int = 6):
    """Number of SHORTEST PATHS from ``seed`` to every reached vertex
    (σ_s(v), the forward pass of Brandes' betweenness algorithm) —
    exact int64 counts, radius-``rounds``-capped like
    :func:`bfs_distances`.

    After the BFS labels levels, each level-r count is ONE scatter
    over the CSR blocks against the broadcast (dist, cnt) vectors:
    an edge u→v contributes cnt(u) to v iff dist(u) = r−1 and
    dist(v) = r (vectorized mask + weighted bincount per block; only
    touched (dst, partial) pairs leave a task).  Returns
    ``(dist, cnt)`` — cnt is 0 beyond the cap.  Counts along a BFS
    DAG multiply, so int64 headroom is asserted per level."""
    import ray

    import pyarrow as pa

    from hedonic_ray.engine.superstep import iter_block_views

    dist = bfs_distances(g, np.array([seed], dtype=np.int64),
                         rounds=rounds)
    cnt = np.zeros(g.n, dtype=np.int64)
    cnt[seed] = 1
    dist_ref = ray.put(dist)
    max_r = int(dist.max(initial=0))

    for r in range(1, max_r + 1):
        cnt_ref = ray.put(cnt)

        def level(batch: pa.Table, r=r) -> pa.Table:
            d = ray.get(dist_ref)
            c = ray.get(cnt_ref)
            dst_out, val_out = [], []
            for bv in iter_block_views(batch):
                src = bv.src_per_edge()
                tgt = bv.indices
                m = (d[src] == r - 1) & (d[tgt] == r)
                if not m.any():
                    continue
                s = np.bincount(tgt[m], weights=c[src[m]].astype(np.float64))
                # float64 bincount is exact below 2^53; asserted below
                nz = np.flatnonzero(s)
                dst_out.append(nz.astype(np.int64))
                val_out.append(s[nz].astype(np.int64))
            if not dst_out:
                return pa.table({"dst": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.int64())})
            return pa.table({"dst": pa.array(np.concatenate(dst_out)),
                             "val": pa.array(np.concatenate(val_out))})

        assert int(cnt.max(initial=0)) < (1 << 52) // max(g.n, 1), \
            "path-count overflow: lower rounds"
        for b in g.blocks.map_batches(level, batch_format="pyarrow") \
                .iter_batches(batch_size=65536, batch_format="pyarrow"):
            if b.num_rows:
                np.add.at(cnt, b.column("dst").to_numpy(),
                          b.column("val").to_numpy())
    return dist, cnt
