"""k-core peel over the CSR link graph.

Iteratively remove vertices whose degree among the still-alive
vertices is below ``k``; the surviving set is the k-core.  Superstep
shape shared with the other loop algorithms (`algos/components.py`
etc.): per round, ONE ``map_batches`` over the CSR blocks computes
each source's alive-neighbor count against the broadcast alive bitmap
(`ray.put` once per round — never re-shipped per block), blocks own
disjoint source ranges so the per-block results concatenate without a
shuffle, and the driver applies the threshold.  O(rounds · m) work,
no all-to-all exchange anywhere.

The reference has no k-core (its decompositions are
community-detection games); this extends the north-rule graph family
(PageRank / CC / LP / triangles / LCC) with the standard
degeneracy-layer primitive used for graph cleaning at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import iter_block_views


def masked_neighbor_count(g, alive_ref) -> np.ndarray:
    """Masked/weighted neighbor sum per vertex — one pass over the CSR
    blocks.

    Shared frontier/peel/pull kernel: given a broadcast per-vertex
    vector (``ray.put`` once per round; bool masks count, numeric
    vectors sum), returns for every source the sum of the vector over
    its neighbors.  Blocks own disjoint source ranges, so per-block
    results concatenate without a shuffle.  Used by the k-core peel
    (mask = alive set), BFS (`algos/bfs.py`, mask = current frontier)
    and the HITS hub pull (`algos/hits.py`, vector = authority
    scores)."""
    import ray

    def f(batch: pa.Table) -> pa.Table:
        a = ray.get(alive_ref)
        if a.dtype == bool:
            a = a.astype(np.int64)
        out_t = pa.float64() if a.dtype.kind == "f" else pa.int64()
        lo_out = []
        cnt_out = []
        for bv in iter_block_views(batch):
            # prefix-sum trick: np.add.reduceat mishandles empty rows
            cs = np.concatenate(([0], np.cumsum(a[bv.indices])))
            cnt = cs[bv.indptr[1:]] - cs[bv.indptr[:-1]]
            lo_out.append(bv.lo)
            cnt_out.append(cnt)
        return pa.table({"lo": pa.array(lo_out, pa.int64()),
                         "cnt": pa.array([c.tolist() for c in cnt_out],
                                         pa.list_(out_t))})

    first = ray.get(alive_ref)
    dtype = np.float64 if first.dtype.kind == "f" else np.int64
    deg = np.zeros(g.n, dtype=dtype)
    for batch in g.blocks.map_batches(
            f, batch_format="pyarrow").iter_batches(
            batch_size=64, batch_format="pyarrow"):
        los = batch.column("lo").to_pylist()
        for lo, cnt in zip(los, batch.column("cnt").to_pylist()):
            deg[lo:lo + len(cnt)] = cnt
    return deg


SHARDS_MIN_VERTICES = 200_000  # same switch point as PageRank/LP/Katz


class _KcoreVecSpec:
    """Vector-superstep spec (`engine/shards.py:VectorShardPool`):
    the alive slice lives in the shard actors; one peel round = alive
    sources push per-destination 1-counts (pre-summed per shard),
    merge drops alive vertices below ``k`` — bit-identical to the
    Dataset pull loop including its fixed-point exit (``active`` =
    local peel count)."""

    def __init__(self, k: int):
        self.k = k

    def init_slice(self, lo, hi, n):
        return {"alive": np.ones(hi - lo, bool)}

    def scatter(self, state, lo, hi, indptr, indices, src):
        live = state["alive"][src - lo]
        if not live.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        t_ = indices[live]
        u, c = np.unique(t_, return_counts=True)
        return u.astype(np.int64), c.astype(np.int64)

    def merge(self, state, lo, hi, n, incoming, rnd):
        deg = np.zeros(hi - lo, np.int64)
        for dst, val in incoming:
            if len(dst):
                np.add.at(deg, dst - lo, val)
        alive = state["alive"]
        new_alive = alive & (deg >= self.k)
        changed = int((new_alive != alive).sum())
        state["alive"] = new_alive
        return {"active": changed}


def kcore_membership(g, k: int, *, rounds: int | None = None,
                     backend: str = "auto") -> np.ndarray:
    """Boolean alive mask after ``rounds`` peel rounds (None = run to
    the fixed point).  A fixed ``rounds`` makes the result a pure
    function of (graph, k, rounds) — that is what the SQL oracle
    unrolls; at gate scale the peel converges within the unrolled
    depth, so fixed-round ≡ converged there.

    ``backend="auto"`` picks the resident-shard-state path
    (`engine/shards.py:VectorShardPool`) above ``SHARDS_MIN_VERTICES``
    or under ``HEDONIC_RAY_FORCE_SCALE``, else the Dataset pull loop;
    both are bit-identical (tested)."""
    import ray

    if g.directed:
        raise ValueError("kcore_membership needs an undirected LinkGraph")
    if backend == "auto":
        from hedonic_ray.context import force_scale

        backend = "shards" if (force_scale() or
                               g.n >= SHARDS_MIN_VERTICES) else "dataset"
    if backend == "shards":
        from hedonic_ray.engine.shards import run_vector_supersteps

        cap = g.n if rounds is None else rounds
        pool = run_vector_supersteps(g, _KcoreVecSpec(k), rounds=cap)
        return pool.collect("alive")
    alive = np.ones(g.n, dtype=bool)
    it = 0
    while rounds is None or it < rounds:
        deg = masked_neighbor_count(g, ray.put(alive))
        new_alive = alive & (deg >= k)
        it += 1
        if (new_alive == alive).all():
            break
        alive = new_alive
    return alive
