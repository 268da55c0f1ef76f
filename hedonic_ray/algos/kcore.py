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


def kcore_membership(g, k: int, *, rounds: int | None = None) -> np.ndarray:
    """Boolean alive mask after ``rounds`` peel rounds (None = run to
    the fixed point).  A fixed ``rounds`` makes the result a pure
    function of (graph, k, rounds) — that is what the SQL oracle
    unrolls; at gate scale the peel converges within the unrolled
    depth, so fixed-round ≡ converged there."""
    import ray

    if g.directed:
        raise ValueError("kcore_membership needs an undirected LinkGraph")
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
