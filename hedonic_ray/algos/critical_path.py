"""Radius-capped LONGEST-PATH depths (topological levels / critical
path) over a DAG given as a directed CSR link graph.

The max-plus twin of `algos/sssp.py` (same superstep shape, same two
backends): synchronous Bellman relaxation with

    depth_k(v) = max( depth_{k-1}(v),
                      1 + max_{u→v} depth_{k-1}(u) )

``rounds`` fixed so the result is a pure function of (graph, rounds)
the SQL oracle unrolls CTE-by-CTE — on a DAG of depth ≤ rounds this
IS the longest incoming path (the schedule level of every critical-
path/scheduling analysis); past the cap both engines report the same
capped value (round-cap parity, the `graph_mst` lesson).  On a graph
with cycles the capped value is still well-defined and equal on both
sides — the intended input is the SCC condensation, which is acyclic
by construction.

The reference has no DAG analytics (its loops are community games,
``/root/reference/hedonic/__init__.py``); this is a north-rule
superstep-family member for the quotient graph `doc_scc_dag` builds.

Backends: ``dataset`` — one ``map_batches`` scatter per round over
the CSR blocks against the broadcast depth vector, emitting only
IMPROVED (dst, cand) pairs, driver max-merge (V-sized state, V ≪ E);
``shards`` — the resident-state vector superstep
(`engine/shards.py:VectorShardPool`): the depth slice never leaves
the shard actors, one max-merge exchange per round.  Bit-identical
(tested), auto-switched at the PageRank/LP/SSSP threshold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import iter_block_views

SHARDS_MIN_VERTICES = 200_000  # same switch point as PageRank/LP/SSSP


class _CritVecSpec:
    """Vector-superstep spec: per-dst max of depth[src]+1, max-merge."""

    def init_slice(self, lo, hi, n):
        return {"depth": np.zeros(hi - lo, dtype=np.int64)}

    def scatter(self, state, lo, hi, indptr, indices, src):
        if not len(src):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        cand = state["depth"][src - lo] + 1
        u = np.unique(indices)
        best = np.zeros(len(u), dtype=np.int64)
        np.maximum.at(best, np.searchsorted(u, indices), cand)
        return u.astype(np.int64), best

    def merge(self, state, lo, hi, n, incoming, rnd):
        depth = state["depth"]
        nxt = depth.copy()
        for dst, val in incoming:
            if len(dst):
                np.maximum.at(nxt, dst - lo, val)
        changed = int((nxt != depth).sum())
        state["depth"] = nxt
        return {"active": changed}


def longest_path_depths(g, *, rounds: int = 6,
                        backend: str = "auto") -> np.ndarray:
    """Per-vertex radius-capped longest incoming path length along the
    arcs of the DIRECTED CSR graph ``g`` (≤ ``rounds`` arcs)."""
    import ray

    if backend == "auto":
        from hedonic_ray.context import force_scale

        backend = "shards" if (force_scale() or
                               g.n >= SHARDS_MIN_VERTICES) else "dataset"
    if backend == "shards":
        from hedonic_ray.engine.shards import run_vector_supersteps

        pool = run_vector_supersteps(g, _CritVecSpec(), rounds=rounds)
        return pool.collect("depth")

    depth = np.zeros(g.n, dtype=np.int64)

    def relax(batch: pa.Table) -> pa.Table:
        d = ray.get(depth_ref)
        dst_out, val_out = [], []
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            if not len(src):
                continue
            cand = d[src] + 1
            better = cand > d[bv.indices]
            if not better.any():
                continue
            tgt, cand = bv.indices[better], cand[better]
            u = np.unique(tgt)
            best = np.zeros(len(u), dtype=np.int64)
            np.maximum.at(best, np.searchsorted(u, tgt), cand)
            dst_out.append(u)
            val_out.append(best)
        if not dst_out:
            return pa.table({"dst": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        return pa.table({"dst": pa.array(np.concatenate(dst_out)),
                         "val": pa.array(np.concatenate(val_out))})

    for _ in range(rounds):
        depth_ref = ray.put(depth)
        nxt = depth.copy()
        for batch in g.blocks.map_batches(
                relax, batch_format="pyarrow").iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            if batch.num_rows == 0:
                continue
            np.maximum.at(nxt, batch.column("dst").to_numpy(),
                          batch.column("val").to_numpy())
        if np.array_equal(nxt, depth):
            break
        depth = nxt
    return depth
