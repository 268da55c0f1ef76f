"""Connected components via min-label propagation supersteps (exact).

Each vertex's component id converges to the minimum vertex id reachable
from it; over an undirected (symmetrized) ``LinkGraph`` this is exact
connected components, checked against a union-find oracle in tests.
Scatter partial-aggregates the per-destination minimum inside each
partition before any data moves.

``gather="auto"`` picks the resident-shard-state backend
(`_ComponentsVecSpec` on `engine/shards.py:VectorShardPool`) above
``SHARDS_MIN_VERTICES`` or under ``HEDONIC_RAY_FORCE_SCALE``: the
component vector stays sharded in the actors, only CHANGED sources
scatter each round (min-propagation is monotone, so a label already
delivered is already folded in — frontier scatter is bit-identical to
the all-sources Dataset exchange per round, tested), and the driver
sees one int per shard per round instead of an O(V) broadcast.  This
is also the dedup clustering backend (`ops/dedup.py:_cluster`), so the
LSH-cluster path inherits the scale shape for free.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import (
    dense_vec_table,
    gather_dense,
    gather_kv_shuffle,
    run_supersteps,
    RunResult,
)

_INF = np.float64(np.inf)

SHARDS_MIN_VERTICES = 200_000  # same switch point as PageRank/LP/Katz


class ComponentsStep:
    def init_state(self, g) -> dict:
        return {"component": np.arange(g.n, dtype=np.int64)}

    def broadcast_state(self, state: dict):
        return state["component"]

    def empty_messages(self, mode: str) -> pa.Table:
        if mode == "dense":
            return pa.table({"part": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        return pa.table({"dst": pa.array([], pa.int64()),
                         "val": pa.array([], pa.float64())})

    def scatter(self, block, comp: np.ndarray, mode: str) -> pa.Table:
        per_edge = comp[block.src_per_edge()].astype(np.float64)
        if mode == "dense":
            vec = np.full(len(comp), _INF)
            np.minimum.at(vec, block.indices, per_edge)
            return dense_vec_table(block.part, vec)
        order = np.argsort(block.indices, kind="stable")
        dst = block.indices[order]
        vals = per_edge[order]
        starts = np.flatnonzero(np.concatenate([[True], dst[1:] != dst[:-1]]))
        return pa.table({"dst": pa.array(dst[starts], pa.int64()),
                         "val": pa.array(np.minimum.reduceat(vals, starts),
                                         pa.float64())})

    def gather(self, msgs_ds, mode: str, g) -> np.ndarray:
        if mode == "dense":
            return gather_dense(msgs_ds, g.n, op="min", init=np.inf)
        arrs = gather_kv_shuffle(msgs_ds, ["dst"], "val", "min")
        acc = np.full(g.n, _INF)
        acc[arrs["dst"].astype(np.int64)] = arrs["val"]
        return acc

    def prefers_tasks(self, g) -> bool:
        # dense driver reduce is a serial scaling cap — switch to the
        # parallel task exchange above ~200k vertices (see
        # PageRankStep.prefers_tasks for measurements)
        return g.n >= 200_000

    def tasks_step(self, g, state: dict, it: int):
        from hedonic_ray.engine.exchange import numeric_exchange_step

        agg = numeric_exchange_step(g, state["component"].astype(np.float64),
                                    mode="min")
        return self.apply(state, agg, g, it)

    def apply(self, state: dict, agg: np.ndarray, g, it: int):
        comp = state["component"]
        incoming = np.where(np.isfinite(agg), agg, comp).astype(np.int64)
        new = np.minimum(comp, incoming)
        active = int((new != comp).sum())
        return {"component": new}, active, {}


class _ComponentsVecSpec:
    """Vector-superstep spec (`engine/shards.py:VectorShardPool`): the
    component slice and the changed-last-round frontier live in the
    shard actors.  Scatter pushes the per-destination MIN of the
    frontier sources' labels (sorted segmented ``minimum.reduceat`` —
    the same partial the Dataset scatter ships); merge folds the
    incoming mins, relabels, and the newly-lowered vertices become the
    next frontier.  Because min-propagation is monotone, a source
    whose label did not change last round can only resend a value its
    neighbors already absorbed — frontier scatter is bit-identical to
    the all-sources exchange per round (tested vs both Dataset
    backends), while the traffic decays with the shrinking frontier
    instead of staying O(m) every round."""

    def init_slice(self, lo, hi, n):
        return {"component": np.arange(lo, hi, dtype=np.int64),
                "frontier": np.ones(hi - lo, dtype=bool),
                "outdeg": None}

    def scatter(self, state, lo, hi, indptr, indices, src):
        if state["outdeg"] is None:
            state["outdeg"] = np.diff(indptr)
        deg = state["outdeg"]
        live = np.repeat(state["frontier"], deg)
        if not live.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        per_edge = np.repeat(state["component"], deg)[live]
        dst = indices[live]
        order = np.argsort(dst, kind="stable")
        sx = dst[order]
        sv = per_edge[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(sx)) + 1])
        return sx[starts].astype(np.int64), np.minimum.reduceat(sv, starts)

    def merge(self, state, lo, hi, n, incoming, rnd):
        comp = state["component"]
        agg = np.full(hi - lo, np.iinfo(np.int64).max, dtype=np.int64)
        for dst, val in incoming:
            if len(dst):
                # dst is unique within one incoming column (already
                # per-destination reduced at the source shard), so the
                # fancy-indexed minimum is exact and vectorized
                loc = dst - lo
                agg[loc] = np.minimum(agg[loc], val)
        new = np.minimum(comp, agg)
        changed = new != comp
        state["component"] = new
        state["frontier"] = changed
        return {"active": int(changed.sum())}


def _components_shards(g, max_iters: int) -> RunResult:
    """Drive the resident-state spec; the only O(V) driver transfer is
    the final ``collect`` (same driver-loop shape as
    `algos/pagerank.py:_pagerank_shards`)."""
    from hedonic_ray.engine.shards import VectorShardPool

    pool = VectorShardPool(g, _ComponentsVecSpec())
    result = RunResult(state={})
    for it in range(max_iters):
        t0 = time.perf_counter()
        stats = pool.step(it)
        dt = time.perf_counter() - t0
        active = sum(int(s["active"]) for s in stats)
        result.metrics.append({"iteration": it, "active_vertices": active,
                               "edges_processed": g.m, "seconds": dt})
        result.iterations = it + 1
        if active == 0:
            result.converged = True
            break
    result.state["component"] = pool.collect("component")
    return result


def connected_components(g, *, max_iters: int = 200, gather: str = "auto",
                         checkpoint_dir: str | None = None, run_id: str | None = None,
                         checkpoint_every: int = 5, resume: bool = False) -> RunResult:
    """``result.state['component']`` maps each vertex to the min vertex
    id of its connected component.  Requires an undirected graph.

    ``gather="auto"`` picks the resident-shard-state backend above
    ``SHARDS_MIN_VERTICES`` or under ``HEDONIC_RAY_FORCE_SCALE`` —
    unless checkpointing is requested, which stays on `run_supersteps`
    (checkpoint/resume needs the driver-held state)."""
    if g.directed:
        raise ValueError("connected_components needs an undirected LinkGraph")
    if checkpoint_dir is None and gather in ("auto", "shards"):
        from hedonic_ray.context import force_scale

        if gather == "shards" or force_scale() or g.n >= SHARDS_MIN_VERTICES:
            return _components_shards(g, max_iters)
        gather = "auto"
    return run_supersteps(g, ComponentsStep(), max_iters=max_iters,
                          gather="auto" if gather == "shards" else gather,
                          checkpoint_dir=checkpoint_dir, run_id=run_id,
                          checkpoint_every=checkpoint_every, resume=resume)
