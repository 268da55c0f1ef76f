"""Connected components via min-label propagation supersteps (exact).

Each vertex's component id converges to the minimum vertex id reachable
from it; over an undirected (symmetrized) ``LinkGraph`` this is exact
connected components, checked against a union-find oracle in tests.
Scatter partial-aggregates the per-destination minimum inside each
partition before any data moves.
"""

from __future__ import annotations

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


def connected_components(g, *, max_iters: int = 200, gather: str = "auto",
                         checkpoint_dir: str | None = None, run_id: str | None = None,
                         checkpoint_every: int = 5, resume: bool = False) -> RunResult:
    """``result.state['component']`` maps each vertex to the min vertex
    id of its connected component.  Requires an undirected graph."""
    if g.directed:
        raise ValueError("connected_components needs an undirected LinkGraph")
    return run_supersteps(g, ComponentsStep(), max_iters=max_iters, gather=gather,
                          checkpoint_dir=checkpoint_dir, run_id=run_id,
                          checkpoint_every=checkpoint_every, resume=resume)
