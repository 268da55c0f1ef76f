"""PageRank as gather–scatter supersteps.

Not present in the reference repo (it is required by the north rule);
semantics are the standard damped power iteration with uniform dangling
redistribution, verified ``allclose 1e-6`` against a dense NumPy oracle
in ``tests/oracles.py``::

    r' = (1-d)/n + d * (sum_{u->v} r_u / outdeg_u  +  dangling_mass / n)

Scatter emits per-partition PARTIAL contribution sums (``np.bincount``
over the block's destinations — the combiner), so the gather only
merges #partitions × touched-vertices rows, never raw edges.
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


class PageRankStep:
    def __init__(self, damping: float = 0.85, tol: float = 1e-12):
        self.damping = damping
        self.tol = tol

    def init_state(self, g) -> dict:
        return {"rank": np.full(g.n, 1.0 / g.n, dtype=np.float64)}

    def broadcast_state(self, state: dict):
        return state["rank"]

    def empty_messages(self, mode: str) -> pa.Table:
        if mode == "dense":
            return pa.table({"part": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        return pa.table({"dst": pa.array([], pa.int64()),
                         "val": pa.array([], pa.float64())})

    def scatter(self, block, rank: np.ndarray, mode: str) -> pa.Table:
        deg = np.diff(block.indptr)
        local = rank[block.lo:block.hi]
        w = np.divide(local, deg, out=np.zeros_like(local), where=deg > 0)
        per_edge = np.repeat(w, deg)
        if mode == "dense":
            n = len(rank)
            vec = np.bincount(block.indices, weights=per_edge, minlength=n)
            return dense_vec_table(block.part, vec)
        s = np.bincount(block.indices, weights=per_edge)
        nz = np.flatnonzero(s)
        return pa.table({"dst": pa.array(nz, pa.int64()),
                         "val": pa.array(s[nz], pa.float64())})

    def gather(self, msgs_ds, mode: str, g) -> np.ndarray:
        if mode == "dense":
            return gather_dense(msgs_ds, g.n, op="sum")
        arrs = gather_kv_shuffle(msgs_ds, ["dst"], "val", "sum")
        acc = np.zeros(g.n, dtype=np.float64)
        acc[arrs["dst"].astype(np.int64)] = arrs["val"]
        return acc

    def prefers_tasks(self, g) -> bool:
        # dense Dataset gather wins at small V (driver vector sum is
        # trivial), but the driver reduce is a SERIAL term that caps
        # scaling — above ~200k vertices the task exchange's parallel
        # per-range reduce is faster at every CPU count (measured at
        # 360k/10M: 2.26 s vs 2.32 s on 2 CPUs, 1.26 s vs 1.54 s on 8)
        return g.n >= 200_000

    def tasks_step(self, g, state: dict, it: int):
        """Task-exchange backend: dense contribution slices reduced per
        destination range (engine/exchange.py)."""
        from hedonic_ray.engine.exchange import numeric_exchange_step

        agg = numeric_exchange_step(g, state["rank"], mode="rank_contrib")
        return self.apply(state, agg, g, it)

    def apply(self, state: dict, agg: np.ndarray, g, it: int):
        rank = state["rank"]
        d, n = self.damping, g.n
        dangling = rank[g.out_degree == 0].sum()
        new = (1.0 - d) / n + d * (agg + dangling / n)
        delta = np.abs(new - rank)
        active = int((delta > self.tol).sum())
        return {"rank": new}, active, {"l1_diff": float(delta.sum())}


def pagerank(g, *, damping: float = 0.85, max_iters: int = 100, tol: float = 1e-12,
             gather: str = "auto", checkpoint_dir: str | None = None,
             run_id: str | None = None, checkpoint_every: int = 5,
             resume: bool = False) -> RunResult:
    """Run PageRank to convergence; ``result.state['rank']`` is the
    (n,) rank vector (sums to 1)."""
    algo = PageRankStep(damping=damping, tol=tol)
    return run_supersteps(g, algo, max_iters=max_iters, gather=gather,
                          checkpoint_dir=checkpoint_dir, run_id=run_id,
                          checkpoint_every=checkpoint_every, resume=resume)


class PersonalizedPageRankStep(PageRankStep):
    """PPR: teleport and dangling mass go to the seed distribution
    ``p`` instead of uniform 1/n (random walk with restart — the
    standard seeded relevance / recommender primitive):

        r' = (1-d)·p + d·(contrib + dangling_mass·p)

    Same scatter/gather as PageRank; only init and apply differ."""

    def __init__(self, p: np.ndarray, damping: float = 0.85,
                 tol: float = 1e-12):
        super().__init__(damping=damping, tol=tol)
        self.p = np.asarray(p, dtype=np.float64)

    def init_state(self, g) -> dict:
        return {"rank": self.p.copy()}

    def apply(self, state: dict, agg: np.ndarray, g, it: int):
        rank = state["rank"]
        d = self.damping
        dangling = rank[g.out_degree == 0].sum()
        new = (1.0 - d) * self.p + d * (agg + dangling * self.p)
        delta = np.abs(new - rank)
        active = int((delta > self.tol).sum())
        return {"rank": new}, active, {"l1_diff": float(delta.sum())}


def personalized_pagerank(g, seeds: np.ndarray, *, damping: float = 0.85,
                          max_iters: int = 100, tol: float = 1e-12,
                          gather: str = "auto") -> RunResult:
    """PPR from a uniform distribution over ``seeds``;
    ``result.state['rank']`` sums to 1."""
    seeds = np.asarray(seeds, dtype=np.int64)
    if not len(seeds):
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    p = np.zeros(g.n, dtype=np.float64)
    p[seeds] = 1.0 / len(seeds)
    algo = PersonalizedPageRankStep(p, damping=damping, tol=tol)
    return run_supersteps(g, algo, max_iters=max_iters, gather=gather)
