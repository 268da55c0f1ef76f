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

SHARDS_MIN_VERTICES = 200_000  # same switch point as Katz/LP: below it
# the Dataset backends' per-round O(V) broadcast is cheaper than the
# pool handshake; above it the rank vector should never leave the shards


class PageRankStep:
    def __init__(self, damping: float = 0.85, tol: float = 1e-12,
                 rank0: np.ndarray | None = None):
        self.damping = damping
        self.tol = tol
        self.rank0 = None if rank0 is None else \
            np.asarray(rank0, dtype=np.float64)

    def init_state(self, g) -> dict:
        if self.rank0 is not None:
            return {"rank": self.rank0.copy()}
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


class _PageRankVecSpec:
    """Vector-superstep spec (`engine/shards.py:VectorShardPool`): the
    rank vector stays RESIDENT in the shard actors — per round the
    driver ships only the ``(iteration, dangling_mass)`` pair and gets
    back three scalars per shard, replacing the Dataset/tasks
    backends' per-round ``ray.put(rank)`` O(V) broadcast + driver
    apply.  The global dangling mass is the one scalar coupling
    PageRank rounds that a sparse scatter cannot carry, so the custom
    driver loop (`_pagerank_shards`) threads it through the ``rnd``
    argument (`ApplyShard.vec_merge` passes it verbatim).

    ``seeds`` switches the apply to the personalized variant
    (teleport/dangling to the seed distribution instead of uniform);
    the seed id array ships once inside the pickled spec.  Arithmetic
    mirrors `PageRankStep.apply` / `PersonalizedPageRankStep.apply`
    term for term; only float summation ORDER differs (per-shard
    partials vs one driver vector), so backend parity is ~1e-15
    relative, not bit-exact — the gate's ×1e9 rounding absorbs it
    (tested, incl. under HEDONIC_RAY_FORCE_SCALE)."""

    def __init__(self, damping: float, tol: float,
                 seeds: np.ndarray | None = None,
                 rank0: np.ndarray | None = None):
        self.damping, self.tol = damping, tol
        self.seeds = None if seeds is None else \
            np.asarray(seeds, dtype=np.int64)
        # warm start (incremental refresh): ships O(V) ONCE inside the
        # pickled spec — the warm start IS a one-time O(V) transfer;
        # per-round traffic stays the scalar pair either way
        self.rank0 = None if rank0 is None else \
            np.asarray(rank0, dtype=np.float64)

    def init_slice(self, lo, hi, n):
        if self.seeds is None:
            r = (np.full(hi - lo, 1.0 / n, dtype=np.float64)
                 if self.rank0 is None else self.rank0[lo:hi].copy())
            return {"rank": r, "outdeg": None}
        p = np.zeros(hi - lo, dtype=np.float64)
        local = self.seeds[(self.seeds >= lo) & (self.seeds < hi)] - lo
        p[local] = 1.0 / len(self.seeds)
        return {"rank": p.copy(), "p": p, "outdeg": None}

    def scatter(self, state, lo, hi, indptr, indices, src):
        if state["outdeg"] is None:
            state["outdeg"] = np.diff(indptr)
        deg = state["outdeg"]
        local = state["rank"]
        w = np.divide(local, deg, out=np.zeros_like(local), where=deg > 0)
        per_edge = np.repeat(w, deg)
        if len(per_edge) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # sorted segmented float reduce (np.add.at is a scalar loop for
        # floats; reduceat is the vectorized per-destination partial)
        order = np.argsort(indices, kind="stable")
        sx = indices[order]
        sv = per_edge[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(sx)) + 1])
        return sx[starts].astype(np.int64), np.add.reduceat(sv, starts)

    def merge(self, state, lo, hi, n, incoming, rnd):
        it, dangling = rnd
        agg = np.zeros(hi - lo, dtype=np.float64)
        for dst, val in incoming:
            if len(dst):
                agg[dst - lo] += val
        d = self.damping
        rank = state["rank"]
        if self.seeds is None:
            new = (1.0 - d) / n + d * (agg + dangling / n)
        else:
            p = state["p"]
            new = (1.0 - d) * p + d * (agg + dangling * p)
        delta = np.abs(new - rank)
        state["rank"] = new
        deg = state["outdeg"]
        dang = new[deg == 0] if deg is not None else new
        return {"active": int((delta > self.tol).sum()),
                "l1_diff": float(delta.sum()),
                "dangling": float(dang.sum())}


def _pagerank_shards(g, spec: _PageRankVecSpec, max_iters: int,
                     rank0_dangling: float) -> RunResult:
    """Drive the resident-state spec: per round one ``pool.step`` call
    carrying two scalars down and three per shard up; the only O(V)
    driver transfer is the final ``collect``."""
    from hedonic_ray.engine.shards import VectorShardPool

    pool = VectorShardPool(g, spec)
    result = RunResult(state={})
    dangling = rank0_dangling
    for it in range(max_iters):
        t0 = time.perf_counter()
        stats = pool.step((it, dangling))
        dt = time.perf_counter() - t0
        active = sum(int(s["active"]) for s in stats)
        dangling = float(sum(s["dangling"] for s in stats))
        result.metrics.append({
            "iteration": it, "active_vertices": active,
            "edges_processed": g.m, "seconds": dt,
            "l1_diff": float(sum(s["l1_diff"] for s in stats))})
        result.iterations = it + 1
        if active == 0:
            result.converged = True
            break
    result.state["rank"] = pool.collect("rank")
    return result


def _wants_shards(g, gather: str) -> bool:
    if gather == "shards":
        return True
    if gather != "auto":
        return False
    from hedonic_ray.context import force_scale

    return force_scale() or g.n >= SHARDS_MIN_VERTICES


def pagerank(g, *, damping: float = 0.85, max_iters: int = 100, tol: float = 1e-12,
             gather: str = "auto", checkpoint_dir: str | None = None,
             run_id: str | None = None, checkpoint_every: int = 5,
             resume: bool = False,
             rank0: np.ndarray | None = None) -> RunResult:
    """Run PageRank to convergence; ``result.state['rank']`` is the
    (n,) rank vector (sums to 1).

    ``gather="auto"`` picks the resident-shard-state backend
    (`_PageRankVecSpec`) above ``SHARDS_MIN_VERTICES`` or under
    ``HEDONIC_RAY_FORCE_SCALE`` — unless checkpointing is requested,
    which stays on `run_supersteps` (the shard state is rebuilt from
    scratch per run; checkpoint/resume needs the driver-held state)."""
    if checkpoint_dir is None and _wants_shards(g, gather):
        r0 = (np.full(g.n, 1.0 / g.n, dtype=np.float64)
              if rank0 is None else np.asarray(rank0, np.float64))
        d0 = float(r0[g.out_degree == 0].sum())
        return _pagerank_shards(
            g, _PageRankVecSpec(damping, tol, rank0=rank0), max_iters, d0)
    algo = PageRankStep(damping=damping, tol=tol, rank0=rank0)
    return run_supersteps(g, algo, max_iters=max_iters,
                          gather="auto" if gather == "shards" else gather,
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
    ``result.state['rank']`` sums to 1.  Same backend auto-switch as
    `pagerank` (the seed list ships once inside the pickled spec)."""
    seeds = np.asarray(seeds, dtype=np.int64)
    if not len(seeds):
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    p = np.zeros(g.n, dtype=np.float64)
    p[seeds] = 1.0 / len(seeds)
    if _wants_shards(g, gather):
        d0 = float(p[g.out_degree == 0].sum())
        return _pagerank_shards(
            g, _PageRankVecSpec(damping, tol, seeds=seeds), max_iters, d0)
    algo = PersonalizedPageRankStep(p, damping=damping, tol=tol)
    return run_supersteps(g, algo, max_iters=max_iters, gather=gather)
