"""Fixed-round distributed MAXIMAL INDEPENDENT SET (Luby's algorithm)
over the undirected CSR link graph.

Luby with DETERMINISTIC random priorities: vertex v's priority is
md5_low64(str(v)) (≡ DuckDB ``md5_number_lower``, so the SQL oracle
replays every round).  Per round, every undecided vertex whose
priority is a strict local minimum among its undecided neighbors
joins the MIS and its neighbors leave the graph — two broadcast pulls
over the CSR blocks per round (a masked neighbor MIN of the
priorities, then a masked neighbor COUNT of the new members), the
same no-exchange superstep posture as k-core / BFS / matching.
Adjacent minima are impossible under a strict total order, so the
result is independent by construction; with md5 priorities the
expected round count is O(log n) (the id-priority variant would need
Θ(n) rounds on a path — that is why the priorities are hashed).

A fixed ``rounds`` makes the result a pure function of
(graph, rounds); vertices still undecided at the cap are reported
with status 0, so the SQL oracle's equality covers the unconverged
case too.  Priorities are compared through the uint64→int64 sign-bit
flip (order-preserving bijection), matching the unsigned HUGEINT
order of ``md5_number_lower``.

MIS is the classic symmetry-breaking primitive (scheduling,
coloring, graph coarsening); the reference has no analog.
"""

from __future__ import annotations

import numpy as np

IN_MIS = 1
EXCLUDED = -1
UNDECIDED = 0


_PRIORITY_CACHE: dict[int, np.ndarray] = {}


def _priorities(n: int) -> np.ndarray:
    """md5_low64(str(v)) for v in [0, n), sign-bit-flipped to int64.
    Driver-side, cached per n (MIS + coloring on one graph pay the
    hash loop once) — at 10¹²-vertex scale this becomes a blockwise
    kernel over the vertex range (same loop, sharded)."""
    from hedonic_ray.ops.dedup import md5_low64

    if n not in _PRIORITY_CACHE:
        p = np.fromiter((md5_low64(str(v)) for v in range(n)),
                        dtype=np.uint64, count=n)
        _PRIORITY_CACHE[n] = (p ^ np.uint64(1 << 63)).view(np.int64)
    return _PRIORITY_CACHE[n]


SHARDS_MIN_VERTICES = 200_000  # same switch point as PageRank/LP/Katz


class _MisVecSpec:
    """Vector-superstep spec (`engine/shards.py:VectorShardPool`):
    status/decided slices resident in the shard actors; ONE Luby round
    = TWO supersteps (phase 0: push undecided priorities, per-dst min
    pre-combined per shard, merge = local minimum fold → ``new_in``;
    phase 1: push the new-member indicator, merge = exclusion +
    status/decided write).  Bit-identical to the Dataset backend
    (tested), including both of its early exits: phase-0 merge reports
    ``active = |new_in|`` (global 0 ⇔ the Dataset ``new_in.any()``
    break, nothing mutated yet) and phase-1 merge reports the
    remaining undecided count (global 0 ⇔ the ``und.any()`` break)."""

    _SENTINEL = np.iinfo(np.int64).max

    def init_slice(self, lo, hi, n):
        from hedonic_ray.ops.dedup import md5_low64

        p = np.fromiter((md5_low64(str(v)) for v in range(lo, hi)),
                        dtype=np.uint64, count=hi - lo)
        return {"p": (p ^ np.uint64(1 << 63)).view(np.int64),
                "status": np.zeros(hi - lo, np.int64),
                "decided": np.zeros(hi - lo, np.int64),
                "new_in": np.zeros(hi - lo, bool),
                "phase": 0}

    def scatter(self, state, lo, hi, indptr, indices, src):
        empty = np.empty(0, np.int64)
        if state["phase"] == 0:
            live = state["status"][src - lo] == UNDECIDED
            if not live.any():
                return empty, empty
            t_ = indices[live]
            vals = state["p"][src[live] - lo]
            u = np.unique(t_)
            best = np.full(len(u), self._SENTINEL, np.int64)
            np.minimum.at(best, np.searchsorted(u, t_), vals)
            return u.astype(np.int64), best
        live = state["new_in"][src - lo]
        if not live.any():
            return empty, empty
        u = np.unique(indices[live])
        return u.astype(np.int64), np.ones(len(u), np.int64)

    def merge(self, state, lo, hi, n, incoming, rnd):
        und = state["status"] == UNDECIDED
        if state["phase"] == 0:
            mn = np.full(hi - lo, self._SENTINEL, np.int64)
            for dst, val in incoming:
                if len(dst):
                    np.minimum.at(mn, dst - lo, val)
            state["new_in"] = und & (state["p"] < mn)
            state["phase"] = 1
            return {"active": int(state["new_in"].sum())}
        hit = np.zeros(hi - lo, bool)
        for dst, val in incoming:
            if len(dst):
                hit[dst - lo] = True
        new_in = state["new_in"]
        new_ex = und & ~new_in & hit
        state["status"][new_in] = IN_MIS
        state["status"][new_ex] = EXCLUDED
        state["decided"][new_in | new_ex] = rnd // 2 + 1
        state["new_in"] = np.zeros(hi - lo, bool)
        state["phase"] = 0
        return {"active": int((state["status"] == UNDECIDED).sum())}


def maximal_independent_set(g, *, rounds: int = 12, backend: str = "auto"):
    """Run ``rounds`` Luby rounds; returns int64 arrays
    ``(status, decided_round)`` — status ∈ {1 in-MIS, −1 excluded,
    0 undecided}, decided_round 1-based (0 if undecided).

    ``backend="auto"`` picks the resident-shard-state path
    (`engine/shards.py:VectorShardPool`, two supersteps per Luby
    round) above ``SHARDS_MIN_VERTICES`` or under
    ``HEDONIC_RAY_FORCE_SCALE``, else the Dataset pull loop; both
    backends are bit-identical (tested)."""
    import ray

    from hedonic_ray.algos.kcore import masked_neighbor_count
    from hedonic_ray.algos.matching import masked_neighbor_min

    if g.directed:
        raise ValueError("maximal_independent_set needs an undirected graph")
    n = g.n
    if backend == "auto":
        from hedonic_ray.context import force_scale

        backend = "shards" if (force_scale() or
                               n >= SHARDS_MIN_VERTICES) else "dataset"
    if backend == "shards":
        from hedonic_ray.engine.shards import run_vector_supersteps

        pool = run_vector_supersteps(g, _MisVecSpec(), rounds=2 * rounds)
        return pool.collect("status"), pool.collect("decided")
    p = _priorities(n)
    sentinel = np.iinfo(np.int64).max
    status = np.zeros(n, dtype=np.int64)
    decided = np.zeros(n, dtype=np.int64)
    for rnd in range(1, rounds + 1):
        und = status == UNDECIDED
        if not und.any():
            break
        vec = np.where(und, p, sentinel)
        mn = masked_neighbor_min(g, ray.put(vec), int(sentinel))
        new_in = und & (p < mn)
        if not new_in.any():
            break
        cnt = masked_neighbor_count(g, ray.put(new_in.astype(np.int64)))
        new_ex = und & ~new_in & (cnt > 0)
        status[new_in] = IN_MIS
        status[new_ex] = EXCLUDED
        decided[new_in | new_ex] = rnd
    return status, decided
