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


def maximal_independent_set(g, *, rounds: int = 12):
    """Run ``rounds`` Luby rounds; returns int64 arrays
    ``(status, decided_round)`` — status ∈ {1 in-MIS, −1 excluded,
    0 undecided}, decided_round 1-based (0 if undecided)."""
    import ray

    from hedonic_ray.algos.kcore import masked_neighbor_count
    from hedonic_ray.algos.matching import masked_neighbor_min

    if g.directed:
        raise ValueError("maximal_independent_set needs an undirected graph")
    n = g.n
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
