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


def bfs_distances(g, seeds, *, rounds: int | None = None) -> np.ndarray:
    """Hop distance from the nearest seed (``-1`` beyond ``rounds`` /
    unreachable).  ``rounds=None`` runs to the fixed point."""
    import ray

    if g.directed:
        raise ValueError("bfs_distances needs an undirected LinkGraph")
    seeds = np.asarray(seeds, dtype=np.int64)
    if seeds.size == 0:
        return np.full(g.n, UNREACHED, dtype=np.int64)
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
