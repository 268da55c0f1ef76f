"""Closed-form tiny graphs (FIXTURES.md F4) and helpers.

Fixtures from the reference's published toy figure
(scripts/plot/paper_plots/toy_example.py:10-197, 0-indexed here) and
robustness example (scripts/robustness/plot.py).
"""

from __future__ import annotations

import numpy as np

# (edges, membership, alphas_in_equilibrium, alphas_not)
T_EDGES = [(0, 1), (1, 2), (1, 3), (3, 4), (4, 5)]
T_PART_A = [0, 1, 0, 1, 0, 1]            # equilibrium for α ∈ [0,1]
T_PART_B = [1, 0, 1, 0, 1, 0]            # equilibrium for α ∈ [0,0.4]
PATH5_EDGES = [(0, 1), (1, 2), (2, 3), (3, 4)]
PATH5_C = [0, 1, 0, 1, 0]                # equilibrium for α ∈ [0,1]
PATH5_D = [1, 0, 1, 0, 1]                # equilibrium for α ∈ [0,1/7]
CYCLE8_EDGES = [(i, (i + 1) % 8) for i in range(8)]
CYCLE8_E = [i % 2 for i in range(8)]     # equilibrium only at α = 1
TWO_TRI_EDGES = [(0, 4), (0, 5), (1, 2), (1, 3), (2, 3), (2, 4), (2, 5),
                 (3, 4), (3, 5), (4, 5)]
TWO_TRI_PART = [0, 1, 1, 1, 0, 0]        # robust partition example


def rand_edges(n: int, p: float, seed: int) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    out = []
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < p:
                out.append((u, v))
    return out


def make_graph(edges, n: int, *, directed: bool = False, num_parts: int = 3):
    from hedonic_ray.graph.build import build_link_graph, edges_from_numpy

    arr = np.array(edges, dtype=np.int64).reshape(-1, 2)
    if directed:
        return build_link_graph(edges_from_numpy(arr), n, directed=True,
                                num_parts=num_parts)
    return build_link_graph(edges_from_numpy(arr), n, directed=False,
                            num_parts=num_parts)
