"""Closed-form tiny graphs (FIXTURES.md F4) and helpers.

Shapes from the reference's toy figure
(scripts/plot/paper_plots/toy_example.py:10-197: T-graph, 5-path,
8-cycle) and robustness example (scripts/robustness/plot.py); the exact
equilibrium α-ranges below were verified by exhaustive enumeration with
the igraph-free oracle (tests/oracles.py) over all partitions — they
are closed-form ground truth for the engine's equilibrium analytics.
"""

from __future__ import annotations

import numpy as np

# T graph: 1 is the hub of leaves 0, 2 and chain 3-4-5
T_EDGES = [(0, 1), (1, 2), (1, 3), (3, 4), (4, 5)]
T_PART_ALL = [0, 0, 0, 1, 1, 1]       # equilibrium for α ∈ [0, 1]
T_PART_A0 = [0, 0, 0, 0, 1, 1]        # equilibrium ONLY at α = 0
T_PART_A1 = [0, 1, 1, 1, 0, 0]        # equilibrium ONLY at α = 1
T_PART_WINDOW = [0, 0, 1, 0, 0, 0]    # equilibrium only for α ∈ [0.2, 0.325]

PATH5_EDGES = [(0, 1), (1, 2), (2, 3), (3, 4)]
PATH5_ALL = [0, 0, 0, 1, 1]           # equilibrium for α ∈ [0, 1]
PATH5_HALF = [0, 0, 1, 1, 2]          # equilibrium for α ∈ [0.5, 1]

CYCLE8_EDGES = [(i, (i + 1) % 8) for i in range(8)]
CYCLE8_HALVES = [0] * 4 + [1] * 4     # equilibrium for α ∈ [0, 1]
CYCLE8_ALT = [i % 2 for i in range(8)]  # never an equilibrium

TWO_TRI_EDGES = [(0, 4), (0, 5), (1, 2), (1, 3), (2, 3), (2, 4), (2, 5),
                 (3, 4), (3, 5), (4, 5)]
TWO_TRI_PART = [0, 1, 1, 1, 0, 0]     # robust partition example


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
    return build_link_graph(edges_from_numpy(arr), n, directed=directed,
                            num_parts=num_parts)
