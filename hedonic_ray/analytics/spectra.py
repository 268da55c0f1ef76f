"""Per-community resolution-spectrum analytics + small helpers.

Reconstructs the reference's DBLP spectrum flow
(``/root/reference/scripts/example.py:124-185`` /
``scripts/resolution_spectrum.py``): for each ground-truth community,
build the indicator partition and evaluate the equilibrium fraction
across a resolution grid.  The per-community fan-out is a driver loop
over communities (each iteration is a distributed gather); work-slicing
replaces the reference's ``--first/--last`` flags with plain list
slicing, and resume-by-existing-output becomes skip-by-key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.analytics.hedonic_stats import (
    classify_satisfaction,
    community_to_partition,
    resolution_spectrum,
    vertex_stats,
    ALWAYS,
)
from hedonic_ray.functions.hashing import hash_ints


def generate_sequence(num: float, n: int) -> list[float]:
    """Midpoint-refined resolution grid (scripts/utils.py:240-250 —
    same recurrence, deterministic)."""
    if n < 3:
        raise ValueError("n must be at least 3")
    seq = [num, 0.0, 1.0]
    while len(seq) < n:
        last_two = seq[-2:]
        seq.append((last_two[0] + num) / 2)
        seq.append((last_two[1] + num) / 2)
    return sorted(seq[:n])


def limit_community_count(membership: np.ndarray, max_n: int) -> np.ndarray:
    """Clamp labels ≥ max_n to max_n − 1 (scripts/utils.py:229-238)."""
    return np.minimum(np.asarray(membership, dtype=np.int64), max_n - 1)


def membership_hash(membership: np.ndarray) -> int:
    """Stable hash of a membership vector — the distributed form of the
    reference's identical-partition dedup across stochastic runs
    (``tuple(partition)`` in a set, scripts/exp.py:97-99)."""
    h = hash_ints(np.asarray(membership, dtype=np.int64), seed=7)
    with np.errstate(over="ignore"):
        return int(h.cumsum(dtype=np.uint64)[-1])


def isolated_vertices(g) -> np.ndarray:
    """Degree-0 vertex ids (the reference deletes them and keeps the
    original id as ``label``, scripts/example.py:129-131; this engine
    keeps ids stable and lets callers filter)."""
    return np.flatnonzero(g.out_degree == 0)


def community_spectra(g, communities: list[list[int]],
                      resolutions=None) -> pa.Table:
    """Spectrum per community: (community_idx, size, robustness,
    mean_eq_fraction, min_eq_fraction) over the resolution grid."""
    resolutions = (np.linspace(0, 1, 11) if resolutions is None
                   else np.asarray(resolutions, float))
    rows = []
    for idx, comm in enumerate(communities):
        mem = community_to_partition(g.n, comm)
        res, fracs, rob = resolution_spectrum(g, mem, resolutions)
        rows.append({
            "community_idx": idx,
            "size": len(set(comm)),
            "robustness": rob,
            "mean_eq_fraction": float(np.mean(fracs)),
            "min_eq_fraction": float(np.min(fracs)),
        })
    return pa.Table.from_pylist(rows)
