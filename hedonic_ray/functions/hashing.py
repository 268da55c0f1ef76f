"""Stable, vectorized 64-bit hashes.

Process-stable (no PYTHONHASHSEED dependence) so shuffle keys, dedup
keys and fingerprints are reproducible across workers and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_U64 = np.uint64


def hash_strings(values) -> np.ndarray:
    """Stable uint64 hash of an array-like of strings (vectorized).

    Uses pandas' deterministic SipHash-based ``hash_array`` with the
    library-default fixed key — identical output in every process.
    """
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(_U64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — stable uint64→uint64 mixer (public domain
    constants, Steele et al.).  Vectorized; used to derive per-seed
    permutation hashes and to salt hot keys."""
    z = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        z += _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def hash_ints(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded stable uint64 hash of an integer array."""
    return splitmix64(np.asarray(values).astype(_U64) ^ splitmix64(np.full(1, seed, _U64)))


def combine_hashes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two uint64 hash arrays."""
    with np.errstate(over="ignore"):
        return splitmix64(a.astype(_U64) * _U64(0x100000001B3) ^ b.astype(_U64))
