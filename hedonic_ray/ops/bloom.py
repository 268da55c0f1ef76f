"""Broadcast Bloom-filter pre-filter for distributed anti/semi joins.

The 100-TB join problem: a ``left_anti``/semi hash join shuffles the
ENTIRE big side even though only keys that (maybe) hit the small side
need the exchange.  A Bloom filter of the small side's keys, broadcast
once via ``ray.put`` (m/8 bytes for m bits — 16M keys at 10 bits/key is
~20 MB), lets every map task split the big side locally:

- anti-join:  bloom-MISS rows are DEFINITELY not in the small side →
  emitted straight to the output, no shuffle;
  bloom-HIT rows (true matches + false positives) go through the exact
  hash join.  Exchange volume drops from |big| to
  |matches| + fp_rate·|big| with NO correctness loss (Bloom filters
  have no false negatives).
- semi-join:  symmetric — misses are dropped locally.

Vectorized end to end: k=4 double-hashed probes (Kirsch–Mitzenmacher
2006: g_i = h1 + i·h2 — preserves the classic false-positive bound),
``np.bitwise_or.at`` to set bits, gather + AND to probe.  Default
``bits_per_key=12`` ⇒ fp ≈ 0.6 %.
"""

from __future__ import annotations

import numpy as np

from hedonic_ray.functions.hashing import hash_ints

_K_PROBES = 4


def _probe_positions(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """(k, n) bit positions for each key (double hashing)."""
    h1 = hash_ints(keys, seed=0x51ab)
    h2 = hash_ints(keys, seed=0xb100) | np.uint64(1)  # odd → full period
    i = np.arange(_K_PROBES, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :])
                % np.uint64(m_bits)).astype(np.int64)


def build_bloom(keys: np.ndarray, bits_per_key: int = 12) -> np.ndarray:
    """uint64-word Bloom filter of the int keys (≥ 64 bits total)."""
    keys = np.asarray(keys, dtype=np.int64)
    # m_bits MUST be a multiple of 64: the probe side recovers it as
    # len(words)·64, and build/probe must mod by the same modulus
    m_bits = -(-max(64, int(len(keys) * bits_per_key)) // 64) * 64
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(keys):
        pos = _probe_positions(keys, m_bits).ravel()
        np.bitwise_or.at(words, pos // 64,
                         np.uint64(1) << (pos % 64).astype(np.uint64))
    return words


def bloom_maybe_contains(words: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (false
    positives possible), False = DEFINITELY absent."""
    keys = np.asarray(keys, dtype=np.int64)
    if not len(keys):
        return np.zeros(0, dtype=bool)
    m_bits = len(words) * 64
    pos = _probe_positions(keys, m_bits)
    bit = (words[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
    return (bit == 1).all(axis=0)
