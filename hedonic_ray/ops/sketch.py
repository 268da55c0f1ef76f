"""Distributed cardinality sketches (grouped distinct counts).

Two paths behind one entry point, :func:`grouped_distinct_count`:

``method="exact"`` — per-batch ``np.unique`` over packed (key, value)
pairs (a combiner: duplicate pairs INSIDE a batch never enter the
exchange), then ONE ``groupby(key)`` whose finalizer re-uniques the
per-batch-distinct values.  Exact at any scale; exchange volume is the
per-batch-distinct pair count, bounded by Σ_key |distinct values|
× #batches in the worst case.

``method="hll"`` — the 100 TB shape: HyperLogLog register PARTIALS per
(batch, key) (Flajolet et al. 2007; ``2^p`` uint8 registers), merged by
an elementwise-max groupby finalizer.  Exchange volume is
O(#keys × 2^p × #batches) bytes — INDEPENDENT of the value count — and
the merge is associative/commutative, so the result is deterministic
and identical under any partitioning (tested).  Estimates use the
standard bias-corrected raw estimator with the small-range
linear-counting correction; σ ≈ 1.04/√(2^p) ≈ 1.6 % at the default
p = 12 (4 KiB per key).

The reference has no sketches (its distinct counting is Counter-based,
/root/reference/hedonic/__init__.py); this is part of the
training-data extension surface (SURVEY §2.7 dedup/set-ops family).
The driver-gate query uses the exact path (SQL ``count(DISTINCT ..)``
oracle); the HLL path is pytest-gated (error bound + exact
merge-associativity), because an estimate is not SQL-reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.functions.hashing import splitmix64

_U64 = np.uint64


# ------------------------------------------------------------------ exact


def grouped_distinct_count(ds, *, key_col: str, val_col: str,
                           method: str = "exact", p: int = 12):
    """(key, n_distinct) — distinct ``val_col`` count per ``key_col``."""
    if method == "exact":
        return _exact_distinct(ds, key_col, val_col)
    if method == "hll":
        return hll_estimate(hll_partials(ds, key_col, val_col, p=p), p=p)
    raise ValueError(f"unknown grouped_distinct_count method {method!r}")


def _exact_distinct(ds, key_col: str, val_col: str, n_buckets: int = 64):
    """Two-stage exact distinct: the value space is hash-bucketed so
    NO single task ever holds all of a key's distinct values —
    stage 1 groups by (key, value-bucket) and counts distinct values
    inside the bucket; stage 2 sums the per-bucket counts (a tiny
    exchange: ≤ ``n_buckets`` rows per key).  Buckets partition the
    value space, so the bucket counts are disjoint and their sum is
    exact.  A hot key's work spreads over ``n_buckets`` tasks instead
    of one."""
    from ray.data.aggregate import Sum

    from hedonic_ray.functions.hashing import hash_strings

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        # distinct (key, value) rows within the batch — the combiner;
        # factorize both sides so any dtype (strings included) packs
        # into one int64 key
        uk, invk = np.unique(k, return_inverse=True)
        uv, invv = np.unique(v, return_inverse=True)
        sel = np.unique(invk.astype(np.int64) * len(uv) + invv)
        vv = uv[sel % len(uv)]
        if vv.dtype.kind in "iu":
            vh = vv.astype(np.uint64)
        elif vv.dtype.kind == "f":
            vh = vv.astype(np.float64).view(np.uint64)
        else:
            vh = hash_strings([str(x) for x in vv])
        bucket = (splitmix64(vh) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({key_col: pa.array(uk[sel // len(uv)]),
                         val_col: pa.array(vv),
                         "_bucket": pa.array(bucket)})

    def bucket_count(g: dict) -> dict:
        return {key_col: g[key_col][:1],
                "n_distinct": np.array([len(np.unique(g[val_col]))],
                                       dtype=np.int64)}

    per_bucket = (ds.select_columns([key_col, val_col])
                  .map_batches(partial, batch_format="pyarrow")
                  .groupby([key_col, "_bucket"])
                  .map_groups(bucket_count, batch_format="numpy"))
    return per_bucket.groupby(key_col).aggregate(
        Sum("n_distinct", alias_name="n_distinct"))


# ------------------------------------------------------------ HyperLogLog


def _rho_registers(vals: np.ndarray, p: int):
    """(register index, rank) per value: index = top p bits of the
    hash, rank = 1 + leading-zero count of the remaining 64−p bits."""
    h = splitmix64(np.asarray(vals).astype(np.uint64))
    idx = (h >> _U64(64 - p)).astype(np.int64)
    rest = (h << _U64(p)) | ((_U64(1) << _U64(p)) - _U64(1))  # pad low bits
    # leading zeros of rest via float64 exponent is unsafe past 2^53;
    # use a 64-step-free vectorized log2 on the top 32 bits, falling
    # back to the low half only when the top half is zero-padded away
    lz = np.zeros(len(rest), dtype=np.int64)
    top = (rest >> _U64(32)).astype(np.uint32)
    low = rest.astype(np.uint32)
    top_nz = top != 0
    lz[top_nz] = 31 - np.floor(np.log2(top[top_nz].astype(np.float64))
                               ).astype(np.int64)
    tz = ~top_nz
    lz[tz] = 63 - np.floor(np.log2(low[tz].astype(np.float64))
                           ).astype(np.int64)
    rank = lz + 1  # 1-based; padding guarantees rest != 0
    return idx, rank.astype(np.uint8)


def _batch_registers(keys: np.ndarray, vals: np.ndarray, p: int):
    """Per-key register arrays for one batch → (unique_keys, m×2^p
    uint8 matrix)."""
    uk, inv = np.unique(keys, return_inverse=True)
    idx, rank = _rho_registers(vals, p)
    m = np.zeros((len(uk), 1 << p), dtype=np.uint8)
    np.maximum.at(m, (inv, idx), rank)
    return uk, m


def _encode_registers(row: np.ndarray, width: int) -> bytes:
    """Dense 2^p-byte block, or — when a batch-key touched few
    registers — a SPARSE blob of uint32 ``idx<<8 | rank`` entries.
    Sparse blobs are at most ``width//2`` bytes (nnz ≤ width//8), so
    blob length distinguishes the encodings unambiguously."""
    nz = np.flatnonzero(row)
    if len(nz) <= width // 8:
        return ((nz.astype(np.uint32) << np.uint32(8))
                | row[nz].astype(np.uint32)).tobytes()
    return row.tobytes()


def _decode_registers(blob: bytes, width: int) -> np.ndarray:
    if len(blob) == width:
        return np.frombuffer(blob, dtype=np.uint8)
    ent = np.frombuffer(blob, dtype=np.uint32)
    row = np.zeros(width, dtype=np.uint8)
    row[(ent >> np.uint32(8)).astype(np.int64)] = (
        ent & np.uint32(0xFF)).astype(np.uint8)
    return row


def hll_partials(ds, key_col: str, val_col: str, *, p: int = 12):
    """(key, reg: binary) partial-register rows, one per (batch, key).
    Partials use the sparse encoding when a batch-key touched at most
    2^p/8 registers — the exchange then carries O(distinct values in
    batch) bytes instead of the fixed 2^p, which matters when the KEY
    domain is large (millions of keys × 4 KiB dense blocks)."""
    width = 1 << p

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                key_col: pa.array([], t.schema.field(key_col).type),
                "reg": pa.array([], pa.binary())})
        # keys pass through np.unique untyped (string keys work); only
        # the hashed VALUE needs a uint64 view — strings via the
        # stable SipHash, numerics via their int64 bit pattern
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        if v.dtype.kind in "iu":
            v = v.astype(np.uint64)
        elif v.dtype.kind == "f":
            v = v.astype(np.float64).view(np.uint64)
        else:
            from hedonic_ray.functions.hashing import hash_strings

            v = hash_strings([str(x) for x in v])
        uk, m = _batch_registers(k, v, p)
        return pa.table({key_col: pa.array(uk),
                         "reg": pa.array([_encode_registers(r, width)
                                          for r in m], pa.binary())})

    return ds.select_columns([key_col, val_col]).map_batches(
        f, batch_format="pyarrow")


def merge_registers(regs, width: int) -> np.ndarray:
    """Elementwise max over an iterable of (dense or sparse) register
    blobs."""
    out = np.zeros(width, dtype=np.uint8)
    for r in regs:
        np.maximum(out, _decode_registers(r, width), out=out)
    return out


def _estimate_from_registers(m: np.ndarray, p: int) -> float:
    """Bias-corrected HLL estimate with small-range linear counting."""
    n_reg = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / n_reg)
    e = alpha * n_reg * n_reg / np.sum(np.float64(2.0) ** -m.astype(np.int64))
    if e <= 2.5 * n_reg:
        zeros = int(np.sum(m == 0))
        if zeros:
            return n_reg * np.log(n_reg / zeros)
    return float(e)


def hll_estimate(partials_ds, *, p: int = 12, key_col: str | None = None):
    """Merge partial rows → (key, n_distinct_est int64).  The merge is
    an elementwise register max, so any grouping/association of the
    partials yields identical registers (and thus estimates)."""

    def final(g: dict) -> dict:
        kc = key_col or next(c for c in g if c != "reg")
        m = merge_registers(g["reg"], 1 << p)
        return {kc: g[kc][:1],
                "n_distinct_est": np.array(
                    [int(round(_estimate_from_registers(m, p)))],
                    dtype=np.int64)}

    kc = key_col
    if kc is None:
        kc = next(f.name for f in partials_ds.schema().base_schema
                  if f.name != "reg")
    return partials_ds.groupby(kc).map_groups(final, batch_format="numpy")
