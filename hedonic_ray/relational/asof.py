"""Distributed backward as-of join (an operator Ray Data lacks).

For every left row, find the single right row with the same key and
the greatest right time ≤ the left time (ties on time broken by
smallest right id — deterministic, so the result is SQL-oracle
checkable against a window-function rewrite).

Ray-Data-first shape: both sides are tagged into ONE common schema and
unioned, so the operator costs exactly one hash exchange
(``groupby(key)``) that co-locates each key's left and right rows;
the per-key kernel is vectorized numpy (lexsort the right side once,
one ``searchsorted`` for all left rows of the key).  Partitioning
assumption: a single key's rows fit in one group task — for keys hot
enough to break that, pre-split by coarse time range and stitch the
last-right-row-per-range forward (documented, not needed at this
corpus' key cardinality).

The reference has no temporal joins; this is part of the
training-data extension surface (SURVEY §2.6 ordered per-key logic,
alongside sessionization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tag_table(t: pa.Table, key: str, time: str, rid: str,
               val: str | None, side: int) -> pa.Table:
    n = t.num_rows
    v = (t.column(val).cast(pa.float64()) if val is not None
         else pa.array(np.zeros(n)))
    return pa.table({
        "key": t.column(key).cast(pa.int64()),
        "t": t.column(time).cast(pa.int64()),
        "side": pa.array(np.full(n, side, dtype=np.int8)),
        "id": t.column(rid).cast(pa.int64()),
        "val": v,
    })


def _tag(ds, key: str, time: str, rid: str, val: str | None, side: int):
    return ds.map_batches(
        lambda t: _tag_table(t, key, time, rid, val, side),
        batch_format="pyarrow")


def _asof_group(g: dict) -> dict:
    side = g["side"]
    lmask = side == 0
    lid = g["id"][lmask].astype(np.int64)
    if len(lid) == 0:
        return {"l": np.empty(0, np.int64), "r": np.empty(0, np.int64),
                "rv": np.empty(0, np.float64)}
    lt = g["t"][lmask].astype(np.int64)
    rmask = ~lmask
    rt = g["t"][rmask].astype(np.int64)
    if len(rt) == 0:
        return {"l": lid, "r": np.full(len(lid), -1, np.int64),
                "rv": np.zeros(len(lid))}
    rid = g["id"][rmask].astype(np.int64)
    rv = g["val"][rmask].astype(np.float64)
    # t asc, id DESC → the last entry of a tied-time run is the
    # smallest id, which searchsorted(side="right")-1 then selects
    order = np.lexsort((-rid, rt))
    rt, rid, rv = rt[order], rid[order], rv[order]
    idx = np.searchsorted(rt, lt, side="right") - 1
    found = idx >= 0
    safe = np.clip(idx, 0, None)
    return {"l": lid,
            "r": np.where(found, rid[safe], np.int64(-1)),
            "rv": np.where(found, rv[safe], 0.0)}


def _range_group_fn(span: int, scale: float):
    def f(g: dict) -> dict:
        side = g["side"]
        lmask = side == 0
        lid = g["id"][lmask].astype(np.int64)
        if len(lid) == 0:
            return {"l": np.empty(0, np.int64), "n": np.empty(0, np.int64),
                    "sv": np.empty(0, np.int64)}
        lt = g["t"][lmask].astype(np.int64)
        rmask = ~lmask
        rt = g["t"][rmask].astype(np.int64)
        if len(rt) == 0:
            z = np.zeros(len(lid), np.int64)
            return {"l": lid, "n": z, "sv": z}
        order = np.argsort(rt, kind="stable")
        rt = rt[order]
        # floor to integer units BEFORE the prefix sum: the windowed
        # sums are then order-independent and bit-exact vs SQL
        rvi = np.floor(g["val"][rmask].astype(np.float64)[order]
                       * scale).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(rvi)))
        lo = np.searchsorted(rt, lt - span, side="left")
        hi = np.searchsorted(rt, lt, side="right")
        return {"l": lid, "n": (hi - lo).astype(np.int64),
                "sv": cum[hi] - cum[lo]}

    return f


def range_agg_backward(left_ds, right_ds, *, left_key: str, right_key: str,
                       left_time: str, right_time: str, left_id: str,
                       right_val: str, span: int, scale: float = 1.0):
    """Trailing range-join aggregate: for every left row, the count and
    (integer-scaled) value sum of the same-key right rows with time in
    the inclusive window ``[left_time - span, left_time]``.

    Same one-hash-exchange shape as :func:`asof_backward` (tag → union
    → ``groupby(key)``); the per-key kernel is two ``searchsorted``
    probes against a prefix-sum array, so a key with R right rows and
    L left rows costs O((R+L)·log R) regardless of window width — no
    pairwise fan-out materializes.  Returns columns ``l`` (left id),
    ``n`` (match count, int64) and ``sv`` (sum of
    ``floor(right_val · scale)``, int64; 0 when no match).
    Partitioning assumption: one key's rows fit in one group task
    (same caveat and mitigation as asof_backward).  A SELF join
    (``left_ds is right_ds``) emits both tag sets from one
    ``map_batches`` over a single scan instead of reading the fact
    table twice."""
    if left_ds is right_ds:
        def both(t: pa.Table) -> pa.Table:
            return pa.concat_tables([
                _tag_table(t, left_key, left_time, left_id, None, 0),
                _tag_table(t, right_key, right_time, right_time,
                           right_val, 1)])

        tagged = left_ds.map_batches(both, batch_format="pyarrow")
    else:
        tagged = _tag(left_ds, left_key, left_time, left_id, None, 0).union(
            _tag(right_ds, right_key, right_time, right_time, right_val, 1))
    return tagged.groupby("key").map_groups(
        _range_group_fn(int(span), float(scale)), batch_format="numpy")


def asof_backward(left_ds, right_ds, *, left_key: str, right_key: str,
                  left_time: str, right_time: str, left_id: str,
                  right_id: str, right_val: str | None = None):
    """(l=left id, r=matched right id or -1, rv=right val or 0.0).

    Time columns may be any type castable to int64 (timestamps cast to
    their epoch-µs representation, preserving order)."""
    tagged = _tag(left_ds, left_key, left_time, left_id, None, 0).union(
        _tag(right_ds, right_key, right_time, right_id, right_val, 1))
    return tagged.groupby("key").map_groups(_asof_group,
                                            batch_format="numpy")
