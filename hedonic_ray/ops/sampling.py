"""Deterministic sampling for training-data pipelines.

Random sampling at 100 TB must be REPRODUCIBLE (re-runs, resumed runs
and downstream audits need the same sample) and must not coordinate
(no global state, no pass counting rows first).  Both paths gate each
row on a pure hash of its id — embarrassingly parallel, stable under
any partitioning, and a row's membership never depends on the rest of
the data:

``method="md5"`` — keep id iff ``md5_low64(str(id)) % den < num``.
Bit-identical to DuckDB's ``md5_number_lower(id::VARCHAR) % den``, so
sampled outputs are SQL-oracle-checkable end-to-end (same trick as
the simhash signatures, `ops/dedup.py:md5_low64`).  Python-loop md5
over the batch ids is the price of cross-engine parity.

``method="splitmix"`` — keep id iff ``splitmix64(id) % den < num``.
Fully vectorized numpy (the fast pure-engine path); same determinism
properties, just not reproducible inside SQL.

Rate accuracy: both hashes are uniform, so the realized fraction
concentrates at num/den with binomial fluctuation (tested).

The reference's sampling is ``random.sample``/NetworkX RNG state
(non-reproducible across processes); this surface replaces it per
SURVEY §2.6.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.functions.hashing import splitmix64


def _keep_mask(ids: np.ndarray, num: int, den: int, method: str) -> np.ndarray:
    if method == "splitmix":
        return (splitmix64(ids.astype(np.uint64)) % np.uint64(den)
                < np.uint64(num))
    if method == "md5":
        from hedonic_ray.ops.dedup import md5_low64

        return np.fromiter((md5_low64(str(int(i))) % den < num for i in ids),
                           dtype=bool, count=len(ids))
    raise ValueError(f"unknown sample method {method!r}")


def deterministic_sample(ds, *, id_col: str, rate_num: int, rate_den: int,
                         method: str = "splitmix"):
    """Filter ``ds`` to the deterministic ``rate_num/rate_den`` sample
    keyed on ``id_col``.  Pure per-batch filter — no shuffle, no
    global state; the same id is kept in every run and partition
    layout."""
    num, den = int(rate_num), int(rate_den)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = t.column(id_col).to_numpy().astype(np.int64)
        return t.filter(pa.array(_keep_mask(ids, num, den, method)))

    return ds.map_batches(f, batch_format="pyarrow")


def bottomk_sample(ds, *, id_col: str, k: int, method: str = "md5"):
    """FIXED-SIZE deterministic sample via the bottom-k sketch: keep
    the k rows with the smallest hash of their id.  Unlike the rate
    gate above, the output size is exactly k regardless of the input
    count (the "give me 10k examples" shape), still coordination-free:
    each task keeps its local bottom-k (the combiner) and a tiny
    driver merge keeps the global k — bottom-k of a union is the
    bottom-k of the parts' bottom-ks.  ``method="md5"`` is
    SQL-reproducible (``md5_number_lower``); ``"splitmix"`` is the
    vectorized engine-only path (A/B-tested for size + determinism)."""
    import pyarrow as pa
    from hedonic_ray.functions.hashing import splitmix64

    def local(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        if method == "md5":
            from hedonic_ray.ops.dedup import md5_low64

            h = np.fromiter((md5_low64(str(int(i))) for i in ids),
                            dtype=np.uint64, count=len(ids))
        elif method == "splitmix":
            h = splitmix64(ids.astype(np.uint64))
        else:
            raise ValueError(f"unknown bottomk_sample method {method!r}")
        order = np.lexsort((ids, h))[:k]  # (hash, id) total order
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "h": pa.array(h[order].astype(np.uint64))})

    parts = ds.map_batches(local, batch_format="pyarrow")
    rows = parts.take_all()  # ≤ k per input block
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    h = np.array([r["h"] for r in rows], dtype=np.uint64)
    order = np.lexsort((ids, h))[:k]
    return pa.table({id_col: pa.array(np.sort(ids[order]), pa.int64())})


def stratified_bottomk_sample(ds, *, id_col: str, stratum_col: str,
                              k: int, method: str = "md5"):
    """STRATIFIED fixed-size sample: bottom-k by id hash WITHIN each
    stratum (per-language / per-source balanced sampling — the
    training-data mix-control shape).  Same coordination-free bottom-k
    algebra as :func:`bottomk_sample`, keyed: each task keeps its
    local per-stratum bottom-k (the combiner), one grouped exchange of
    ≤ k·strata·blocks rows, and a per-stratum merge finishes.  Returns
    (stratum, id, h) rows, ≤ k per stratum."""
    import pyarrow as pa
    from hedonic_ray.functions.hashing import splitmix64

    def local(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        strata = t.column(stratum_col)
        if method == "md5":
            from hedonic_ray.ops.dedup import md5_low64

            h = np.fromiter((md5_low64(str(int(i))) for i in ids),
                            dtype=np.uint64, count=len(ids))
        elif method == "splitmix":
            h = splitmix64(ids.astype(np.uint64))
        else:
            raise ValueError(f"unknown stratified sample method {method!r}")
        # local per-stratum bottom-k: sort by (stratum, h, id), keep
        # the first k of each stratum run
        svals, sinv = np.unique(np.asarray(strata).astype(str),
                                return_inverse=True)
        order = np.lexsort((ids, h, sinv))
        sel_s = sinv[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], sel_s[1:] != sel_s[:-1]))) if len(sel_s) else \
            np.array([], int)
        seg = np.repeat(starts, np.diff(np.append(starts, len(sel_s))))
        rank = np.arange(len(sel_s)) - seg
        keep = order[rank < k]
        return pa.table({stratum_col: strata.take(pa.array(keep)),
                         id_col: pa.array(ids[keep], pa.int64()),
                         "h": pa.array(h[keep].astype(np.uint64))})

    def merge(group: dict) -> dict:
        h = group["h"]
        ids = group[id_col]
        order = np.lexsort((ids, h))[:k]
        return {stratum_col: group[stratum_col][order],
                id_col: ids[order].astype(np.int64),
                "h": h[order]}

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby(stratum_col).map_groups(merge, batch_format="numpy"))


def stratified_quota_sample(ds, *, id_col: str, stratum_col: str,
                            quotas: dict, method: str = "md5"):
    """QUOTA-APPLY sampling: bottom-``quotas[stratum]`` by id hash
    within each stratum — the execution half of temperature-resampled
    source mixing (`pipelines/textops.py:mixture_weights` computes the
    quotas; this draws them).  Same coordination-free bottom-k algebra
    as :func:`stratified_bottomk_sample` with a PER-STRATUM k: each
    task keeps its local per-stratum bottom-quota (the combiner, cut
    vectorized against the broadcast quota vector), one grouped
    exchange of ≤ Σ quotas·blocks rows, a per-stratum merge finishes.
    A stratum smaller than its quota keeps every row; a stratum absent
    from ``quotas`` contributes nothing.  Returns (stratum, id) rows."""
    import pyarrow as pa
    from hedonic_ray.functions.hashing import splitmix64

    def _hash(ids: np.ndarray) -> np.ndarray:
        if method == "md5":
            from hedonic_ray.ops.dedup import md5_low64

            return np.fromiter((md5_low64(str(int(i))) for i in ids),
                               dtype=np.uint64, count=len(ids))
        if method == "splitmix":
            return splitmix64(ids.astype(np.uint64))
        raise ValueError(f"unknown quota sample method {method!r}")

    def local(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        strata = np.asarray(t.column(stratum_col)).astype(str)
        h = _hash(ids)
        svals, sinv = np.unique(strata, return_inverse=True)
        q = np.array([int(quotas.get(s, 0)) for s in svals.tolist()],
                     dtype=np.int64)
        order = np.lexsort((ids, h, sinv))
        sel_s = sinv[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], sel_s[1:] != sel_s[:-1]))) if len(sel_s) else \
            np.array([], int)
        seg = np.repeat(starts, np.diff(np.append(starts, len(sel_s))))
        rank = np.arange(len(sel_s)) - seg
        keep = order[rank < q[sel_s]]
        return pa.table({stratum_col: pa.array(strata[keep]),
                         id_col: pa.array(ids[keep], pa.int64()),
                         "h": pa.array(h[keep].astype(np.uint64))})

    def merge(group: dict) -> dict:
        h = group["h"]
        ids = group[id_col]
        kq = int(quotas.get(str(group[stratum_col][0]), 0))
        order = np.lexsort((ids, h))[:kq]
        return {stratum_col: group[stratum_col][order],
                id_col: ids[order].astype(np.int64)}

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby(stratum_col).map_groups(merge, batch_format="numpy"))


def weighted_bottomk_sample(ds, *, id_col: str, weight_col: str, k: int):
    """WEIGHTED fixed-size priority sample: keep the k rows with the
    smallest ``md5_low64(str(id)) // max(weight, 2)`` — a size-biased
    bottom-k (double the weight ≈ double the inclusion odds) in the
    priority-sampling family (Duffield, Lund & Thorup 2007), kept
    INTEGER so it is bit-reproducible inside SQL (true
    Efraimidis–Spirakis ``u^(1/w)`` keys need float pow, which is
    engine-ordering-sensitive; this integer surrogate trades exact
    inclusion probabilities for cross-engine auditability — stated
    trade-off).  ``max(weight, 2)`` keeps the quotient under 2⁶³ so
    the priority rides as BIGINT in both engines.

    Same coordination-free algebra as :func:`bottomk_sample`: each
    task keeps its local bottom-k (the combiner), a ≤ k·blocks driver
    merge finishes.  Returns ``(id, w, priority)`` sorted by
    (priority, id)."""
    from hedonic_ray.ops.dedup import md5_low64

    def local(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        w = t.column(weight_col).to_numpy().astype(np.int64)
        h = np.fromiter((md5_low64(str(int(i))) for i in ids),
                        dtype=np.uint64, count=len(ids))
        pr = (h // np.maximum(w, 2).astype(np.uint64)).astype(np.int64)
        order = np.lexsort((ids, pr))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "w": pa.array(w[order], pa.int64()),
                         "priority": pa.array(pr[order], pa.int64())})

    rows = ds.map_batches(local, batch_format="pyarrow").take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    w = np.array([r["w"] for r in rows], dtype=np.int64)
    pr = np.array([r["priority"] for r in rows], dtype=np.int64)
    order = np.lexsort((ids, pr))[:k]
    return pa.table({id_col: pa.array(ids[order], pa.int64()),
                     "w": pa.array(w[order], pa.int64()),
                     "priority": pa.array(pr[order], pa.int64())})
