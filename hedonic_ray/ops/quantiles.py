"""Exact distributed quantiles by iterative histogram narrowing.

``exact_quantiles(ds, col, qs)`` returns, for each requested fraction
q, the k-th smallest value with k = ⌈q·N⌉ (1-based) — the PERCENTILE
as an exact dataset element, not an interpolation, so the SQL mirror
is ``row_number() OVER (ORDER BY col) = k``.

No counterpart in the reference repo; this is the standard
selection-at-scale primitive (distributed k-th order statistic).

Shape — selection WITHOUT a global sort: every round is ONE streaming
``map_batches`` pass over the input that bins each still-active
quantile's candidate interval into B equal-width bins (per-batch
``np.bincount`` partials, a (q, bin, count) combiner table far smaller
than the data), the driver locates the bin containing the target rank
and recurses into it.  Intervals shrink B× per round, so a handful of
passes replaces the all-to-all shuffle a sort-based rank would need;
when an interval's population falls under ``final_max`` (or its edges
stop strictly decreasing, e.g. massive duplicates), the survivors are
gathered and selected exactly.  All passes prune to the single column
at the read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

B = 64


def _interval_mask(v: np.ndarray, lo: float, hi: float, inclusive: bool):
    return (v >= lo) & ((v <= hi) if inclusive else (v < hi))


def exact_quantiles(ds, col: str, qs_e2: list[int], *,
                    final_max: int = 65_536,
                    max_rounds: int = 64) -> pa.Table:
    """(q_e2, value) rows — value is the exact ⌈q·N⌉-th smallest of
    ``ds[col]`` (doubles).  ``qs_e2`` are integer percents."""
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(Count(col, alias_name="n"),
                         Min(col, alias_name="mn"),
                         Max(col, alias_name="mx"))
    n = int(stats["n"])
    if n == 0:
        return pa.table({"q_e2": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    gmin, gmax = float(stats["mn"]), float(stats["mx"])

    # per quantile: target rank k (1-based), interval, ranks below lo
    active: dict[int, dict] = {}
    for q in qs_e2:
        k = max(1, -(-n * q // 100))  # ceil(n*q/100), exact ints
        active[q] = {"k": k, "lo": gmin, "hi": gmax, "inc": True,
                     "below": 0, "count_in": n}
    results: dict[int, float] = {}

    for _ in range(max_rounds):
        pend = {q: st for q, st in active.items() if q not in results}
        if not pend:
            break
        # finalize small / unsplittable intervals by exact gather
        small = {q: st for q, st in pend.items()
                 if st["count_in"] <= final_max
                 or len(np.unique(np.linspace(st["lo"], st["hi"], B + 1)))
                 < B + 1}
        if small:
            snap = [(q, st["lo"], st["hi"], st["inc"]) for q, st
                    in small.items()]

            def gather_small(t: pa.Table, snap=snap) -> pa.Table:
                v = t.column(col).to_numpy(zero_copy_only=False)
                qs_out, vals_out = [], []
                for q, lo, hi, inc in snap:
                    sel = v[_interval_mask(v, lo, hi, inc)]
                    qs_out.append(np.full(len(sel), q, np.int64))
                    vals_out.append(sel.astype(np.float64))
                return pa.table({
                    "q": np.concatenate(qs_out) if qs_out
                    else np.empty(0, np.int64),
                    "v": np.concatenate(vals_out) if vals_out
                    else np.empty(0, np.float64)})

            rows = {q: [] for q in small}
            for b in ds.select_columns([col]).map_batches(
                    gather_small, batch_format="pyarrow").iter_batches(
                    batch_size=262_144, batch_format="pyarrow"):
                qa = b.column("q").to_numpy()
                va = b.column("v").to_numpy()
                for q in small:
                    rows[q].append(va[qa == q])
            for q, st in small.items():
                vals = np.sort(np.concatenate(rows[q]))
                results[q] = float(vals[st["k"] - st["below"] - 1])
            pend = {q: st for q, st in pend.items() if q not in results}
            if not pend:
                continue

        snap = [(q, st["lo"], st["hi"], st["inc"]) for q, st in pend.items()]

        def hist(t: pa.Table, snap=snap) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False)
            qs_out, bins_out, cnt_out = [], [], []
            for q, lo, hi, inc in snap:
                sel = v[_interval_mask(v, lo, hi, inc)]
                if len(sel) == 0:
                    continue
                edges = np.linspace(lo, hi, B + 1)
                idx = np.clip(np.searchsorted(edges, sel, side="right") - 1,
                              0, B - 1)
                c = np.bincount(idx, minlength=B)
                nz = np.flatnonzero(c)
                qs_out.append(np.full(len(nz), q, np.int64))
                bins_out.append(nz.astype(np.int64))
                cnt_out.append(c[nz].astype(np.int64))
            return pa.table({
                "q": np.concatenate(qs_out) if qs_out
                else np.empty(0, np.int64),
                "bin": np.concatenate(bins_out) if bins_out
                else np.empty(0, np.int64),
                "cnt": np.concatenate(cnt_out) if cnt_out
                else np.empty(0, np.int64)})

        acc = {q: np.zeros(B, dtype=np.int64) for q in pend}
        for b in ds.select_columns([col]).map_batches(
                hist, batch_format="pyarrow").iter_batches(
                batch_size=262_144, batch_format="pyarrow"):
            qa = b.column("q").to_numpy()
            ba = b.column("bin").to_numpy()
            ca = b.column("cnt").to_numpy()
            for q in pend:
                m = qa == q
                np.add.at(acc[q], ba[m], ca[m])
        for q, st in pend.items():
            cum = np.cumsum(acc[q])
            j = int(np.searchsorted(cum, st["k"] - st["below"]))
            edges = np.linspace(st["lo"], st["hi"], B + 1)
            st["below"] += int(cum[j - 1]) if j > 0 else 0
            st["inc"] = st["inc"] and (j == B - 1)
            st["lo"], st["hi"] = float(edges[j]), float(edges[j + 1])
            st["count_in"] = int(acc[q][j])
    else:
        missing = [q for q in active if q not in results]
        raise RuntimeError(f"quantile narrowing did not converge: {missing}")

    qs_sorted = sorted(results)
    return pa.table({"q_e2": pa.array(qs_sorted, pa.int64()),
                     "value": pa.array([results[q] for q in qs_sorted],
                                       pa.float64())})
