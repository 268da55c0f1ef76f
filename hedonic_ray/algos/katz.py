"""Katz centrality over the directed CSR link graph, exact integers.

Not in the reference repo (its algorithms are community games;
``/root/reference/hedonic/__init__.py`` has no centralities) — Katz
(1953) is the classic walk-weighted companion of PageRank/HITS on
hyperlink graphs and extends the north-rule superstep loop family.

Radius-capped Katz with attenuation ``β = 1/beta_inv``:

    katz(v) = Σ_{k=1..K} β^k · walks_k(v),
    walks_k(v) = #directed walks of length k ENDING at v
               = Σ_{u→v} walks_{k-1}(u),   walks_0 ≡ 1.

Reported as the EXACT rational ``(katz_num, katz_den)`` over the
common denominator ``katz_den = beta_inv^K``:

    katz_num(v) = Σ_{k=1..K} beta_inv^(K-k) · walks_k(v)

— every quantity is an int64 walk count times an integer weight, so
the SQL oracle is an unrolled join chain with zero float rounding
(the same all-integer posture as the HITS / hedonic-certificate
queries).  Each superstep is one ``A^T x`` push over the CSR blocks,
shared with HITS (`algos/hits.py:_push_auth` — sparse per-block
bincount combiner; only touched vertices travel).

Overflow is asserted, never silent: walk counts grow like λ_max^k,
so before each accumulation the remaining headroom is checked
against int64.
"""

from __future__ import annotations

import numpy as np

from hedonic_ray.algos.hits import _I64_MAX, _push_auth

SHARDS_MIN_VERTICES = 200_000  # same switch point as PageRank/LP: the
# Dataset backend's per-round O(V) state broadcast + driver merge wins
# below it, the resident shard state above


class _KatzVecSpec:
    """Vector-superstep spec (`engine/shards.py:VectorShardPool`):
    state = (walks, num) int64 slices resident in the shard actors;
    one round = sparse A^T push split by destination shard, then the
    weighted accumulation — bit-identical to the Dataset backend
    (tested) with no per-round O(V) driver traffic."""

    def __init__(self, iters: int, beta_inv: int):
        self.iters, self.beta_inv = iters, beta_inv

    def init_slice(self, lo, hi, n):
        return {"walks": np.ones(hi - lo, dtype=np.int64),
                "num": np.zeros(hi - lo, dtype=np.int64)}

    def scatter(self, state, lo, hi, indptr, indices, src):
        per_edge = np.repeat(state["walks"], np.diff(indptr))
        if len(per_edge) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        # exact int64 accumulation (the Dataset path's float bincount
        # is exact only below 2^53 — the shard path does better)
        u, inv = np.unique(indices, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, per_edge)
        return u.astype(np.int64), acc

    def merge(self, state, lo, hi, n, incoming, rnd):
        agg = np.zeros(hi - lo, dtype=np.int64)
        for dst, val in incoming:
            if len(dst):
                agg[dst - lo] += val
        k = rnd + 1
        w = self.beta_inv ** (self.iters - k)
        top = int(agg.max(initial=0))
        # per-shard asserts protect exactly this shard's elements —
        # same guard messages as the Dataset backend
        assert top <= (_I64_MAX - int(state["num"].max(initial=0))) \
            // max(w, 1), \
            "int64 Katz overflow: lower iters or raise beta_inv"
        assert top < _I64_MAX // max(n, 1), \
            "int64 Katz overflow on the next push: lower iters"
        state["walks"] = agg
        state["num"] += w * agg
        return {"active": 1 if k < self.iters else 0}


def katz_centrality(g, *, iters: int = 4, beta_inv: int = 4,
                    backend: str = "auto"):
    """Exact-integer radius-``iters`` Katz numerators of the DIRECTED
    CSR graph ``g``; returns ``(num, den)`` with ``num`` an int64
    vector and ``den = beta_inv ** iters``.

    ``backend="auto"`` picks the resident-shard-state path
    (`engine/shards.py:VectorShardPool`) above ``SHARDS_MIN_VERTICES``
    or under ``HEDONIC_RAY_FORCE_SCALE``, else the Dataset push loop;
    both are bit-identical (tested)."""
    if iters < 1:
        raise ValueError("katz_centrality needs iters >= 1")
    den = beta_inv ** iters
    if backend == "auto":
        from hedonic_ray.context import force_scale

        backend = "shards" if (force_scale() or
                               g.n >= SHARDS_MIN_VERTICES) else "dataset"
    if backend == "shards":
        from hedonic_ray.engine.shards import run_vector_supersteps

        pool = run_vector_supersteps(g, _KatzVecSpec(iters, beta_inv),
                                     rounds=iters)
        return pool.collect("num"), den
    walks = np.ones(g.n, dtype=np.int64)
    num = np.zeros(g.n, dtype=np.int64)
    for k in range(1, iters + 1):
        walks = _push_auth(g, walks)
        w = beta_inv ** (iters - k)
        hi = int(walks.max(initial=0))
        # this step's weighted add must fit, and the NEXT push can
        # multiply by at most n (total in-degree bound)
        assert hi <= (_I64_MAX - int(num.max(initial=0))) // max(w, 1), \
            "int64 Katz overflow: lower iters or raise beta_inv"
        assert hi < _I64_MAX // max(g.n, 1), \
            "int64 Katz overflow on the next push: lower iters"
        num += w * walks
    return num, den
