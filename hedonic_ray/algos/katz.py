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


def katz_centrality(g, *, iters: int = 4, beta_inv: int = 4):
    """Exact-integer radius-``iters`` Katz numerators of the DIRECTED
    CSR graph ``g``; returns ``(num, den)`` with ``num`` an int64
    vector and ``den = beta_inv ** iters``."""
    if iters < 1:
        raise ValueError("katz_centrality needs iters >= 1")
    den = beta_inv ** iters
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
