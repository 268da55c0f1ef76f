"""Property-based tests (hypothesis) for the exchange-layer kernels
whose correctness arguments rely on non-obvious invariants: the
sort-based boundary-key pair counter and the substring window
extraction."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=0, max_size=300),
       st.integers(1, 6))
def test_packed_pair_counts_matches_counter(pairs, parts):
    """_packed_pair_counts == collections.Counter for ANY multiset of
    pairs and ANY partitioning (the boundary-key exception stream must
    make block-local partial counts exact)."""
    import ray.data as rd
    from collections import Counter

    from hedonic_ray.ops.dedup import _packed_pair_counts

    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    ds = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
    if len(pairs):
        ds = ds.repartition(min(parts, len(pairs)))
    out = _packed_pair_counts(ds).take_all()
    got = {(r["a"], r["b"]): r["i"] for r in out}
    assert got == dict(Counter(pairs))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                               max_codepoint=126),
                        min_size=0, max_size=120),
                min_size=1, max_size=30))
def test_substring_dup_counts_matches_python_sets(texts):
    """substring_dup_counts == the direct Python set computation for
    arbitrary ASCII corpora (window extraction from Arrow buffers,
    per-batch distinct, sort-boundary counting — all at once)."""
    import ray.data as rd

    from hedonic_ray.ops.dedup import substring_dup_counts

    L = 8
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = {r["doc_id"]: r["n_dup_windows"] for r in substring_dup_counts(
        rd.from_arrow(t).repartition(min(3, len(texts))), L=L).take_all()}

    wins = [set(s.encode()[i:i + L].decode("latin1")
                for i in range(len(s.encode()) - L + 1)) for s in texts]
    exp = {}
    for i, wi in enumerate(wins):
        others = set().union(*(w for j, w in enumerate(wins) if j != i)) \
            if len(wins) > 1 else set()
        c = len(wi & others)
        if c:
            exp[i] = c
    assert out == exp


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.integers(0, 30), min_size=0, max_size=12),
                min_size=1, max_size=8),
       st.integers(0, 7), st.integers(1, 8))
def test_ordered_pairs_triangular_decode(segments, lo, width):
    """_ordered_pairs (the closed-form sqrt triangular decode that
    feeds triangles, truss, common-neighbors, RA and two-hop) must
    equal the itertools reference for ANY segment layout and ANY
    [lo, hi) sub-range."""
    from itertools import combinations

    from hedonic_ray.algos.triangles import _ordered_pairs

    segs = [sorted(s) for s in segments]
    indptr = np.zeros(len(segs) + 1, np.int64)
    np.cumsum([len(s) for s in segs], out=indptr[1:])
    indices = np.array([x for s in segs for x in s], np.int64)
    lo_u = min(lo, len(segs))
    hi_u = min(lo_u + width, len(segs))
    u, a, b = _ordered_pairs(indptr, indices, lo_u, hi_u)
    got = sorted(zip(u.tolist(), a.tolist(), b.tolist()))
    exp = sorted((v, x, y) for v in range(lo_u, hi_u)
                 for x, y in combinations(segs[v], 2))
    assert got == exp
