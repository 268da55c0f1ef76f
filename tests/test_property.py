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
@given(st.data())
def test_rank_grid_matches_brute_topk(data):
    """_rank_grid (the composite-int64 one-argpartition top-k that
    feeds knn_graph) must equal the per-row brute sort (score desc,
    id asc, sentinel-masked cells dropped) for ANY grid shape, any
    mask pattern, any k."""
    from hedonic_ray.ops.similarity import _KNN_MASK, _rank_grid

    n = data.draw(st.integers(1, 6))
    w = data.draw(st.integers(1, 8))
    k = data.draw(st.integers(1, 6))
    srcs = np.array(data.draw(st.lists(st.integers(0, 2**31 - 1),
                                       min_size=n, max_size=n,
                                       unique=True)), np.int64)
    cand = np.array([[data.draw(st.integers(0, 2**31 - 1))
                      for _ in range(w)] for _ in range(n)], np.int64)
    score = np.array([[data.draw(st.one_of(
        st.just(int(_KNN_MASK)), st.integers(-1_000_000, 1_000_000)))
        for _ in range(w)] for _ in range(n)], np.int64)

    out = _rank_grid(srcs, cand, score, k)
    got = list(zip(out.column("src").to_pylist(),
                   out.column("rank").to_pylist(),
                   out.column("nbr").to_pylist(),
                   out.column("score_e6").to_pylist()))
    exp = []
    for i in range(n):
        cells = sorted(((-score[i, j], cand[i, j]) for j in range(w)
                        if score[i, j] > _KNN_MASK))
        exp.extend((int(srcs[i]), r + 1, int(c), int(-s))
                   for r, (s, c) in enumerate(cells[:k]))
    exp.sort()
    assert sorted(got) == exp


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                               max_codepoint=126),
                        min_size=0, max_size=150),
                min_size=1, max_size=12),
       st.sampled_from([8, 16, 24, 32, 40, 48, 64]))
def test_substring_hash_mode_equals_exact_any_L(texts, L):
    """The 1-word hashed window exchange must agree with the exact
    L/8-word path for ANY L (multiple of 8) on arbitrary ASCII corpora
    — the multiplier derivation cannot depend on a fixed-size table."""
    import ray.data as rd

    from hedonic_ray.ops.dedup import substring_dup_counts

    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(min(3, len(texts)))
    exact = substring_dup_counts(ds, L=L, mode="exact").take_all()
    hashed = substring_dup_counts(ds, L=L, mode="hash").take_all()
    assert exact == hashed


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


@given(st.lists(st.integers(0, 30), min_size=0, max_size=300),
       st.integers(1, 12))
@settings(max_examples=200, deadline=None)
def test_mg_reduce_guarantees(values, k):
    """The Misra-Gries reduce must (a) keep at most k counters,
    (b) never OVERcount, (c) undercount by at most N/(k+1) per item,
    and (d) retain every item whose true count exceeds N/(k+1) —
    for any input multiset and any k."""
    from collections import Counter

    from hedonic_ray.ops.sketch import _mg_reduce

    v = np.array(values, dtype=np.int64)
    u, c = _mg_reduce(v.astype(str), np.ones(len(v), np.int64), k)
    true = Counter(v.astype(str).tolist())
    n = len(v)
    kept = dict(zip(u.tolist(), c.tolist()))
    assert len(kept) <= k
    bar = n / (k + 1)
    for item, cnt in kept.items():
        assert cnt <= true[item]                      # never overcount
        assert true[item] - cnt <= bar                # bounded undercount
    for item, tc in true.items():
        if tc > bar:
            assert item in kept                       # heavy items survive


@given(st.lists(st.lists(st.integers(0, 15), min_size=0, max_size=60),
                min_size=1, max_size=6),
       st.integers(1, 8))
@settings(max_examples=100, deadline=None)
def test_mg_reduce_merge_associativity_bounds(batches, k):
    """One-shot reduction of per-batch MG summaries (the driver merge)
    keeps the same guarantees as a direct reduce of the raw stream —
    the mergeable-summaries property the two-pass operator rests on."""
    from collections import Counter

    from hedonic_ray.ops.sketch import _mg_reduce

    parts_u, parts_c = [], []
    n = 0
    for b in batches:
        v = np.array(b, dtype=np.int64).astype(str)
        n += len(b)
        u, c = _mg_reduce(v, np.ones(len(v), np.int64), k)
        parts_u.append(u)
        parts_c.append(c)
    allu = np.concatenate([p for p in parts_u if len(p)]) if any(
        len(p) for p in parts_u) else np.array([], dtype=str)
    allc = np.concatenate([p for p in parts_c if len(p)]) if any(
        len(p) for p in parts_c) else np.array([], np.int64)
    u, c = _mg_reduce(allu, allc, k)
    true = Counter(x for b in batches for x in
                   np.array(b, dtype=np.int64).astype(str).tolist())
    kept = dict(zip(u.tolist(), c.tolist()))
    assert len(kept) <= k
    bar = n / (k + 1)
    for item, cnt in kept.items():
        assert cnt <= true[item]
    for item, tc in true.items():
        if tc > 2 * bar:   # merged error ≤ batch bar + merge bar
            assert item in kept
