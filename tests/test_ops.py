import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


WORDS = "the quick brown fox jumps over a lazy dog near the old river bank".split()


def _doc(seed, n=60):
    rng = np.random.default_rng(seed)
    return " ".join(rng.choice(WORDS, n))


def test_exact_dedup():
    from hedonic_ray.ops.dedup import exact_dedup

    texts = [_doc(1), _doc(2), _doc(1), _doc(3), _doc(2), _doc(1)]
    kept = sorted(r["doc_id"] for r in exact_dedup(_docs_ds(texts)).take_all())
    assert kept == [0, 1, 3]


def test_minhash_finds_planted_near_dups():
    from hedonic_ray.ops.dedup import minhash_dedup

    base = _doc(7, 120)
    mutated = base.split()
    mutated[5] = "changed"
    near = " ".join(mutated)  # ~99% shingle overlap
    texts = [base, _doc(8, 120), near, _doc(9, 120), base]
    comp, pairs = minhash_dedup(_docs_ds(texts), len(texts), threshold=0.6)
    # exact dup 0~4 and near-dup 0~2 must cluster; distinct docs must not
    assert comp[0] == comp[2] == comp[4]
    assert comp[1] != comp[0] and comp[3] != comp[0] and comp[1] != comp[3]


def test_minhash_estimate_close_to_exact_jaccard():
    import oracles  # noqa: F401  (path setup)
    from hedonic_ray.ops.dedup import MinHashSignatures, _word_shingles

    a = _doc(11, 200)
    w = a.split()
    w[10:20] = ["x"] * 10
    b = " ".join(w)
    sa, sb = set(_word_shingles(a, 3)), set(_word_shingles(b, 3))
    exact = len(sa & sb) / len(sa | sb)
    m = MinHashSignatures(num_perm=128)
    est = (m.signature(a) == m.signature(b)).mean()
    assert abs(est - exact) < 0.15


def test_simhash_pairs_near_dups():
    from hedonic_ray.ops.dedup import simhash_signatures, simhash_pairs

    base = _doc(21, 150)
    w = base.split()
    w[3] = "tweak"
    # doc 2 uses a disjoint vocabulary (simhash over a shared tiny vocab
    # is legitimately close for any two random docs)
    other = " ".join(f"tok{i}word{i * 7 % 13}" for i in range(80))
    texts = [base, " ".join(w), other, base]
    sigs = simhash_signatures(_docs_ds(texts)).materialize()
    rows = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(sigs).take_all()}
    assert rows.get((0, 3)) == 0  # identical docs
    assert (0, 2) not in rows and (2, 3) not in rows and (1, 2) not in rows


def test_exact_ngram_verify():
    from hedonic_ray.ops.dedup import verify_pairs_exact
    import ray.data as rd

    base = _doc(31, 100)
    texts = [base, base, _doc(32, 100)]
    pairs = rd.from_arrow(pa.table({"a": pa.array([0, 0], pa.int64()),
                                    "b": pa.array([1, 2], pa.int64())}))
    out = verify_pairs_exact(pairs, _docs_ds(texts), threshold=0.9).take_all()
    assert [(r["a"], r["b"]) for r in out] == [(0, 1)]
    assert out[0]["jaccard"] == 1.0


def _brute_ngram_pairs(texts, k=3, tnum=7, tden=10):
    """Independent oracle: python-set Jaccard over all pairs, same
    integer threshold/score arithmetic as the operator."""
    from hedonic_ray.ops.dedup import _strict_shingles

    sh = [_strict_shingles(t, k) for t in texts]
    out = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            i = len(sh[a] & sh[b])
            denom = len(sh[a]) + len(sh[b]) - i
            if denom > 0 and tden * i >= tnum * denom:
                out.append((a, b, i * 1_000_000_000 // denom))
    return out


def test_ngram_jaccard_exact_vs_brute():
    from hedonic_ray.ops.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(7)
    texts = []
    for s in range(12):
        texts.append(_doc(s, 40))
    # planted near-dups: copies with a few words perturbed
    for s in (0, 3, 5):
        w = texts[s].split()
        for j in rng.choice(len(w), 2, replace=False):
            w[j] = "PERTURBED"
        texts.append(" ".join(w))
    texts.append("one two")   # < k words: no grams, can never pair
    texts.append("")          # empty doc

    got = sorted((r["a"], r["b"], r["jacc_e9"]) for r in
                 ngram_jaccard_pairs(_docs_ds(texts), len(texts),
                                     method="broadcast").take_all())
    exp = _brute_ngram_pairs(texts)
    assert got == exp
    assert len(exp) >= 3  # the planted dups actually survive the threshold


def test_ngram_jaccard_join_equals_broadcast():
    from hedonic_ray.ops.dedup import ngram_jaccard_pairs

    texts = [_doc(s, 50) for s in range(8)]
    texts += [texts[1], texts[4] + " extra tail words here"]
    ds = _docs_ds(texts)
    a = sorted((r["a"], r["b"], r["jacc_e9"]) for r in
               ngram_jaccard_pairs(ds, len(texts), method="broadcast").take_all())
    b = sorted((r["a"], r["b"], r["jacc_e9"]) for r in
               ngram_jaccard_pairs(ds, len(texts), method="join").take_all())
    assert a == b and len(a) >= 1


def test_ngram_prefix_index_equals_full():
    """AllPairs prefix filter (index='prefix') is lossless: identical
    (a, b, jacc_e9) rows to the full inverted index, through BOTH
    verify paths, including exact-threshold and sub-threshold pairs."""
    from hedonic_ray.ops.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(13)
    texts = [_doc(s, 40) for s in range(12)]
    for s in (0, 2, 4, 7):  # planted near-dups at varying distances
        w = texts[s].split()
        for j in rng.choice(len(w), 1 + (s % 4), replace=False):
            w[j] = f"PERT{s}"
        texts.append(" ".join(w))
    texts.append(texts[3])    # exact duplicate (J = 1)
    texts.append("one two")   # < k words: no grams
    ds = _docs_ds(texts)
    full = sorted((r["a"], r["b"], r["jacc_e9"]) for r in
                  ngram_jaccard_pairs(ds, len(texts),
                                      method="broadcast").take_all())
    for method in ("broadcast", "join"):
        pre = sorted((r["a"], r["b"], r["jacc_e9"]) for r in
                     ngram_jaccard_pairs(ds, len(texts), method=method,
                                         index="prefix").take_all())
        assert pre == full, method
    assert len(full) >= 4


def test_asof_backward_vs_brute():
    import ray.data as rd
    from hedonic_ray.relational.asof import asof_backward

    rng = np.random.default_rng(5)
    n_l, n_r, n_k = 200, 60, 7
    lk = rng.integers(0, n_k, n_l).astype(np.int64)
    lt = rng.integers(0, 50, n_l).astype(np.int64)
    rk = rng.integers(0, n_k, n_r).astype(np.int64)
    rt = rng.integers(0, 50, n_r).astype(np.int64)  # duplicate times: tie-break exercised
    rv = rng.normal(size=n_r)
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk), "t": pa.array(lt),
        "lid": pa.array(np.arange(n_l, dtype=np.int64))}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(rk), "t": pa.array(rt),
        "rid": pa.array(np.arange(n_r, dtype=np.int64)), "v": pa.array(rv)}))
    out = {r["l"]: (r["r"], r["rv"]) for r in asof_backward(
        left, right, left_key="k", right_key="k", left_time="t",
        right_time="t", left_id="lid", right_id="rid",
        right_val="v").take_all()}
    assert len(out) == n_l
    for i in range(n_l):
        cand = [(rt[j], -j) for j in range(n_r)
                if rk[j] == lk[i] and rt[j] <= lt[i]]
        if not cand:
            assert out[i] == (-1, 0.0)
        else:
            j = -max(cand)[1]  # max time, then smallest rid
            assert out[i][0] == j and out[i][1] == rv[j]


def test_deterministic_sample_rate_and_stability():
    import ray.data as rd
    from hedonic_ray.ops.sampling import deterministic_sample

    n = 50_000
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64))})
    kept = []
    for parts in (4, 19):  # membership must not depend on partitioning
        ds = rd.from_arrow(t).repartition(parts)
        s = deterministic_sample(ds, id_col="id", rate_num=3, rate_den=10)
        kept.append(sorted(r["id"] for r in s.take_all()))
    assert kept[0] == kept[1]
    frac = len(kept[0]) / n
    assert abs(frac - 0.3) < 0.01  # binomial: σ ≈ 0.002 at n=50k
    # md5 mode agrees with an independent per-id recomputation
    from hedonic_ray.ops.dedup import md5_low64

    ds = rd.from_arrow(pa.table({"id": pa.array(
        np.arange(500, dtype=np.int64))}))
    got = sorted(r["id"] for r in deterministic_sample(
        ds, id_col="id", rate_num=1, rate_den=10, method="md5").take_all())
    exp = [i for i in range(500) if md5_low64(str(i)) % 10 < 1]
    assert got == exp


def test_grouped_distinct_exact_vs_brute():
    """Exact path with STRING keys, values duplicated across blocks."""
    import ray.data as rd
    from hedonic_ray.ops.sketch import grouped_distinct_count

    rng = np.random.default_rng(2)
    n = 2000
    key = np.array([f"k{j}" for j in rng.integers(0, 5, n)], dtype=object)
    val = rng.integers(0, 120, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": pa.array(list(key)),
                                 "v": pa.array(val)})).repartition(13)
    got = {r["g"]: r["n_distinct"] for r in grouped_distinct_count(
        ds, key_col="g", val_col="v").take_all()}
    for g in np.unique(key):
        assert got[str(g)] == len(np.unique(val[key == g])), g


def test_hll_distinct_bounds_and_partition_invariance():
    import ray.data as rd
    from hedonic_ray.ops.sketch import grouped_distinct_count

    rng = np.random.default_rng(4)
    # key 0: large cardinality (raw estimator); key 1: small (linear
    # counting); exact distinct counts computed independently
    k0 = rng.integers(0, 2_000_000, 60_000).astype(np.int64)
    k1 = rng.integers(0, 150, 5_000).astype(np.int64)
    key = np.concatenate([np.zeros(len(k0), np.int64),
                          np.ones(len(k1), np.int64)])
    val = np.concatenate([k0, k1])
    t = pa.table({"g": pa.array(key), "v": pa.array(val)})
    ests = []
    for parts in (3, 17):
        ds = rd.from_arrow(t).repartition(parts)
        est = {r["g"]: r["n_distinct_est"] for r in grouped_distinct_count(
            ds, key_col="g", val_col="v", method="hll").take_all()}
        ests.append(est)
    # merge is an elementwise register max → estimates identical under
    # ANY partitioning of the input
    assert ests[0] == ests[1]
    exact0, exact1 = len(np.unique(k0)), len(np.unique(k1))
    assert abs(ests[0][0] - exact0) / exact0 < 0.05   # σ ≈ 1.6% at p=12
    assert abs(ests[0][1] - exact1) / exact1 < 0.02   # linear-counting range

    # string keys AND string values go through the hll path too (the
    # documented method swap for e.g. event_type keys)
    # sparse partial encoding: a small batch-key blob must round-trip
    # to the same registers as dense (and be smaller than a block)
    from hedonic_ray.ops.sketch import (_batch_registers,
                                        _decode_registers,
                                        _encode_registers)

    few = rng.integers(0, 2**60, 40).astype(np.int64)
    _, m = _batch_registers(np.zeros(40, np.int64), few.astype(np.uint64), 12)
    blob = _encode_registers(m[0], 1 << 12)
    assert len(blob) < (1 << 12)  # actually sparse
    np.testing.assert_array_equal(_decode_registers(blob, 1 << 12), m[0])

    skey = np.array([f"t{j % 3}" for j in range(3000)], dtype=object)
    sval = np.array([f"u{j % 217}" for j in range(3000)], dtype=object)
    ds = rd.from_arrow(pa.table({"g": pa.array(list(skey)),
                                 "v": pa.array(list(sval))})).repartition(5)
    est = {r["g"]: r["n_distinct_est"] for r in grouped_distinct_count(
        ds, key_col="g", val_col="v", method="hll").take_all()}
    for g in ("t0", "t1", "t2"):
        exact = len({v for k, v in zip(skey, sval) if k == g})
        assert abs(est[g] - exact) / exact < 0.03, (g, est[g], exact)


def test_grouped_topk_vs_brute():
    """Combiner correctness: rows for one key spread over many blocks
    must still yield the global top-k (val DESC, id ASC ties)."""
    import ray.data as rd
    from hedonic_ray.relational.queries import grouped_topk

    rng = np.random.default_rng(3)
    n, k = 600, 4
    key = rng.integers(0, 9, n).astype(np.int64)
    val = rng.integers(0, 40, n).astype(np.float64)  # coarse: many ties
    rid = rng.permutation(n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": pa.array(key), "v": pa.array(val),
                                 "i": pa.array(rid)})).repartition(16)
    got = sorted((r["g"], r["rnk"], r["i"], r["v"]) for r in
                 grouped_topk(ds, key_col="g", val_col="v",
                              id_col="i", k=k).take_all())
    exp = []
    for g in np.unique(key):
        rows = sorted(((-val[j], rid[j]) for j in np.flatnonzero(key == g)))
        exp.extend((int(g), r + 1, int(i), -nv) for r, (nv, i)
                   in enumerate(rows[:k]))
    assert got == sorted(exp)


def test_range_agg_backward_vs_brute():
    import ray.data as rd
    from hedonic_ray.relational.asof import range_agg_backward

    rng = np.random.default_rng(7)
    n_l, n_r, n_k, span = 200, 120, 6, 10
    lk = rng.integers(0, n_k, n_l).astype(np.int64)
    lt = rng.integers(0, 60, n_l).astype(np.int64)
    rk = rng.integers(0, n_k, n_r).astype(np.int64)
    rt = rng.integers(0, 60, n_r).astype(np.int64)  # dup times: boundary inclusivity
    rv = rng.normal(size=n_r) * 10
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk), "t": pa.array(lt),
        "lid": pa.array(np.arange(n_l, dtype=np.int64))}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(rk), "t": pa.array(rt), "v": pa.array(rv)}))
    out = {r["l"]: (r["n"], r["sv"]) for r in range_agg_backward(
        left, right, left_key="k", right_key="k", left_time="t",
        right_time="t", left_id="lid", right_val="v",
        span=span, scale=100.0).take_all()}
    assert len(out) == n_l
    for i in range(n_l):
        hits = [j for j in range(n_r)
                if rk[j] == lk[i] and lt[i] - span <= rt[j] <= lt[i]]
        assert out[i][0] == len(hits), i
        assert out[i][1] == sum(int(np.floor(rv[j] * 100.0)) for j in hits), i


def test_distinct_pairs_packed_equals_groupby():
    import ray.data as rd
    from hedonic_ray.ops.dedup import distinct_pairs

    rng = np.random.default_rng(11)
    a = rng.integers(0, 40, 500).astype(np.int64)
    b = a + 1 + rng.integers(0, 5, 500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
    g = sorted((r["a"], r["b"]) for r in
               distinct_pairs(ds, method="groupby").take_all())
    p = sorted((r["a"], r["b"]) for r in
               distinct_pairs(ds, method="packed").take_all())
    assert g == p and len(g) == len(set(zip(a.tolist(), b.tolist())))


def test_ngram_jaccard_max_df_prunes():
    from hedonic_ray.ops.dedup import ngram_jaccard_pairs

    # every doc shares one hot gram; max_df below the corpus size drops
    # it from the index, removing pairs that only co-occur there
    texts = ["common shared gram " + _doc(s, 30) for s in range(6)]
    ds = _docs_ds(texts)
    full = ngram_jaccard_pairs(ds, len(texts), threshold_num=0,
                               threshold_den=1).take_all()
    pruned = ngram_jaccard_pairs(ds, len(texts), threshold_num=0,
                                 threshold_den=1, max_df=2).take_all()
    assert len(pruned) < len(full)


def _emb_ds(mat):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1).astype(np.float32)), mat.shape[1]),
    }))


def test_topk_cosine_matches_numpy():
    from hedonic_ray.ops.similarity import topk_cosine

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(200, 16)).astype(np.float32)
    q = mat[:2].astype(np.float64)
    out = topk_cosine(_emb_ds(mat), q, k=5)
    norm = mat.astype(np.float64)
    norm = norm / np.linalg.norm(norm, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cos = qn @ norm.T
    for qi in range(2):
        expected = np.argsort(-cos[qi], kind="stable")[:5]
        got = out.filter(np.array(out.column("query_id")) == qi)
        np.testing.assert_array_equal(got.column("vec_id").to_numpy(), expected)


def test_ivf_recall():
    from hedonic_ray.ops.similarity import ivf_topk, topk_cosine

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(8, 16)) * 4
    mat = np.concatenate([c + rng.normal(size=(50, 16)) for c in centers]
                         ).astype(np.float32)
    q = mat[[0, 77, 301]].astype(np.float64)
    exact = topk_cosine(_emb_ds(mat), q, k=5)
    approx = ivf_topk(_emb_ds(mat), q, k=5, n_clusters=8, nprobe=3)
    # recall@5 ≥ 0.8 on well-clustered data
    hits = 0
    for qi in range(3):
        e = set(exact.filter(np.array(exact.column("query_id")) == qi)
                .column("vec_id").to_pylist())
        a = set(approx.filter(np.array(approx.column("query_id")) == qi)
                .column("vec_id").to_pylist())
        hits += len(e & a)
    assert hits / 15 >= 0.8


def test_embedding_neardup():
    from hedonic_ray.ops.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(50, 16)).astype(np.float32)
    mat[7] = mat[3] * 1.5  # same direction → cosine 1
    out = embedding_neardup_pairs(_emb_ds(mat), threshold=0.999).take_all()
    assert {(r["a"], r["b"]) for r in out} == {(3, 7)}


def test_textstats_kernels():
    from hedonic_ray.ops.textstats import add_quality_scores, add_token_counts

    ds = add_token_counts(_docs_ds(["a bb ccc", "one, two!"]))
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert rows[0]["n_tokens"] == 3 and rows[1]["n_tokens"] == 2
    assert rows[1]["n_bpe_tokens"] == 4  # one , two !
    qs = sorted(add_quality_scores(_docs_ds(["aaa bbb ccc"])).take_all(),
                key=lambda r: r["doc_id"])
    assert qs[0]["n_chars_calc"] == 11
    assert qs[0]["mean_word_len"] == pytest.approx(11 / 3)


def test_langid_on_testdata_sample():
    import ray.data as rd
    from hedonic_ray.ops.textstats import add_lang_id

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    out = add_lang_id(docs).take_all()
    assert all(r["lang_pred"] in {"en", "de", "es", "fr", "zh", "und"}
               for r in out)


def test_fingerprint_deterministic_and_sensitive():
    from hedonic_ray.ops.textstats import Fingerprint

    fp = Fingerprint()
    a = _doc(41, 100)
    assert fp._fp(a) == fp._fp(a)
    assert fp._fp(a) != fp._fp(a + " extra")


def test_multimodal_roundtrip():
    import ray.data as rd
    from hedonic_ray.ops.multimodal import (
        DecodeMedia,
        decode_media,
        frame_sample,
        media_features,
        synth_media_table,
    )

    media = rd.from_arrow(synth_media_table(30))
    rows = sorted(decode_media(media).take_all(), key=lambda r: r["doc_id"])
    for r in rows:
        assert r["decoded"]
        assert r["width"] == 16 + (r["doc_id"] * 7) % 64
        assert r["frames"] == (1 + r["doc_id"] % 8 if r["doc_id"] % 3 == 2 else 1)
    feats = media_features(media).take_all()
    assert len(feats) == 30 and len(feats[0]["feature"]) == 16
    frames = frame_sample(media).take_all()
    assert all(r["frame"] % 2 == 0 for r in frames)
    with pytest.raises(NotImplementedError):
        DecodeMedia(fake=False)


def test_candidate_pairs_globally_distinct():
    """The same pair emitted by multiple LSH bands must appear ONCE in
    the returned dataset (global distinct, not per-batch)."""
    from hedonic_ray.ops.dedup import minhash_signatures, candidate_pairs

    base = _doc(51, 120)
    texts = [base, base, base]  # identical: every band buckets them
    sigs = minhash_signatures(_docs_ds(texts)).materialize()
    pairs = [(r["a"], r["b"]) for r in candidate_pairs(sigs).take_all()]
    assert sorted(pairs) == [(0, 1), (0, 2), (1, 2)]
    assert len(pairs) == len(set(pairs))


def test_verify_minhash_join_equals_broadcast():
    from hedonic_ray.ops.dedup import (
        minhash_signatures, candidate_pairs, verify_pairs_minhash)

    texts = [_doc(61, 100)] * 2 + [_doc(62, 100), _doc(63, 100)]
    sigs = minhash_signatures(_docs_ds(texts)).materialize()
    pairs = candidate_pairs(sigs).materialize()
    a = sorted((r["a"], r["b"], round(r["est_jaccard"], 9)) for r in
               verify_pairs_minhash(pairs, sigs, 0.5, method="broadcast").take_all())
    b = sorted((r["a"], r["b"], round(r["est_jaccard"], 9)) for r in
               verify_pairs_minhash(pairs, sigs, 0.5, method="join").take_all())
    assert a == b and len(a) >= 1


def test_embedding_neardup_ivf_equals_brute():
    """IVF-bucketed near-dup (no full-matrix broadcast) finds the same
    pairs as the all-pairs brute force on planted near-duplicates."""
    from hedonic_ray.ops.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(8)
    mat = rng.normal(size=(300, 16)).astype(np.float32)
    for i in range(0, 30, 3):  # plant near-dups
        mat[i + 1] = mat[i] + rng.normal(scale=0.01, size=16).astype(np.float32)
    ds = _emb_ds(mat)
    brute = sorted((r["a"], r["b"]) for r in embedding_neardup_pairs(
        ds, threshold=0.95, method="brute").take_all())
    ivf = sorted((r["a"], r["b"]) for r in embedding_neardup_pairs(
        ds, threshold=0.95, method="ivf", n_clusters=8, probes=2).take_all())
    assert len(brute) >= 10
    assert ivf == brute


def test_verify_exact_semi_equals_join():
    from hedonic_ray.ops.dedup import (
        minhash_signatures, candidate_pairs, verify_pairs_exact)

    texts = [_doc(71, 90)] * 2 + [_doc(72, 90), _doc(73, 90), _doc(71, 90)]
    docs = _docs_ds(texts)
    sigs = minhash_signatures(docs).materialize()
    pairs = candidate_pairs(sigs).materialize()
    a = sorted((r["a"], r["b"], round(r["jaccard"], 9)) for r in
               verify_pairs_exact(pairs, docs, method="semi").take_all())
    b = sorted((r["a"], r["b"], round(r["jaccard"], 9)) for r in
               verify_pairs_exact(pairs, docs, method="join").take_all())
    assert a == b and len(a) >= 3


def test_duplicate_clusters_driver_equals_distributed():
    import ray.data as rd
    from hedonic_ray.ops.dedup import duplicate_clusters

    rng = np.random.default_rng(17)
    n = 60
    pairs = pa.table({
        "a": pa.array(rng.integers(0, n - 1, 40), pa.int64()),
        "b": pa.array(rng.integers(1, n, 40), pa.int64()),
    })
    # enforce a < b
    import pyarrow.compute as pc
    lo = pc.min_element_wise(pairs.column("a"), pairs.column("b"))
    hi = pc.max_element_wise(pairs.column("a"), pairs.column("b"))
    keep = pc.not_equal(lo, hi)
    pairs = pa.table({"a": pc.filter(lo, keep), "b": pc.filter(hi, keep)})
    ds = rd.from_arrow(pairs)
    a = duplicate_clusters(ds, n, method="driver")
    b = duplicate_clusters(ds, n, method="distributed")
    np.testing.assert_array_equal(a, b)


def test_multimodal_resize():
    import ray.data as rd
    from hedonic_ray.ops.multimodal import (
        ResizeMedia, resize_media, synth_media_table)

    media = rd.from_arrow(synth_media_table(24))
    rows = sorted(resize_media(media, target=32).take_all(),
                  key=lambda r: r["doc_id"])
    for r in rows:
        w = 16 + (r["doc_id"] * 7) % 64
        h = 16 + (r["doc_id"] * 13) % 48
        m = max(w, h)
        assert r["width"] == max(1, w * 32 // m)
        assert r["height"] == max(1, h * 32 // m)
        assert max(r["width"], r["height"]) <= 32
        assert r["payload"][:4] == b"HRAY"
        # byte-exact payload: new header (same kind/frames), old body
        import struct

        from hedonic_ray.ops.multimodal import fake_payload

        kind = int(r["doc_id"]) % 3
        orig = fake_payload(int(r["doc_id"]), kind)
        frames = 1 if kind != 2 else 1 + r["doc_id"] % 8
        assert r["payload"] == (b"HRAY" + struct.pack(
            "<BHHH", kind, r["width"], r["height"], frames) + orig[11:])
    with pytest.raises(NotImplementedError):
        ResizeMedia(fake=False)


def test_repetition_signals_exact():
    """Hand-computed Gopher repetition signals, incl. the empty-doc,
    single-word and all-duplicate-lines edges (pure-Python oracle)."""
    import pyarrow as pa
    from hedonic_ray.ops.textstats import repetition_batch

    texts = ["x\nx\ny", "", "a b a b a b", "one two", "solo",
             "same\nsame\nsame\nsame"]
    got = repetition_batch(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).to_pylist()

    def oracle(t):
        lines = t.split("\n")
        dup = (len(lines) - len(set(lines))) * 10**9 // len(lines)
        w = t.split()
        bgs = [(w[i], w[i + 1]) for i in range(len(w) - 1)]
        top = 0
        if bgs:
            best = max(bgs.count(b) for b in set(bgs))
            top = best * 10**9 // len(bgs)
        return len(lines), dup, top

    for r, t in zip(got, texts):
        n_lines, dup, top = oracle(t)
        assert (r["n_lines"], r["dup_line_frac_e9"],
                r["top_bigram_frac_e9"]) == (n_lines, dup, top), t


def test_exact_quantiles_vs_numpy():
    """Multi-round histogram narrowing (final_max=8 forces real
    narrowing rounds) vs the numpy k-th order statistic, on skewed
    data with heavy duplicates."""
    import ray.data as rd
    from hedonic_ray.ops.quantiles import exact_quantiles

    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.lognormal(3, 2, 5000),
                           np.full(2000, 42.0),          # duplicate spike
                           rng.uniform(-5, 0, 1000)])
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(7)
    got = exact_quantiles(ds, "v", [1, 50, 90, 99], final_max=8)
    s = np.sort(vals)
    n = len(vals)
    for q, v in zip(got.column("q_e2").to_pylist(),
                    got.column("value").to_pylist()):
        k = max(1, -(-n * q // 100))
        assert v == s[k - 1], q


def test_exact_quantiles_all_equal_and_empty():
    import ray.data as rd
    from hedonic_ray.ops.quantiles import exact_quantiles

    ds = rd.from_arrow(pa.table({"v": np.full(100, 3.25)}))
    got = exact_quantiles(ds, "v", [50, 99], final_max=4)
    assert got.column("value").to_pylist() == [3.25, 3.25]
    empty = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert exact_quantiles(empty, "v", [50]).num_rows == 0


# ---------------------------------------------------------- bloom pre-filter


def test_bloom_no_false_negatives_and_low_fp():
    import numpy as np
    from hedonic_ray.ops.bloom import bloom_maybe_contains, build_bloom

    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 1 << 40, size=20_000))
    words = build_bloom(keys)
    assert bloom_maybe_contains(words, keys).all()  # no false negatives
    other = np.setdiff1d(rng.integers(0, 1 << 40, size=50_000), keys)
    fp = bloom_maybe_contains(words, other).mean()
    assert fp < 0.03, fp  # 12 bits/key, k=4 → ~0.6 %; generous bound


def test_bloom_empty_key_set():
    import numpy as np
    from hedonic_ray.ops.bloom import bloom_maybe_contains, build_bloom

    words = build_bloom(np.empty(0, np.int64))
    assert not bloom_maybe_contains(words, np.arange(100)).any()


def test_anti_join_bloom_path_equals_join_path():
    from hedonic_ray.relational.queries import customers_without_events

    sf = "/root/testdata/sf0.001"
    base = customers_without_events(sf, method="join").to_pandas()
    bloom = customers_without_events(sf, method="bloom").to_pandas()
    base = base.sort_values("c_mktsegment").reset_index(drop=True)
    bloom = bloom.sort_values("c_mktsegment").reset_index(drop=True)
    assert base.equals(bloom)


def test_normalized_dedup_collapses_variants():
    import ray.data as rd
    import pyarrow as pa
    from hedonic_ray.ops.dedup import normalized_exact_dedup

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["Hello, World!", "hello   world", "hello world.",
                          "different doc", "Different DOC"], pa.string()),
    })
    kept = sorted(r["doc_id"] for r in
                  normalized_exact_dedup(rd.from_arrow(t)).take_all())
    assert kept == [0, 3]


def test_bottomk_sample_methods_fixed_size_and_deterministic():
    import ray.data as rd
    import pyarrow as pa
    from hedonic_ray.ops.sampling import bottomk_sample

    t = pa.table({"doc_id": pa.array(list(range(1000)), pa.int64())})
    a = bottomk_sample(rd.from_arrow(t), id_col="doc_id", k=20,
                       method="splitmix")
    b = bottomk_sample(rd.from_arrow(t).repartition(7), id_col="doc_id",
                       k=20, method="splitmix")
    assert a.num_rows == 20
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()


def test_substring_dup_counts_exact_semantics():
    """Hand-checkable fixture: docs 0/1 share one 32-char span (3
    shared windows for a 34-char common region), doc 2 repeats a
    window INTERNALLY only (must not count), doc 3 is shorter than L
    (no windows), doc 4 is disjoint."""
    import ray.data as rd

    from hedonic_ray.ops.dedup import substring_dup_counts

    span = "the quick brown fox jumps over it"  # 33 chars -> 2 windows/owner
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "A" * 10 + span + "B" * 10,
            "C" * 7 + span + "D" * 3,
            ("x" * 32) + "q" + ("x" * 32),   # internal repeat only
            "tiny",
            "z" * 80,
        ]),
    })
    out = {r["doc_id"]: r["n_dup_windows"]
           for r in substring_dup_counts(
               rd.from_arrow(t).repartition(3), L=32).take_all()}
    # span has 33 chars -> 2 distinct 32-char windows shared by 0 and 1
    assert out == {0: 2, 1: 2}


def test_substring_dup_counts_hash_equals_exact():
    import ray.data as rd

    from hedonic_ray.ops.dedup import substring_dup_counts

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    exact = substring_dup_counts(ds, L=32, mode="exact").take_all()
    hashed = substring_dup_counts(ds, L=32, mode="hash").take_all()
    assert exact == hashed and len(exact) > 0


def test_substring_dup_counts_hash_wide_L():
    """Hash mode must work for ANY L (multiple of 8), not just ≤ 32 —
    the fixed 4-entry multiplier table used to IndexError at L=40."""
    import ray.data as rd

    from hedonic_ray.ops.dedup import substring_dup_counts

    span = "".join(chr(97 + ((i * 7 + 3) % 26)) for i in range(100))
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["A" * 9 + span + "B" * 9,
                          "C" * 5 + span + "D" * 5,
                          "z" * 120]),
    })
    for L in (40, 64):
        exact = substring_dup_counts(rd.from_arrow(t), L=L,
                                     mode="exact").take_all()
        hashed = substring_dup_counts(rd.from_arrow(t), L=L,
                                      mode="hash").take_all()
        assert exact == hashed and len(exact) == 2


def test_flat_words_whitespace_and_empties():
    """_flat_words must tokenize on \\s+ with empty tokens dropped —
    the rule every SQL oracle uses — so tabs/newlines/double/leading/
    trailing whitespace cannot silently diverge tf/ttr/tfidf from the
    oracles (ADVICE r3, medium)."""
    from hedonic_ray.ops.textstats import _flat_words

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["  a\tb\n\nc ", "x  y", ""])})
    flat, lens, doc_of = _flat_words(t, "text")
    assert flat.to_pylist() == ["a", "b", "c", "x", "y"]
    assert lens.tolist() == [3, 2, 0]
    assert doc_of.tolist() == [0, 0, 0, 1, 1]


def test_cohort_retention_semantics():
    """Two cohorts; user 1 active days 0,1,9 (offset 9 excluded),
    user 2 active day 0 only, user 3 cohorted a day later, active
    offsets 0 and 2."""
    import pandas as pd
    import ray.data as rd

    from hedonic_ray.relational import queries as rel

    day = 86_400_000_000
    rows = [(1, 0), (1, 1 * day), (1, 9 * day),
            (2, 5), (3, 1 * day), (3, 3 * day)]
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([ts for _, ts in rows], pa.timestamp("us")),
    })
    import tempfile, os, pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = rel.cohort_retention(d).to_pandas()
    got = list(out.itertuples(index=False, name=None))
    assert got == [("1970-01-01", 0, 2), ("1970-01-01", 1, 1),
                   ("1970-01-02", 0, 1), ("1970-01-02", 2, 1)]


def test_knn_graph_closed_form_and_methods_equal():
    """4 unit vectors in 2-D at angles 0, 30, 60, 90 degrees: each
    vector's nearest neighbor is its angular neighbor; rank-2 is the
    next one over.  Broadcast and IVF paths must agree exactly."""
    import ray.data as rd

    from hedonic_ray.ops.similarity import knn_graph

    ang = np.deg2rad([0.0, 30.0, 60.0, 90.0])
    vecs = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    t = pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t).repartition(2)
    out = knn_graph(ds, k=2)
    got = list(zip(out.column("src").to_pylist(),
                   out.column("rank").to_pylist(),
                   out.column("nbr").to_pylist()))
    cos30 = round(np.cos(np.deg2rad(30)) * 1e6)
    assert got == [(0, 1, 1), (0, 2, 2), (1, 1, 0), (1, 2, 2),
                   (2, 1, 1), (2, 2, 3), (3, 1, 2), (3, 2, 1)]
    assert out.column("score_e6")[0].as_py() == cos30
    ivf = knn_graph(rd.from_arrow(t).repartition(2), k=2, method="ivf")
    assert ivf.to_pydict() == out.to_pydict()


def test_knn_graph_ds_equals_broadcast_on_fixture():
    """The fully distributed bucketed self-join (knn_graph_ds, no
    driver-held corpus) must equal the broadcast path EXACTLY at full
    probe on the real fixture embeddings; at partial probe it keeps
    per-src result shape (≤ k rows, ranks contiguous from 1)."""
    import ray.data as rd

    from hedonic_ray.ops.similarity import knn_graph, knn_graph_ds

    def emb():
        return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    exact = knn_graph(emb(), k=5, method="broadcast")
    dist = (knn_graph_ds(emb(), k=5).to_pandas()
            .sort_values(["src", "rank"]).reset_index(drop=True))
    assert dist.to_dict("list") == exact.to_pandas().to_dict("list")

    part = (knn_graph_ds(emb(), k=5, nprobe=2).to_pandas()
            .sort_values(["src", "rank"]).reset_index(drop=True))
    g = part.groupby("src")["rank"]
    assert (g.max() <= 5).all() and (g.min() == 1).all()
    assert (g.max() == g.count()).all()


def test_moving_avg_vs_brute():
    import tempfile, os
    import pyarrow.parquet as pq

    from hedonic_ray.relational import queries as rel

    rng = np.random.default_rng(3)
    n = 400
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 9, n), pa.int64()),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(rng.integers(0, 10**9, n), pa.timestamp("us")),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = rel.user_moving_avg(d).to_pandas()
    got = {(r.user_id, r.event_id): r.mavg_e2
           for r in out.itertuples(index=False)}
    u = t.column("user_id").to_numpy()
    e = t.column("event_id").to_numpy()
    tsv = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
    v = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
    for uid in np.unique(u):
        idx = np.flatnonzero(u == uid)
        idx = idx[np.lexsort((e[idx], tsv[idx]))]
        for j, i in enumerate(idx):
            w = v[idx[max(0, j - 2):j + 1]]
            assert got[(uid, e[i])] == int(w.sum()) // len(w)
    assert len(got) == n


def test_skewness_matches_float_reference():
    """The integer-moment g1 must equal the straightforward float
    computation to ~1e-9 relative (both describe the same cents
    population)."""
    import tempfile, os
    import pyarrow.parquet as pq

    from hedonic_ray.relational import queries as rel

    rng = np.random.default_rng(2)
    n = 5000
    vals = np.round(rng.gamma(2.0, 7.0, n), 2)   # right-skewed
    t = pa.table({"event_type": pa.array(["a"] * n, pa.string()),
                  "value": pa.array(vals)})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = rel.event_value_skewness(d).to_pandas()
    v = np.rint(vals * 100)
    mu = v.mean()
    g1 = ((v - mu) ** 3).mean() / (((v - mu) ** 2).mean() ** 1.5)
    assert out.loc[0, "n"] == n
    assert abs(out.loc[0, "skew_e3"] - np.floor(1000 * g1)) <= 1
    assert out.loc[0, "skew_e3"] > 500  # gamma(2) is visibly right-skewed


def test_rank_ties_includes_all_tied_rows():
    import tempfile, os
    import pyarrow.parquet as pq

    from hedonic_ray.relational import queries as rel

    t = pa.table({
        "p_brand": pa.array(["B"] * 5, pa.string()),
        "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "p_retailprice": pa.array([9.99, 9.99, 5.0, 5.0, 1.0]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "part.parquet"))
        out = rel.rank_ties_per_brand(d).to_pandas()
    # ranks: 1,1 (tie), 3,3 (tie) -> four rows survive rnk<=3, price 1.0
    # has rank 5 and is excluded
    assert list(zip(out["p_partkey"], out["rnk"])) == [
        (1, 1), (2, 1), (3, 3), (4, 3)]


def test_gini_closed_form():
    import tempfile, os
    import pyarrow.parquet as pq

    from hedonic_ray.relational import queries as rel

    t = pa.table({
        "event_type": pa.array(["eq"] * 4 + ["ab"] * 2, pa.string()),
        "value": pa.array([5.0, 5.0, 5.0, 5.0, 0.01, 0.03]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = rel.event_value_gini(d).to_pandas()
    g = dict(zip(out["event_type"], out["gini_e6"]))
    # [1, 3] cents: G = (2*(1*1+2*3) - 3*4) / (2*4) = 0.25
    assert g == {"ab": 250000, "eq": 0}


def test_correlation_perfect_and_sign():
    import tempfile, os
    import pyarrow.parquet as pq

    from hedonic_ray.relational import queries as rel

    n = 50
    x = np.arange(1.0, n + 1)
    t = pa.table({
        "l_returnflag": pa.array(["P"] * n + ["N"] * n, pa.string()),
        "l_quantity": pa.array(np.concatenate([x, x])),
        "l_extendedprice": pa.array(np.concatenate([3 * x, -3 * x + 200])),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        out = rel.qty_price_correlation(d).to_pandas()
    c = dict(zip(out["l_returnflag"], out["corr_e6"]))
    assert c["P"] in (999999, 1000000)      # r = +1 up to one float ulp
    assert c["N"] in (-1000000, -1000001)  # r = -1, one-ulp slack


def test_fingerprint_overlap_identical_docs():
    import ray.data as rd

    from hedonic_ray.ops.dedup import fingerprint_overlap_pairs
    from hedonic_ray.ops.textstats import add_fingerprints

    base = _doc(42, 120)
    other = " ".join(f"zq{i}xx{i * 3 % 7}" for i in range(120))
    fp = add_fingerprints(_docs_ds([base, base, other]))
    rows = fingerprint_overlap_pairs(fp, min_shared=2).take_all()
    pairs = {(r["a"], r["b"]): r["shared"] for r in rows}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_knn_mutual_clusters_invariants_and_dag_acyclic():
    """Mutual-kNN clustering invariants on the gate fixture (the
    synthetic embeddings are NOT label-separable at k=3, so no purity
    claim): labels are min-member ids, non-vacuous multi-member
    clusters exist, and the run is deterministic.  The SCC
    condensation must contain no 2-cycles (a mutual arc would have
    merged the two SCCs)."""
    from hedonic_ray.pipelines import textops as tx
    from hedonic_ray.pipelines import linkgraph as lg

    SF = "/root/testdata/sf0.001"
    out = tx.knn_mutual_clusters(SF).to_pandas()
    assert (out.groupby("cluster")["vec_id"].min()
            == out.groupby("cluster")["vec_id"].apply(
                lambda s: s.name)).all()
    sizes = out.groupby("cluster").size()
    assert (sizes >= 2).sum() >= 2 and (sizes == 1).sum() >= 1
    again = tx.knn_mutual_clusters(SF).to_pandas()
    assert out.equals(again)

    dag = lg.doc_scc_dag(SF).to_pandas()
    arcs = set(zip(dag["src_scc"], dag["dst_scc"]))
    assert arcs and all((b, a) not in arcs for a, b in arcs)


def test_active_users_dau_wau_brute():
    """Users active across several days, duplicate (user, day) events
    split over partitions (exercises the global grid distinct): DAU
    and trailing 7-day WAU must match the brute computation."""
    import tempfile, os
    import pyarrow.parquet as pq

    from hedonic_ray.relational import queries as rel

    day = 86_400_000_000
    rng = np.random.default_rng(9)
    rows = []
    for u in range(12):
        for d in sorted(rng.choice(20, 6, replace=False)):
            rows.append((u, int(d) * day))
            rows.append((u, int(d) * day + 7))   # same user-day twice
    rng.shuffle(rows)
    t = pa.table({"user_id": pa.array([u for u, _ in rows], pa.int64()),
                  "ts": pa.array([x for _, x in rows], pa.timestamp("us"))})
    with tempfile.TemporaryDirectory() as d_:
        pq.write_table(t, os.path.join(d_, "events.parquet"),
                       row_group_size=16)   # many batches
        out = rel.active_users(d_).to_pandas()
    days = {(u, x // day) for u, x in rows}
    got = {r.day: (r.dau, r.wau) for r in out.itertuples(index=False)}
    for dd in sorted({d for _, d in days}):
        key = str(np.datetime64(int(dd), "D"))
        dau = sum(1 for u, d2 in days if d2 == dd)
        wau = len({u for u, d2 in days if dd - 6 <= d2 <= dd})
        assert got[key] == (dau, wau), key
    assert len(got) == len({d for _, d in days})


def test_levenshtein_kernel_reference():
    from hedonic_ray.ops.dedup import _levenshtein_batch

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev = dp[:]
            dp[0] = i
            for j, cb in enumerate(b, 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (ca != cb))
        return dp[-1]

    rng = np.random.default_rng(4)
    cases = [("", ""), ("a", ""), ("", "abc"), ("kitten", "sitting"),
             ("flaw", "lawn"), ("abcdef", "abcdef")]
    for _ in range(30):
        n1, n2 = rng.integers(0, 40, 2)
        a = "".join(rng.choice(list("abcd"), n1))
        b = "".join(rng.choice(list("abcd"), n2))
        cases.append((a, b))
    got = _levenshtein_batch([a for a, _ in cases],
                             [b for _, b in cases], prefix=200)
    exp = [ref(a, b) for a, b in cases]
    assert got.tolist() == exp


def test_semi_plus_anti_partition_customers():
    """Semi-join and anti-join must partition the customer table:
    per-segment counts and cent sums add up to the full table."""
    from hedonic_ray.relational.queries import (
        customers_with_events, customers_without_events)
    import pyarrow.parquet as pq

    SF = "/root/testdata/sf0.001"
    semi = customers_with_events(SF).to_pandas().set_index("c_mktsegment")
    anti = customers_without_events(SF).to_pandas().set_index("c_mktsegment")
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_mktsegment", "c_acctbal"]).to_pandas()
    cust["e2"] = np.floor(cust["c_acctbal"] * 100).astype(np.int64)
    full = cust.groupby("c_mktsegment").agg(n=("e2", "size"),
                                            s=("e2", "sum"))
    for seg, row in full.iterrows():
        n = (semi["n_customers"].get(seg, 0)
             + anti["n_customers"].get(seg, 0))
        s = (semi["sum_acctbal_e2"].get(seg, 0)
             + anti["sum_acctbal_e2"].get(seg, 0))
        assert (n, s) == (row["n"], row["s"]), seg


def test_stratified_sample_size_and_determinism():
    import ray.data as rd

    from hedonic_ray.ops.sampling import stratified_bottomk_sample

    rng = np.random.default_rng(6)
    n = 300
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(rng.choice(["en", "de", "fr"], n), pa.string()),
    })
    ds = rd.from_arrow(t).repartition(5)

    def run(method):
        out = stratified_bottomk_sample(ds, id_col="doc_id",
                                        stratum_col="lang", k=7,
                                        method=method).take_all()
        got = {}
        for r in out:
            got.setdefault(r["lang"], []).append(r["doc_id"])
        return {k_: sorted(v) for k_, v in got.items()}

    a = run("splitmix")
    assert set(a) == {"en", "de", "fr"}
    assert all(len(v) == 7 for v in a.values())
    assert run("splitmix") == a          # deterministic
    # brute per-stratum bottom-k check
    from hedonic_ray.functions.hashing import splitmix64
    langs = t.column("lang").to_pylist()
    ids = t.column("doc_id").to_numpy()
    h = splitmix64(ids.astype(np.uint64))
    for lang in a:
        idx = [i for i in range(n) if langs[i] == lang]
        idx.sort(key=lambda i: (h[i], ids[i]))
        assert a[lang] == sorted(int(ids[i]) for i in idx[:7])


def test_intake_filter_every_rule_bites():
    from hedonic_ray.pipelines.textops import intake_filter

    import tempfile, os
    import pyarrow.parquet as pq

    out = intake_filter("/root/testdata/sf0.001").to_pandas()
    # the fixture corpus is lowercase low-repetition word salad, so
    # upper_ok / repeat_ok are vacuously 1 there — length and lang
    # rules bite on the fixture, the other two on synthetic docs below
    for col in ("len_ok", "lang_ok"):
        assert 0 < out[col].sum() < len(out), col
    assert (out["keep"] == (out["len_ok"] & out["lang_ok"]
                            & out["upper_ok"] & out["repeat_ok"])).all()

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["THE QUICK BROWN FOX " * 5,
                          "the quick brown fox jumps over a lazy dog "
                          "near an old river bank while birds circle "
                          "slowly above tall green trees this morning",
                          "spam ham " * 30]),
        "lang": pa.array(["en", "en", "en"], pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        o2 = intake_filter(d).to_pandas().set_index("doc_id")
    assert o2.loc[0, "upper_ok"] == 0 and o2.loc[1, "upper_ok"] == 1
    assert o2.loc[2, "repeat_ok"] == 0 and o2.loc[1, "repeat_ok"] == 1


def test_cumulative_users_monotone_and_total():
    import pyarrow.parquet as pq

    from hedonic_ray.relational.queries import cumulative_users

    SF = "/root/testdata/sf0.001"
    out = cumulative_users(SF).to_pandas()
    users = pq.read_table(f"{SF}/events.parquet",
                          columns=["user_id"]).column("user_id")
    assert (out["cum_users"].diff().dropna() > 0).all() or len(out) == 1
    assert out["cum_users"].iloc[-1] == len(set(users.to_pylist()))
    assert (out["new_users"].cumsum() == out["cum_users"]).all()


def test_pack_plan_multiblock_offsets():
    """Offsets are a global exclusive prefix sum regardless of block
    layout: shuffled input split over many partitions must produce
    the same plan as the single-partition run, and chunks must tile
    the token stream."""
    import ray.data as rd

    from hedonic_ray.ops.textstats import pack_plan

    rng = np.random.default_rng(8)
    texts = [" ".join(f"w{j}" for j in range(int(k)))
             for k in rng.integers(0, 40, 120)]
    order = rng.permutation(len(texts))
    t = pa.table({"doc_id": pa.array(order.astype(np.int64)),
                  "text": pa.array([texts[i] for i in order])})

    def run(parts):
        out = pack_plan(rd.from_arrow(t).repartition(parts),
                        chunk_tokens=32).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    a, b = run(1), run(7)
    assert a.equals(b)
    n = a["n_tokens"].to_numpy()
    off = a["token_offset"].to_numpy()
    assert off[0] == 0 and (off[1:] == off[:-1] + n[:-1]).all()
    assert (a["first_chunk"] == off // 32).all()


def test_new_ops_edge_cases():
    """Degenerate inputs for the session-7 operators: single-vector
    knn (no other vector to rank), substring dedup on all-short docs,
    pack plan on empty docs, L-validation."""
    import ray.data as rd

    from hedonic_ray.ops.dedup import substring_dup_counts
    from hedonic_ray.ops.similarity import knn_graph
    from hedonic_ray.ops.textstats import pack_plan

    one = rd.from_arrow(pa.table({
        "vec_id": pa.array([7], pa.int64()),
        "embedding": pa.array([[1.0, 0.0]], pa.list_(pa.float32()))}))
    assert knn_graph(one, k=3).num_rows == 0

    short = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["tiny", "also small"])}))
    assert substring_dup_counts(short, L=32).count() == 0

    with pytest.raises(ValueError):
        substring_dup_counts(short, L=10)

    empties = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["", "a b c", ""])}))
    plan = pack_plan(empties, chunk_tokens=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert plan["n_tokens"].tolist() == [0, 3, 0]
    assert plan["token_offset"].tolist() == [0, 0, 3]
    assert plan.loc[1, "first_chunk"] == 0 and plan.loc[1, "last_chunk"] == 1


def test_knn_graph_antipodal_pair():
    """cos = −1 rounds to exactly −1e6, which must NOT be confused
    with the self-mask sentinel: a two-vector antipodal corpus has
    each vector as the other's (only) neighbor."""
    import ray.data as rd

    from hedonic_ray.ops.similarity import knn_graph

    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [-1.0, 0.0]],
                              pa.list_(pa.float32()))})
    out = knn_graph(rd.from_arrow(t), k=1)
    rows = sorted(zip(out.column("src").to_pylist(),
                      out.column("nbr").to_pylist(),
                      out.column("score_e6").to_pylist()))
    assert rows == [(0, 1, -1000000), (1, 0, -1000000)]


def test_fingerprint_overlap_cap_is_recall_only():
    """The hot-bucket cap replaces the quadratic pair emission with a
    chain — a documented RECALL trade, never precision: every pair it
    reports must be a real pair of the exact run, with a count no
    larger than the exact shared count."""
    from hedonic_ray.ops.dedup import fingerprint_overlap_pairs
    from hedonic_ray.ops.textstats import add_fingerprints

    base = _doc(51, 150)
    texts = [base, base, base, base, _doc(52, 150)]
    fp = add_fingerprints(_docs_ds(texts)).materialize()
    exact = {(r["a"], r["b"]): r["shared"] for r in
             fingerprint_overlap_pairs(fp, min_shared=1).take_all()}
    capped = {(r["a"], r["b"]): r["shared"] for r in
              fingerprint_overlap_pairs(fp, min_shared=1,
                                        cap=2).take_all()}
    assert capped and set(capped) <= set(exact)
    assert all(capped[p] <= exact[p] for p in capped)


def test_decontaminate_counts_broadcast_vs_join_and_brute():
    """Both paths must equal the brute-force per-doc set intersection,
    and the planted contamination must be found (non-vacuity)."""
    from hedonic_ray.ops.dedup import _strict_shingles, decontaminate_counts

    base = _doc(7, 40)
    # doc 0 is the "benchmark"; doc 2 shares a 20-word span with it
    texts = [base, _doc(8, 40),
             " ".join(base.split()[:20]) + " " + _doc(9, 20), _doc(10, 40)]
    bench_ids = np.array([0], dtype=np.int64)
    k = 8

    bgrams = _strict_shingles(texts[0], k)
    brute = {i: len(_strict_shingles(t, k) & bgrams)
             for i, t in enumerate(texts) if i != 0}
    brute = {i: n for i, n in brute.items() if n}
    assert brute.get(2, 0) >= 13  # the planted 20-word span

    for method in ("broadcast", "join"):
        got = {r["doc_id"]: r["n_shared"] for r in
               decontaminate_counts(_docs_ds(texts), bench_ids, k=k,
                                    method=method).take_all()}
        assert got == brute, method


def test_ngram_novelty_telescopes_to_distinct_grams():
    """sum(n_novel) == corpus distinct-gram count, and every doc's
    novelty equals the brute expanding-scan delta."""
    from hedonic_ray.ops.dedup import _strict_shingles, ngram_novelty_counts

    texts = [_doc(20, 30), _doc(21, 30), _doc(20, 30), _doc(22, 5)]
    k = 3
    seen: set = set()
    brute = {}
    for i, t in enumerate(texts):
        gs = _strict_shingles(t, k)
        new = gs - seen
        if new:
            brute[i] = len(new)
        seen |= gs

    got = {r["doc_id"]: r["n_novel"] for r in
           ngram_novelty_counts(_docs_ds(texts), k=k).take_all()}
    assert got == brute
    assert sum(got.values()) == len(seen)
    assert 2 not in got  # doc 2 repeats doc 0 verbatim: zero novelty


def test_incremental_jaccard_equals_monolithic_cross_subset():
    """The cross-side-only emitter must reproduce exactly the
    cross-side subset of the monolithic pair set, in both attach
    paths — and never emit a within-side pair."""
    from hedonic_ray.ops.dedup import (incremental_jaccard_pairs,
                                       ngram_jaccard_pairs)

    base = _doc(30, 40).split()
    texts = [" ".join(base),                      # 0 old
             _doc(31, 40),                        # 1 old
             " ".join(base[:36]) + " extra word here too",  # 2 old: near-dup of 0
             " ".join(base[2:]) + " pad",         # 3 new: near-dup of 0+2
             _doc(32, 40),                        # 4 new
             " ".join(base)]                      # 5 new: exact text of 0
    ds = _docs_ds(texts)
    old_ids, new_ids = {0, 1, 2}, {3, 4, 5}

    mono = {(r["a"], r["b"]): r["jacc_e9"] for r in
            ngram_jaccard_pairs(ds, len(texts), threshold_num=5,
                                threshold_den=10).take_all()}
    want = {p: j for p, j in mono.items()
            if (p[0] in old_ids) != (p[1] in old_ids)}
    assert want  # planted cross pairs exist

    old = ds.filter(expr="doc_id <= 2")
    new = ds.filter(expr="doc_id >= 3")
    for method in ("broadcast", "join"):
        got = {(r["a"], r["b"]): r["jacc_e9"] for r in
               incremental_jaccard_pairs(old, new, len(texts),
                                         threshold_num=5, threshold_den=10,
                                         method=method).take_all()}
        assert got == want, method
        assert all(a in old_ids and b in new_ids for a, b in got)


def test_heavy_hitters_mg_guarantee_and_exactness():
    """The two-pass MG report equals the exact top-k on a Zipf-ish
    corpus, survives tiny k_track, and the guarantee assertion fires
    on a flat corpus where the bar is not cleared."""
    from hedonic_ray.ops.sketch import heavy_hitter_terms

    # skewed corpus: 'hot' terms dominate
    texts = []
    for i in range(40):
        texts.append(("alpha " * 20 + "beta " * 10 + "gamma " * 8
                      + f"rare{i} " * 2 + _doc(100 + i, 10)).strip())
    ds = _docs_ds(texts)
    got = heavy_hitter_terms(ds, k_track=16, k_report=3)
    # exact oracle
    from collections import Counter
    c = Counter(w for t in texts for w in t.split())
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(got.column("term").to_pylist(),
                    got.column("tf").to_pylist())) == exp

    # flat corpus: every term unique -> bar not cleared -> loud failure
    flat = _docs_ds([" ".join(f"u{i}w{j}" for j in range(30))
                     for i in range(20)])
    with pytest.raises(AssertionError, match="k_track"):
        heavy_hitter_terms(flat, k_track=8, k_report=3)

    # tiny vocab, no reduction anywhere: exact even without the bar
    small = _docs_ds(["x y", "x z", "x y"])
    got2 = heavy_hitter_terms(small, k_track=8, k_report=2)
    assert list(zip(got2.column("term").to_pylist(),
                    got2.column("tf").to_pylist())) == [("x", 3), ("y", 2)]


def test_cms_heavy_terms_exact_despite_collisions():
    """The CMS two-pass report equals the exact GROUP BY ... HAVING
    under aggressive collision pressure (width far below vocab size):
    Count-Min never underestimates, so candidates are a superset and
    the exact rescore + final filter reproduce the true set exactly."""
    from collections import Counter

    from hedonic_ray.ops.sketch import cms_heavy_terms

    for seed, denom, width in [(0, 4, 16), (1, 8, 8), (2, 64, 32)]:
        rng = np.random.default_rng(seed)
        draws = rng.zipf(1.5, size=(15, 40)) % 50
        texts = [" ".join(f"w{int(z)}" for z in row) for row in draws]
        got = cms_heavy_terms(_docs_ds(texts), width=width, depth=3,
                              denom=denom)
        c = Counter(w for t in texts for w in t.split())
        n = sum(c.values())
        exp = sorted((t, k) for t, k in c.items() if k * denom >= n)
        assert list(zip(got.column("term").to_pylist(),
                        got.column("tf").to_pylist())) == exp, (seed, denom)


def test_cms_grid_never_underestimates():
    """Sketch property (no Ray): the min-over-rows CMS estimate is >=
    the true count for EVERY term, at any width — the guarantee the
    candidate filter in cms_heavy_terms relies on."""
    from collections import Counter

    from hedonic_ray.functions.hashing import hash_strings
    from hedonic_ray.ops.sketch import _cms_slots

    rng = np.random.default_rng(7)
    tokens = [f"t{int(z) % 37}" for z in rng.zipf(1.3, size=4000)]
    c = Counter(tokens)
    for width in (4, 16, 256):
        depth = 3
        grid = np.zeros(depth * width, dtype=np.int64)
        u = np.array(sorted(c), dtype=str)
        cnt = np.array([c[t] for t in u], dtype=np.int64)
        np.add.at(grid, _cms_slots(hash_strings(u), depth, width).ravel(),
                  np.repeat(cnt, depth))
        est = grid[_cms_slots(hash_strings(u), depth, width)].min(axis=1)
        assert (est >= cnt).all()
        assert int(grid[:width].sum()) == len(tokens)


def test_chunk_plan_matches_python_windows():
    """Vectorized sliding-window chunk plan vs a per-doc Python loop,
    including empty docs, sub-window docs, and exact-boundary sizes."""
    from hedonic_ray.ops.textstats import chunk_plan

    texts = ["", "a", " ".join(f"t{i}" for i in range(48)),
             " ".join(f"t{i}" for i in range(49)),
             " ".join(f"t{i}" for i in range(64)),
             " ".join(f"t{i}" for i in range(100))]
    got = chunk_plan(_docs_ds(texts), window=64, stride=48) \
        .sort(["doc_id", "chunk_id"]).take_all()
    exp = []
    for d, t in enumerate(texts):
        n = len(t.split())
        s = 0
        cid = 0
        while s < n:
            exp.append({"doc_id": d, "chunk_id": cid, "start_tok": s,
                        "len_tok": min(64, n - s)})
            s += 48
            cid += 1
    assert [dict(r) for r in got] == exp


def test_cdc_chunks_partition_docs_and_are_insertion_stable():
    """CDC invariants: per-doc chunk lengths sum to the text length,
    and prepending bytes to a document leaves every chunk after the
    first post-insertion boundary IDENTICAL (the content-defined
    property that positional chunking lacks)."""
    import ray.data as rd

    from hedonic_ray.ops.dedup import cdc_chunk_stats

    rng = np.random.default_rng(7)
    alpha = np.array(list("abcdefgh "))
    base = "".join(rng.choice(alpha, size=400))
    docs = [base, "zzzzz " + base, "".join(rng.choice(alpha, size=150))]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}))
    out = {r["doc_id"]: r for r in
           cdc_chunk_stats(ds, k=8, d=16).take_all()}
    # n_chunks * avg >= len sanity + partition property via dup_chars:
    # doc1 = prefix + doc0, so all of doc0's interior chunks recur in
    # doc1 -> both docs must report substantial dup_chars
    assert out[0]["dup_chars"] > len(base) // 2
    assert out[1]["dup_chars"] > len(base) // 2
    assert out[2]["n_dup_chunks"] == 0  # independent doc: no shared chunk
    # direct partition check on the chunker internals: driver replay
    pows = 37 ** np.arange(8, dtype=np.int64)
    for text in docs:
        b = np.frombuffer(text.encode(), np.uint8)
        ends = [i + 8 for i in range(len(b) - 7)
                if int(np.lib.stride_tricks.sliding_window_view(
                    b, 8)[i].astype(np.int64) @ pows) % 16 == 15]
        if not ends or ends[-1] != len(b):
            ends.append(len(b))
        lens = np.diff([0] + ends)
        assert lens.sum() == len(b)


def test_srp_lsh_pairs_sound_vs_bruteforce():
    """Every SRP-LSH output pair must pass the exact quantized-cosine
    threshold recomputed by brute force (soundness — the banded
    candidate stage is recall-only by design, like MinHash-LSH)."""
    import ray.data as rd

    from hedonic_ray.ops.similarity import srp_lsh_pairs

    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    out = srp_lsh_pairs(rd.from_arrow(t), threshold_e6=400000)
    assert out.num_rows > 0
    m = np.array([np.array(v) for v in t.column("embedding").to_pylist()],
                 dtype=np.float64)
    q = np.floor(m * 100000).astype(np.int64)
    ids = t.column("vec_id").to_numpy()
    pos = {int(v): i for i, v in enumerate(ids)}
    for a, b in zip(out.column("a").to_pylist(),
                    out.column("b").to_pylist()):
        qa, qb = q[pos[a]], q[pos[b]]
        dot = int(qa @ qb)
        assert dot > 0
        assert (dot * dot * 10**12
                >= 400000**2 * int(qa @ qa) * int(qb @ qb))


def test_srp_lsh_verify_semi_join_equal():
    """The broadcast semi-join verify and the distributed pairs⋈vectors
    join verify are bit-identical (same contract as
    verify_pairs_exact's two methods)."""
    import ray.data as rd
    import pyarrow.parquet as pq

    from hedonic_ray.ops.similarity import srp_lsh_pairs

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    semi = srp_lsh_pairs(rd.from_arrow(t), threshold_e6=400000,
                         method="semi")
    join = srp_lsh_pairs(rd.from_arrow(t), threshold_e6=400000,
                         method="join")
    assert semi.num_rows > 0
    assert semi.equals(join)


def test_pq_adc_self_distance_and_rank_shape():
    """PQ-ADC invariants: ranks are 1..k per query, and each query's
    own row ranks first (its ADC distance — the residual to its own
    codes — is minimal for this fixture's spread, ties impossible by
    the id tie-break on identical codes)."""
    import ray.data as rd
    import pyarrow.parquet as pq

    from hedonic_ray.ops.similarity import pq_adc_topk

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    out = pq_adc_topk(rd.from_arrow(t), k=5).to_pandas()
    for q, g in out.groupby("query_id"):
        assert list(g["rank"]) == [1, 2, 3, 4, 5]
        assert g[g["rank"] == 1]["vec_id"].iloc[0] == q


def test_pq_adc_no_full_sort_and_actor_lut_path_equal(monkeypatch):
    """r4 verdict item 3: the codebook must come from a filter scan
    (no whole-dataset sort anywhere in pq_adc_topk — spied), the
    actor-built-LUT scale path must equal the broadcast-LUT path
    bit-for-bit, and an oversized query set must fail loudly."""
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd
    from ray.data import Dataset

    from hedonic_ray.ops import similarity as sim

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    calls = []
    orig = Dataset.sort

    def spy(self, *a, **kw):
        calls.append(a)
        return orig(self, *a, **kw)

    monkeypatch.setattr(Dataset, "sort", spy)
    base = sim.pq_adc_topk(rd.from_arrow(t), k=5)
    assert not calls, "pq_adc_topk must not sort the dataset"
    monkeypatch.setattr(Dataset, "sort", orig)
    # force the serving-actor LUT build (the > broadcast-cap path)
    monkeypatch.setattr(sim, "PQ_MAX_BROADCAST_QUERIES", 0)
    assert sim.pq_adc_topk(rd.from_arrow(t), k=5).equals(base)
    monkeypatch.setattr(sim, "PQ_MAX_QUERIES", 1)
    with pytest.raises(AssertionError, match="PQ_MAX_QUERIES"):
        sim.pq_adc_topk(rd.from_arrow(t), k=5)


def test_late_events_matches_sequential_scan():
    """The bucketed distributed prefix scan equals a single sequential
    watermark scan, at several bucket counts (bucketing must be
    invisible in the result)."""
    import hashlib

    import pyarrow.parquet as pq

    from hedonic_ray.relational.queries import late_events

    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["event_id", "ts"])
    ids = t.column("event_id").to_numpy()
    ts = t.column("ts").cast(pa.int64()).to_numpy()
    h = np.array([int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[8:16], "little")
        for i in ids], np.uint64)
    arr = ts + (h % np.uint64(7_200_000_000)).astype(np.int64) \
        - 3_600_000_000
    order = np.lexsort((ids, arr))
    t2 = ts[order]
    run = np.maximum.accumulate(t2)
    late = np.zeros(len(t2), bool)
    late[1:] = t2[1:] < run[:-1] - 300_000_000
    exp = {}
    for tt, ll in zip(t2, late):
        hr = tt // 3_600_000_000
        ne, nl = exp.get(hr, (0, 0))
        exp[hr] = (ne + 1, nl + int(ll))
    for nb in (1, 7, 64):
        got = {r["hour"]: (r["n_events"], r["n_late"])
               for r in late_events("/root/testdata/sf0.001",
                                    n_buckets=nb).take_all()}
        assert got == exp, f"n_buckets={nb}"


def test_url_canonicalize_scoped_to_query():
    """utm stripping must be scoped to the query string: a PATH
    segment containing '&utm_' is untouched; kept params survive in
    order; leading-utm loses its '?' correctly; case rules apply to
    scheme+host only."""
    from hedonic_ray.functions.urls import canonicalize_urls

    got = canonicalize_urls(pa.array([
        "https://h.x/a&utm_x/b?id=1",          # '&utm_' in the PATH
        "HTTPS://H.X:443/P?utm_a=1&ref=A#f",   # leading utm + kept
        "https://h.x/p?a=1&utm_b=2&c=3",       # utm between kept
        "https://h.x/p?utm_a=1&utm_b=2",       # all-utm query
    ])).to_pylist()
    assert got == [
        "https://h.x/a&utm_x/b?id=1",
        "https://h.x/P?ref=A",
        "https://h.x/p?a=1&c=3",
        "https://h.x/p",
    ]


def test_rake_scores_match_reference_formula():
    """RAKE on a tiny hand corpus: phrase score must equal the exact
    hand-computed sum of deg/freq (classic Rose et al. example
    shape), and stopword runs must split phrases."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from hedonic_ray.pipelines.textops import rake_keywords

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["deep learning of deep nets",
                          "deep nets and fast nets"], pa.string()),
    })
    d = tempfile.mkdtemp()
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    out = rake_keywords(d, k=10)
    got = {p: s for p, s in zip(out.column("phrase").to_pylist(),
                                out.column("score_e6").to_pylist())}
    # phrases: "deep learning" (of splits), "deep nets" x2,
    # "fast nets" (and splits)
    # freq: deep=3, learning=1, nets=3, fast=1
    # deg:  deep=2+2+2=6, learning=2, nets=2+2+2=6, fast=2
    # score(deep nets) = 6/3 + 6/3 = 4.0
    # score(deep learning) = 6/3 + 2/1 = 4.0
    # score(fast nets) = 2/1 + 6/3 = 4.0
    assert got["deep nets"] == 4_000_000
    assert got["deep learning"] == 4_000_000
    assert got["fast nets"] == 4_000_000


def test_mmr_topk_matches_bruteforce_and_block_invariant():
    from hedonic_ray.ops.similarity import mmr_topk

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(120, 16)).astype(np.float32)
    q = mat[0].astype(np.float64)
    out = mmr_topk(_emb_ds(mat).repartition(7), q, k=6, pool=24,
                   exclude_id=0)
    # full-corpus brute force (same pool/greedy rules, no Ray)
    qm = np.floor(mat.astype(np.float64) * 100000).astype(np.int64)
    anchor = np.floor(q * 100000).astype(np.int64)
    ids = np.arange(len(mat), dtype=np.int64)
    keep = ids != 0
    cid, cq = ids[keep], qm[keep]
    rel = cq @ anchor
    po = np.lexsort((cid, -rel))[:24]
    pid, prel, pvec = cid[po], rel[po], cq[po]
    gram = pvec @ pvec.T
    sel, exp = [], []
    for rank in range(1, 7):
        sc = prel - gram[:, sel].max(axis=1) if sel else prel
        avail = np.ones(len(pid), bool)
        avail[sel] = False
        c = np.nonzero(avail)[0]
        b = int(c[np.lexsort((pid[c], -sc[c]))[0]])
        sel.append(b)
        exp.append((rank, int(pid[b]), int(prel[b]), int(sc[b])))
    got = [tuple(int(out.column(c)[i].as_py())
                 for c in ("rank", "vec_id", "rel_dot", "mmr_score"))
           for i in range(out.num_rows)]
    assert got == exp
    # block-layout invariance of the streaming partial merge
    single = mmr_topk(_emb_ds(mat), q, k=6, pool=24, exclude_id=0)
    assert single.equals(out)


def test_mmr_topk_first_pick_is_relevance_argmax():
    from hedonic_ray.ops.similarity import mmr_topk

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(60, 8)).astype(np.float32)
    q = rng.normal(size=8)
    out = mmr_topk(_emb_ds(mat), q, k=4, pool=16)
    qm = np.floor(mat.astype(np.float64) * 100000).astype(np.int64)
    rel = qm @ np.floor(np.asarray(q) * 100000).astype(np.int64)
    assert int(out.column("vec_id")[0].as_py()) == int(
        np.lexsort((np.arange(len(mat)), -rel))[0])
    picked = out.column("vec_id").to_pylist()
    assert len(set(picked)) == len(picked)


def test_bloom_audit_no_false_negatives_and_counts():
    import ray.data as rd
    from hedonic_ray.ops.dedup import bloom_dedup_audit, md5_low64

    texts = ["aa bb", "cc dd", "aa bb", "ee ff", "cc dd", "gg hh"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    m, kh = 64, 2
    out = (bloom_dedup_audit(ds, m=m, kh=kh).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # independent python replica (order-free first-setter semantics)
    pos = {d: sorted({md5_low64(f"bloom{i}-{t}") % m for i in range(kh)})
           for d, t in enumerate(texts)}
    setter = {}
    for d in range(len(texts)):
        for p in pos[d]:
            setter[p] = min(setter.get(p, d), d)
    for d in range(len(texts)):
        npre = sum(1 for p in pos[d] if setter[p] < d)
        assert int(out.loc[d, "n_pos"]) == len(pos[d])
        assert int(out.loc[d, "n_preset"]) == npre
        assert int(out.loc[d, "flagged"]) == int(npre == len(pos[d]))
    # exact duplicates are always flagged (no false negatives)
    assert int(out.loc[2, "flagged"]) == 1
    assert int(out.loc[4, "flagged"]) == 1
    assert int(out.loc[0, "flagged"]) == 0


def test_kmeans_step_matches_bruteforce():
    from hedonic_ray.ops.similarity import kmeans_step

    rng = np.random.default_rng(23)
    mat = rng.normal(size=(90, 12)).astype(np.float32)
    out = (kmeans_step(_emb_ds(mat).repartition(5), n_clusters=3)
           .to_pandas().sort_values(["cluster", "dim"])
           .reset_index(drop=True))
    qm = np.floor(mat.astype(np.float64) * 100000).astype(np.int64)
    cent = qm[:3]
    obj = -2 * (qm @ cent.T) + np.einsum("ij,ij->i", cent, cent)
    assign = np.argmin(obj, axis=1)
    # each seed belongs to its own cluster (distance 0)
    assert (assign[:3] == np.arange(3)).all()
    sums = np.zeros((3, 12), np.int64)
    np.add.at(sums, assign, qm)
    counts = np.bincount(assign, minlength=3)
    assert len(out) == 36
    for c in range(3):
        rows = out[out["cluster"] == c]
        assert (rows["n_members"].to_numpy() == counts[c]).all()
        np.testing.assert_array_equal(
            rows.sort_values("dim")["sum_qv"].to_numpy(), sums[c])
