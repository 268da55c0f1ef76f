"""Query-shaped wrappers over the training-data ops (documents /
embeddings tables) for ``__ray_entry__`` and bench."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.context import configure_context
from hedonic_ray.ops import dedup as dd
from hedonic_ray.ops import similarity as sim
from hedonic_ray.ops import textstats as ts
from hedonic_ray.ops import multimodal as mm


_TX_CACHE: dict = {}


def _tx_cached(key: tuple, build):
    """Session-scoped cache for intermediates SHARED by several gate
    queries (minhash cluster labels; simhash candidate pairs;
    winnowing fingerprints; exact/normalized keep-lists; the k-NN
    graph): the driver runs all gate queries in ONE process against
    one sf_dir, so recomputing a shared stage per consuming query
    multiplies gate wall time for no information.  Values are small
    driver arrays or MaterializedDatasets (tiny at gate scale; the
    gate is not the 100-TB operating mode — production pipelines call
    the ops directly and stream).  Keyed on ``force_scale()`` so the
    forced-scale re-checks (tests/test_entry_oracle.py) never reuse a
    default-path artifact, and session-scoped so a ray re-init drops
    dead ObjectRefs (same discipline as ``_GRAPH_CACHE``)."""
    from hedonic_ray.context import force_scale, session_scoped

    session_scoped(_TX_CACHE)
    k = key + (force_scale(),)
    if k not in _TX_CACHE:
        _TX_CACHE[k] = build()
    return _TX_CACHE[k]


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    configure_context()
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def token_counts(sf_dir: str):
    ds = ts.add_token_counts(_docs(sf_dir, ["doc_id", "text"]))
    return ds.select_columns(["doc_id", "n_tokens", "n_bpe_tokens"])


def quality_scores(sf_dir: str):
    """Ratios as scaled BIGINTs (×1e9) — float columns are not
    hash-stable across engines, scaled integers are."""
    ds = ts.add_quality_scores(_docs(sf_dir, ["doc_id", "text"]))

    def scale(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        def e9(col):
            # FLOOR, not round: both engines compute the identical
            # double (int/int division), floor has no tie rules
            return pc.cast(pc.floor(pc.multiply(t.column(col),
                                                pa.scalar(1e9))), pa.int64())

        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars_calc": t.column("n_chars_calc"),
            "punct_ratio_e9": e9("punct_ratio"),
            "mean_word_len_e9": e9("mean_word_len"),
        })

    return ds.map_batches(scale, batch_format="pyarrow")


def lang_id(sf_dir: str):
    ds = ts.add_lang_id(_docs(sf_dir, ["doc_id", "text", "lang"]))
    return ds.select_columns(["doc_id", "lang", "lang_pred"])


def redacted_docs(sf_dir: str):
    """(doc_id, clean_text) — PII-style scrub (emails/urls/long ids)
    as chained RE2 column kernels; byte-compared against the DuckDB
    regexp_replace chain."""
    ds = ts.add_redaction(_docs(sf_dir, ["doc_id", "text"]))
    return ds.select_columns(["doc_id", "clean_text"])


def sampled_docs(sf_dir: str, rate_num: int = 1, rate_den: int = 10):
    """(doc_id, n_chars) for the deterministic 1-in-10 document sample
    gated on ``md5_low64(doc_id) % den`` (`ops/sampling.py`) — the
    md5 mode is bit-identical to DuckDB's ``md5_number_lower``, so the
    sampled OUTPUT itself is oracle-checked, not just its size."""
    import pyarrow.compute as pc

    from hedonic_ray.ops.sampling import deterministic_sample

    s = deterministic_sample(_docs(sf_dir, ["doc_id", "text"]),
                             id_col="doc_id", rate_num=rate_num,
                             rate_den=rate_den, method="md5")

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_chars": pc.cast(pc.utf8_length(t.column("text")),
                                            pa.int64())})

    return s.map_batches(f, batch_format="pyarrow")


def term_df_top(sf_dir: str, k: int = 100) -> pa.Table:
    """Top-k whitespace terms by document frequency (ties → term asc)
    — the distributed wordcount: per-batch distinct-(doc, term)
    combiner → one groupby(term) shuffle → sort + limit."""
    df = ts.term_document_frequency(_docs(sf_dir, ["doc_id", "text"]))
    top = df.sort(["df", "term"], descending=[True, False]).limit(k)
    rows = top.take_all()
    return pa.table({
        "term": pa.array([r["term"] for r in rows], pa.string()),
        "df": pa.array([int(r["df"]) for r in rows], pa.int64()),
    })


def _fingerprints_ds(sf_dir: str):
    """Materialized (doc_id, fingerprint) rows, shared by
    :func:`fingerprints` and :func:`fingerprint_overlap`."""
    return _tx_cached(("fingerprints", sf_dir), lambda:
                      ts.add_fingerprints(
                          _docs(sf_dir, ["doc_id", "text"])).materialize())


def fingerprints(sf_dir: str):
    """Winnowing fingerprint SET per doc, exploded to (doc_id,
    fingerprint) rows — SQL-reproducible (codepoint polynomial hash mod
    2^64 + window min)."""
    return _fingerprints_ds(sf_dir).sort(["doc_id", "fingerprint"])


def _exact_keep_ds(sf_dir: str):
    return _tx_cached(("exact_keep", sf_dir), lambda:
                      dd.exact_dedup(_docs(sf_dir, ["doc_id", "text"]))
                      .select_columns(["doc_id"]).materialize())


def _norm_keep_ds(sf_dir: str):
    return _tx_cached(("norm_keep", sf_dir), lambda:
                      dd.normalized_exact_dedup(
                          _docs(sf_dir, ["doc_id", "text"]))
                      .select_columns(["doc_id"]).materialize())


def exact_dedup_kept(sf_dir: str):
    return _exact_keep_ds(sf_dir).sort("doc_id")


def _minhash_comp(sf_dir: str) -> np.ndarray:
    """Converged near-dup cluster labels (MinHash-LSH → exact-Jaccard
    verify → CC), shared by :func:`minhash_components`,
    :func:`dedup_keep_list` and :func:`dedup_funnel`."""
    def build():
        comp, _pairs = dd.minhash_dedup(_docs(sf_dir, ["doc_id", "text"]),
                                        _n_docs(sf_dir), verify="exact")
        return np.asarray(comp, dtype=np.int64)

    return _tx_cached(("minhash_comp", sf_dir), build)


def minhash_components(sf_dir: str) -> pa.Table:
    """Near-dup clusters: MinHash-LSH candidates → EXACT word-3-gram
    Jaccard ≥ 0.7 verify (distributed joins) → connected components.
    Exact verification makes the result independent of signature noise
    and therefore SQL-oracle-checkable (candidates are recall-only on
    this corpus — verified by the driver gate)."""
    comp = _minhash_comp(sf_dir)
    return pa.table({"doc_id": pa.array(np.arange(len(comp)), pa.int64()),
                     "dup_group": pa.array(comp, pa.int64())})


def _ngram_stage(sf_dir: str):
    """Materialized (counts, sizes) full-index pair stage, shared by
    :func:`ngram_dup_pairs` and :func:`ngram_containment_pairs` (the
    scorers differ only in the integer threshold applied after it).
    Under force-scale the Jaccard query takes the prefix path and
    ignores this; the containment query still shares it."""
    def build():
        counts, sizes = dd.ngram_pair_stage(
            _docs(sf_dir, ["doc_id", "text"]))
        return counts.materialize(), sizes.materialize()

    return _tx_cached(("ngram_stage", sf_dir), build)


def ngram_dup_pairs(sf_dir: str):
    """Exact word-3-gram Jaccard ≥ 0.7 near-dup pairs over the FULL
    corpus via the distributed inverted index (posting-list self-join —
    no LSH recall gap); integer-exact against the SQL oracle."""
    from hedonic_ray.context import force_scale

    pre = None if force_scale() else _ngram_stage(sf_dir)
    return dd.ngram_jaccard_pairs(
        _docs(sf_dir, ["doc_id", "text"]), _n_docs(sf_dir),
        precomputed=pre).sort(["a", "b"])


def _simhash_pairs_ds(sf_dir: str):
    """Materialized SimHash candidate pairs, shared by
    :func:`simhash_dup_pairs` and :func:`editdist_dup_pairs`."""
    def build():
        sigs = dd.simhash_signatures(
            _docs(sf_dir, ["doc_id", "text"])).materialize()
        return dd.simhash_pairs(sigs).materialize()

    return _tx_cached(("simhash_pairs", sf_dir), build)


def simhash_dup_pairs(sf_dir: str):
    return _simhash_pairs_ds(sf_dir).sort(["a", "b"])


def embedding_neardup(sf_dir: str) -> pa.Table:
    """Near-dup pair counts per cosine threshold (the synthetic
    embeddings have no true dups, so the report is the stable output:
    pair counts at several thresholds from ONE pair scan at the lowest
    threshold)."""
    import ray.data as rd

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    # float64 so the pair counts match the DuckDB double-precision
    # cosine oracle exactly
    pairs = dd.embedding_neardup_pairs(emb, threshold=0.30, dtype=np.float64)
    cos = []
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        cos.append(b.column("cosine").to_numpy())
    cos = np.concatenate(cos) if cos else np.empty(0)
    thresholds = [0.30, 0.50, 0.90, 0.98]
    return pa.table({
        "threshold_e2": pa.array([int(t * 100) for t in thresholds], pa.int64()),
        "n_pairs": pa.array([int((cos >= t).sum()) for t in thresholds],
                            pa.int64()),
    })


def _query_matrix(sf_dir: str, n_queries: int = 3) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy())[:n_queries]
    mat = np.asarray(t.column("embedding").combine_chunks().flatten(),
                     dtype=np.float32).reshape(t.num_rows, -1)
    return mat[order]


def topk_similarity(sf_dir: str, k: int = 5) -> pa.Table:
    import ray.data as rd
    import pyarrow.compute as pc

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    out = sim.topk_cosine(emb, _query_matrix(sf_dir), k=k)
    return pa.table({
        "query_id": out.column("query_id"),
        "rank": out.column("rank"),
        "vec_id": out.column("vec_id"),
        "score_e6": pc.cast(pc.round(pc.multiply(out.column("score"),
                                                 pa.scalar(1e6))), pa.int64()),
    })


def ivf_similarity(sf_dir: str, k: int = 5, nprobe: int = 16) -> pa.Table:
    """IVF top-k, scores scaled to e6 ints.  The gate runs a FULL
    probe sweep (nprobe = n_clusters): every stage of the IVF plumbing
    — centroid fit, bucket assignment, per-(query, bucket) probe
    filtering, local top-k, merge — executes, and the result equals
    exact top-k BY CONSTRUCTION (the probed union is the corpus), so
    the exact-top-k SQL oracle is valid structurally rather than by
    fixture luck.  Partial-probe recall (the actual approximation
    trade-off) is characterized by the pytest recall check; the
    runtime assertion below fails loudly if the equality ever breaks
    (e.g. a future change to the merge tie-breaks) instead of
    surfacing as an inscrutable driver hash mismatch."""
    import ray.data as rd
    import pyarrow.compute as pc

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    out = sim.ivf_topk(emb, _query_matrix(sf_dir), k=k, nprobe=nprobe)
    exact = sim.topk_cosine(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                            columns=["vec_id", "embedding"]),
                            _query_matrix(sf_dir), k=k)
    same = out.num_rows == exact.num_rows and all(
        (out.column(c).to_numpy() == exact.column(c).to_numpy()).all()
        for c in out.column_names)
    if not same:
        raise AssertionError(
            "ivf_similarity: IVF recall < 1.0 at oracle scale — the "
            "exact-top-k SQL oracle no longer applies; re-tune nprobe/"
            "n_clusters or drop the oracle alias for this fixture")
    return pa.table({
        "query_id": out.column("query_id"),
        "rank": out.column("rank"),
        "vec_id": out.column("vec_id"),
        "score_e6": pc.cast(pc.round(pc.multiply(out.column("score"),
                                                 pa.scalar(1e6))), pa.int64()),
    })


def multimodal_decode(sf_dir: str):
    import ray.data as rd

    configure_context()
    media = rd.from_arrow(mm.synth_media_table(_n_docs(sf_dir)))
    return mm.decode_media(media).select_columns(
        ["doc_id", "kind", "width", "height", "frames"])


def multimodal_resize(sf_dir: str, target: int = 32):
    """Aspect-preserving integer resize of the synthetic media — the
    output geometry is pure doc_id arithmetic, SQL-oracle-checked."""
    import ray.data as rd

    configure_context()
    media = rd.from_arrow(mm.synth_media_table(_n_docs(sf_dir)))
    out = mm.resize_media(media, target=target)
    return out.select_columns(["doc_id", "kind", "width", "height"])


def multimodal_frames(sf_dir: str):
    import ray.data as rd

    configure_context()
    media = rd.from_arrow(mm.synth_media_table(_n_docs(sf_dir)))
    return mm.frame_sample(media).sort(["doc_id", "frame"])


def multimodal_tiles(sf_dir: str, tile: int = 16):
    """ViT-patch tile-grid plan over the synthetic media — the tile
    geometry is pure doc_id arithmetic, SQL-oracle-checked."""
    import ray.data as rd

    configure_context()
    media = rd.from_arrow(mm.synth_media_table(_n_docs(sf_dir)))
    return mm.tile_plan(media, tile=tile).sort(
        ["doc_id", "tile_x", "tile_y"])


def repetition_signals(sf_dir: str):
    """(doc_id, n_lines, dup_line_frac_e9, top_bigram_frac_e9) —
    Gopher-style repetition quality signals (duplicate-line fraction,
    top word-bigram fraction) as floor-scaled integers."""
    return ts.add_repetition_signals(_docs(sf_dir, ["doc_id", "text"]))


def ttr(sf_dir: str):
    """Per-doc type-token ratio (exact integers)."""
    return ts.add_ttr(_docs(sf_dir, ["doc_id", "text"]))


def dup_passages(sf_dir: str):
    """Corpus-wide duplicated 16-word passages (exact passage-level
    dedup stage)."""
    return ts.duplicated_passages(_docs(sf_dir, ["doc_id", "text"]))


def ngram_containment_pairs(sf_dir: str):
    """Exact word-3-gram containment ≥ 0.8 pairs (short-doc-inside-
    long-doc near-dups Jaccard misses)."""
    return dd.ngram_containment_pairs(
        _docs(sf_dir, ["doc_id", "text"]), _n_docs(sf_dir),
        precomputed=_ngram_stage(sf_dir)).sort(["a", "b"])


def range_similarity(sf_dir: str, threshold_e6: int = 300_000):
    """All (query, vector) pairs with rounded cosine ≥ 0.3 for the
    3 deterministic query rows (radius search)."""
    import ray.data as rd

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return sim.range_search_cosine(emb, _query_matrix(sf_dir), threshold_e6)


def term_tf_top(sf_dir: str, k: int = 100) -> pa.Table:
    """Top-k whitespace terms by TOTAL occurrence count (term
    frequency; ties → term asc) — the TF complement of the
    document-frequency wordcount."""
    tf = ts.term_total_frequency(_docs(sf_dir, ["doc_id", "text"]))
    top = tf.sort(["tf", "term"], descending=[True, False]).limit(k)
    rows = top.take_all()
    return pa.table({
        "term": pa.array([r["term"] for r in rows], pa.string()),
        "tf": pa.array([int(r["tf"]) for r in rows], pa.int64()),
    })


def _query_labels(sf_dir: str, n_queries: int = 3) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "label"])
    order = np.argsort(t.column("vec_id").to_numpy())[:n_queries]
    return t.column("label").to_numpy()[order].astype(np.int64)


def filtered_topk_similarity(sf_dir: str, k: int = 5) -> pa.Table:
    """Metadata-filtered top-k: each query ranks only the vectors with
    its own label."""
    import ray.data as rd
    import pyarrow.compute as pc

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
    out = sim.topk_cosine_filtered(emb, _query_matrix(sf_dir),
                                   _query_labels(sf_dir), k=k)
    return pa.table({
        "query_id": out.column("query_id"),
        "rank": out.column("rank"),
        "vec_id": out.column("vec_id"),
        "score_e6": pc.cast(pc.round(pc.multiply(out.column("score"),
                                                 pa.scalar(1e6))), pa.int64()),
    })


def tfidf_keywords(sf_dir: str, k: int = 3):
    """Per-doc top-3 keywords by integer tf·N//df (exact TF-IDF
    ordering without a float log)."""
    return ts.tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]),
                              _n_docs(sf_dir), k=k)


def dedup_keep_list(sf_dir: str):
    """Duplicate-cluster REPRESENTATIVE selection — the step that turns
    near-dup clusters into an actual keep-list: per cluster, keep the
    longest document (ties → smallest doc_id), reporting
    (dup_group, kept_doc, n_chars, cluster_size).

    Shape: the converged cluster labels broadcast via ``ray.put``; one
    vectorized tag pass over ``documents`` and ONE
    ``groupby(dup_group)`` argmax exchange."""
    import ray
    import pyarrow.compute as pc

    comp_ref = ray.put(_minhash_comp(sf_dir))

    def tag(t: pa.Table) -> pa.Table:
        c = ray.get(comp_ref)
        ids = t.column("doc_id").to_numpy()
        return pa.table({
            "dup_group": pa.array(c[ids], pa.int64()),
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
        })

    tagged = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tag, batch_format="pyarrow")

    def keep(g: dict) -> dict:
        i = np.lexsort((g["doc_id"], -g["n_chars"]))[0]
        return {"dup_group": g["dup_group"][:1].astype(np.int64),
                "kept_doc": g["doc_id"][i:i + 1].astype(np.int64),
                "n_chars": g["n_chars"][i:i + 1].astype(np.int64),
                "cluster_size": np.array([len(g["doc_id"])], np.int64)}

    return tagged.groupby("dup_group").map_groups(keep,
                                                  batch_format="numpy")


def bottomk_sampled_docs(sf_dir: str, k: int = 50) -> pa.Table:
    """Fixed-size deterministic sample: the k docs with the smallest
    md5 hash (bottom-k sketch; SQL-reproducible membership)."""
    from hedonic_ray.ops.sampling import bottomk_sample

    return bottomk_sample(_docs(sf_dir, ["doc_id"]), id_col="doc_id", k=k)


def normalized_dedup_kept(sf_dir: str):
    """Keep-list of the case/punctuation-normalized exact dedup."""
    return _norm_keep_ds(sf_dir).sort("doc_id")


def substring_dup_windows(sf_dir: str, L: int = 32):
    """Per-document count of distinct L-char sliding windows shared
    with at least one other document (sub-passage, alignment-free
    exact substring dedup — the character-level complement of
    :func:`dup_passages`)."""
    return dd.substring_dup_counts(_docs(sf_dir, ["doc_id", "text"]), L=L)


def knn_graph_table(sf_dir: str, k: int = 3) -> pa.Table:
    """k-NN graph over the embeddings table (integer-ranked cosine;
    the semantic-dedup / clustering front-end self-join).  Cached per
    (sf_dir, k): :func:`knn_mutual_clusters` consumes the same graph."""
    import ray.data as rd

    def build():
        configure_context()
        emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        return sim.knn_graph(emb, k=k)

    return _tx_cached(("knn_graph", sf_dir, k), build)


def hard_negatives_table(sf_dir: str, k: int = 3) -> pa.Table:
    """HARD-NEGATIVE MINING for contrastive training (the triplet /
    in-batch-negatives curation stage): for every vector, its ``k``
    most cosine-similar vectors with a DIFFERENT label — the
    near-miss impostors a metric-learning loss learns the most from.
    Same integer-ranked machinery as :func:`knn_graph_table`
    (``score·2³² + (2³²−1−id)`` composite key, ties → lowest nbr),
    with the same-label grid cells masked alongside the self cell;
    the IVF bucketed self-join threads the label through the route
    exchange under force_scale."""
    import ray.data as rd

    def build():
        configure_context()
        emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding", "label"])
        return sim.knn_graph(emb, k=k, label_col="label")

    return _tx_cached(("hard_negatives", sf_dir, k), build)


def semantic_dedup_table(sf_dir: str) -> pa.Table:
    """SemDeDup over the embeddings table: exact-integer k-means
    clustering, within-cluster near-dup pairs on the rounded cosine,
    min-id representative per duplicate group."""
    import ray.data as rd

    def build():
        configure_context()
        emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        n = emb.count()
        return dd.semantic_dedup(emb, n)

    return _tx_cached(("semantic_dedup", sf_dir), build)


def zipf_slope_table(sf_dir: str) -> pa.Table:
    """Zipf rank-frequency slope of the corpus vocabulary (integer
    log-floor regression over the top-100 terms)."""
    return ts.zipf_slope(_docs(sf_dir, ["doc_id", "text"]))


def burstiness_table(sf_dir: str) -> pa.Table:
    """Top-50 burstiest terms (cf/df) with df >= 5."""
    return ts.term_burstiness(_docs(sf_dir, ["doc_id", "text"]))


def bigram_tf_top(sf_dir: str, k: int = 50) -> pa.Table:
    """Top-k word bigrams by total occurrence count (ties → bigram
    asc) — the n-gram LM statistics stage."""
    tf = ts.bigram_total_frequency(_docs(sf_dir, ["doc_id", "text"]))
    top = tf.sort(["tf", "bigram"], descending=[True, False]).limit(k)
    rows = top.take_all()
    return pa.table({
        "bigram": pa.array([r["bigram"] for r in rows], pa.string()),
        "tf": pa.array([int(r["tf"]) for r in rows], pa.int64()),
    })


def bigram_lift_top(sf_dir: str, k: int = 100) -> pa.Table:
    """COLLOCATION LIFT for the top-``k`` bigrams by count: the
    association score lift = P(xy) / (P(x)·P(y)) reported as the
    exact scaled integer ``lift_e6 = (1e6·c_xy·N_tok²) //
    (N_bg·c_x·c_y)`` — the integer-rational form of PMI's argument,
    so no log/float anywhere and the gate hash is engine-stable.
    Bigram and unigram counts are the existing distributed combiners
    (`ops/textstats.py:bigram_total_frequency` /
    `term_total_frequency`); only the top-k grid (≤ 2k terms) is
    gathered, with the unigram lookups fetched via one vectorized
    ``is_in`` filter over the term-count Dataset — O(k) driver state,
    Python-int finish (no 2^63 ceiling)."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    bg = ts.bigram_total_frequency(docs)
    n_bg = int(bg.sum("tf"))
    top = (bg.sort(["tf", "bigram"], descending=[True, False])
           .limit(k).take_all())
    bigrams = [r["bigram"] for r in top]
    c_xy = {r["bigram"]: int(r["tf"]) for r in top}
    pairs = [b.split(" ") for b in bigrams]  # tokens are \S+: 1 space
    need = sorted({w for p in pairs for w in p})
    tf = ts.term_total_frequency(docs)
    n_tok = int(tf.sum("tf"))

    def pick(t: pa.Table, need=need) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_in(t.column("term"),
                                 value_set=pa.array(need, pa.string())))

    c_t = {r["term"]: int(r["tf"])
           for r in tf.map_batches(pick, batch_format="pyarrow").take_all()}
    lifts = [(1000000 * c_xy[b] * n_tok * n_tok)
             // (n_bg * c_t[w1] * c_t[w2])
             for b, (w1, w2) in zip(bigrams, pairs)]
    return pa.table({
        "bigram": pa.array(bigrams, pa.string()),
        "n_xy": pa.array([c_xy[b] for b in bigrams], pa.int64()),
        "n_x": pa.array([c_t[p[0]] for p in pairs], pa.int64()),
        "n_y": pa.array([c_t[p[1]] for p in pairs], pa.int64()),
        "lift_e6": pa.array(lifts, pa.int64()),
    })


def rake_keywords(sf_dir: str, *, k: int = 50, max_words: int = 4,
                  vocab_broadcast_max: int = 2_000_000) -> pa.Table:
    """RAKE KEYWORD EXTRACTION (Rose et al. 2010) — candidate phrases
    are maximal stopword-free token runs (≤ ``max_words``); word
    score = deg(w)/freq(w) with freq = occurrences inside candidate
    phrases and deg = Σ phrase-length over those occurrences; phrase
    score = Σ word scores, kept EXACT as the integer rational
    num = Σᵢ degᵢ·(Πfreq)//freqᵢ over den = Πfreq (the product runs
    over word OCCURRENCES, so repeats are counted; Πfreq ≤ freqᵐᵃˣ⁴
    fits int64, and the ×1e6 floor is finished in Python ints).
    Ranked by (score_e6 desc, phrase asc) — deterministic.

    Shape: pass 1 extracts phrase occurrences with one vectorized
    islands kernel (stopword mask → run ids via cumsum; phrase
    strings via ListArray + binary_join, no Python per token) and
    reduces (freq, deg) per word through ONE grouped exchange; the
    word-stat vocabulary is broadcast (asserted <
    ``vocab_broadcast_max`` — the df-JOIN upgrade used by tfidf is
    the documented scale path but is NOT yet wired here).  Pass 2 re-derives each
    batch's distinct phrases and scores them against the broadcast
    stats; per-phrase exact-int finish is a loop over the phrase
    GRID (orders below the token count).  Driver holds top-k only."""
    import ray
    from ray.data.aggregate import Sum

    stops = sorted(set().union(*ts._STOPWORDS.values()))
    docs = _docs(sf_dir, ["doc_id", "text"])

    def phrase_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, lens, doc_of = ts._flat_words(batch, "text")
        if len(doc_of) == 0:
            return pa.table({"phrase": pa.array([], pa.string()),
                             "w": pa.array([], pa.string()),
                             "plen": pa.array([], pa.int64())})
        stop = pc.is_in(flat, value_set=pa.array(stops, pa.string()))
        stop = stop.to_numpy(zero_copy_only=False)
        keep = ~stop
        # island id: new run at every stopword or doc boundary
        newdoc = np.empty(len(doc_of), bool)
        newdoc[0] = True
        newdoc[1:] = doc_of[1:] != doc_of[:-1]
        run = np.cumsum(newdoc | stop)
        words = np.asarray(flat).astype(str)
        ridx = run[keep]
        widx = words[keep]
        if len(ridx) == 0:
            return pa.table({"phrase": pa.array([], pa.string()),
                             "w": pa.array([], pa.string()),
                             "plen": pa.array([], pa.int64())})
        # runs are CONTIGUOUS in ridx (doc-order explode), so phrase
        # strings come from one ListArray + binary_join — no Python
        # per token (review finding)
        first = np.empty(len(ridx), bool)
        first[0] = True
        first[1:] = ridx[1:] != ridx[:-1]
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(ridx)))
        warr = pa.array(widx.astype(object), pa.string())
        offsets = pa.array(np.append(starts, len(ridx)).astype(np.int32))
        run_phrases = pc.binary_join(
            pa.ListArray.from_arrays(offsets, warr), " ")
        ok_run = cnt <= max_words
        keep_occ = np.repeat(ok_run, cnt)
        phrase_occ = np.repeat(np.asarray(run_phrases).astype(str),
                               cnt)[keep_occ]
        return pa.table({
            "phrase": pa.array(phrase_occ.astype(object), pa.string()),
            "w": warr.filter(pa.array(keep_occ)),
            "plen": pa.array(np.repeat(cnt, cnt)[keep_occ]
                             .astype(np.int64))})

    occ = docs.map_batches(phrase_rows, batch_format="pyarrow",
                           batch_size=2048).materialize()

    def wstats(t: pa.Table) -> pa.Table:
        g = pa.table({"w": t.column("w"),
                      "freq": pa.array(np.ones(t.num_rows, np.int64)),
                      "deg": t.column("plen")})
        return (g.group_by("w").aggregate([("freq", "sum"),
                                           ("deg", "sum")])
                .rename_columns(["w", "freq", "deg"]))

    stats = (occ.map_batches(wstats, batch_format="pyarrow")
             .groupby("w").aggregate(Sum("freq", alias_name="freq"),
                                     Sum("deg", alias_name="deg"))
             .take_all())
    assert len(stats) < vocab_broadcast_max, \
        "RAKE vocab exceeds broadcast cap: switch to the df-join path"
    vocab = np.array(sorted(r["w"] for r in stats), dtype=object)
    by_w = {r["w"]: (int(r["freq"]), int(r["deg"])) for r in stats}
    fr = np.array([by_w[w][0] for w in vocab], np.int64)
    dg = np.array([by_w[w][1] for w in vocab], np.int64)
    vocab_ref = ray.put((vocab, fr, dg))

    def score_phrases(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vv, ff, dd = ray.get(vocab_ref)
        seen = {}
        # dedupe BEFORE the exact-int loop: occ repeats each phrase
        # plen × occurrences times (review finding)
        ph = pc.unique(t.column("phrase")).to_pylist()
        for p in ph:
            num, den = 0, 1
            for w in p.split(" "):
                i = np.searchsorted(vv, w)
                f_, d_ = int(ff[i]), int(dd[i])
                num = num * f_ + d_ * den
                den *= f_
            seen[p] = (1_000_000 * num) // den
        items = sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return pa.table({
            "phrase": pa.array([p for p, _ in items], pa.string()),
            "score_e6": pa.array([s for _, s in items], pa.int64())})

    rows = (occ.select_columns(["phrase"])
            .map_batches(score_phrases, batch_format="pyarrow")
            .take_all())
    seen = {}
    for r in rows:
        seen[r["phrase"]] = int(r["score_e6"])
    items = sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({
        "phrase": pa.array([p for p, _ in items], pa.string()),
        "score_e6": pa.array([s for _, s in items], pa.int64())})


def pii_counts(sf_dir: str):
    """PER-RULE PII MATCH COUNTS — the audit view of `text_redact`
    (independent counts per rule, not the ordered replace chain).
    The fixture text contains no PII at all (counts would be
    all-zero → vacuous rules), so deterministic PII strings are
    APPENDED arithmetically from doc_id — the `dedup_url` FIXTURES.md
    discipline: an email for even ids, a url always, a long digit run
    for ids ≡ 0 mod 3 — and the SQL oracle appends the identical
    strings.  Pure ``count_substring_regex`` column kernels over the
    derived text."""
    import pyarrow.compute as pc

    names = ("n_email", "n_url", "n_num")

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        ids_s = ids.astype("U20")
        tail = np.where(ids % 2 == 0,
                        np.char.add(np.char.add(" user", ids_s),
                                    "@example.com"), "")
        tail = np.char.add(tail, np.char.add(
            " https://ref.example/p/", ids_s))
        tail = np.char.add(tail, np.where(
            ids % 3 == 0,
            np.char.add(" id ", (ids * 1000003 + 10**9).astype("U20")),
            ""))
        derived = pc.binary_join_element_wise(
            t.column("text"), pa.array(tail.astype(object), pa.string()),
            "")
        out = {"doc_id": t.column("doc_id")}
        for name, (pat, _repl) in zip(names, ts.REDACT_RULES):
            out[name] = pc.cast(
                pc.count_substring_regex(derived, pat), pa.int64())
        return pa.table(out)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def lang_confusion(sf_dir: str):
    """LANGUAGE-ID CONFUSION MATRIX — the classifier-audit view of
    `text_lang_id`: per (true lang, predicted lang), the document
    count.  Per-batch Arrow pre-combine, one grouped exchange."""
    from ray.data.aggregate import Sum

    ds = ts.add_lang_id(_docs(sf_dir, ["doc_id", "text", "lang"]))

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"lang": t.column("lang"),
                      "lang_pred": t.column("lang_pred"),
                      "n": pa.array(np.ones(t.num_rows, np.int64))})
        return (g.group_by(["lang", "lang_pred"]).aggregate([("n", "sum")])
                .rename_columns(["lang", "lang_pred", "n"]))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "lang_pred"])
            .aggregate(Sum("n", alias_name="n")))


def kwic_contexts(sf_dir: str, *, n_terms: int = 3,
                  window: int = 2) -> "object":
    """KEYWORD-IN-CONTEXT (concordance) extraction — the corpus-audit
    view every data-curation loop uses to eyeball how a term is used:
    for the top-``n_terms`` terms by document frequency (ties → term
    asc, the `term_df_top` order), every occurrence is emitted with
    its 1-based word position and the ``±window``-word context
    (clipped at document edges, single-space joined).

    Shape: the distributed DF wordcount picks the term list (O(n_terms)
    driver state, broadcast into the extract stage); ONE fused
    ``map_batches`` re-explodes each doc and assembles contexts only
    for matched occurrences — documents never straddle batches, so the
    per-batch explode sees every context window whole (the same fusion
    invariant as text_tfidf)."""
    t_df = ts.term_document_frequency(_docs(sf_dir, ["doc_id", "text"]))
    top = (t_df.sort(["df", "term"], descending=[True, False])
           .limit(n_terms).take_all())
    terms = sorted(r["term"] for r in top)

    def extract(batch: pa.Table, terms=tuple(terms)) -> pa.Table:
        import pyarrow.compute as pc

        flat, lens, doc_of = ts._flat_words(batch, "text")
        docs = batch.column("doc_id").to_numpy()
        hit = pc.is_in(flat, value_set=pa.array(list(terms),
                                                pa.string()))
        idx = np.flatnonzero(hit.to_numpy(zero_copy_only=False))
        if len(idx) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "pos": pa.array([], pa.int64()),
                             "context": pa.array([], pa.string())})
        starts = np.cumsum(lens) - lens          # first flat index per row
        d = doc_of[idx]
        lo = np.maximum(idx - window, starts[d])
        hi = np.minimum(idx + window + 1, starts[d] + lens[d])
        words = np.asarray(flat).astype(str)
        ctx = [" ".join(words[l:h]) for l, h in zip(lo, hi)]
        return pa.table({
            "doc_id": pa.array(docs[d]),
            "term": pa.array(words[idx].astype(object), pa.string()),
            "pos": pa.array(idx - starts[d] + 1),
            "context": pa.array(ctx, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        extract, batch_format="pyarrow")


def url_dedup(sf_dir: str):
    """URL-canonicalization dedup over deterministic messy crawl
    records (`functions/urls.py`): one fused generate+normalize
    ``map_batches``, per-batch (canonical, raw) count grid, then a
    two-stage groupby — Sum for record counts, Count for distinct raw
    variants.  Columns: canonical, n_records, n_variants."""
    from ray.data.aggregate import Count, Sum

    from hedonic_ray.functions.urls import canonicalize_urls, crawl_records

    def gen_norm(t: pa.Table) -> pa.Table:
        recs = crawl_records(t)
        g = pa.table({"canonical": canonicalize_urls(recs.column("url")),
                      "url": recs.column("url"),
                      "n": pa.array(np.ones(recs.num_rows, np.int64))})
        return (g.group_by(["canonical", "url"]).aggregate([("n", "sum")])
                .rename_columns(["canonical", "url", "n"]))

    grid = (_docs(sf_dir, ["doc_id"]).map_batches(
        gen_norm, batch_format="pyarrow")
        .groupby(["canonical", "url"]).aggregate(Sum("n", alias_name="n")))
    return (grid.groupby("canonical")
            .aggregate(Sum("n", alias_name="n_records"),
                       Count(alias_name="n_variants")))


def pq_topk(sf_dir: str, *, k: int = 5) -> pa.Table:
    """Product-quantization ADC top-k over the embeddings table
    (`ops/similarity.py:pq_adc_topk`)."""
    import ray.data as rd

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return sim.pq_adc_topk(emb, k=k)


def srp_lsh(sf_dir: str, *, threshold_e6: int = 400000) -> pa.Table:
    """Hyperplane-LSH cosine near-dup pairs over the embeddings table
    (`ops/similarity.py:srp_lsh_pairs`)."""
    import ray.data as rd

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return sim.srp_lsh_pairs(emb, threshold_e6=threshold_e6)


def mmr_diversified(sf_dir: str, k: int = 8, pool: int = 32) -> pa.Table:
    """MMR diversified top-k over the embeddings table: anchor = the
    vec_id-0 embedding, candidates = every other vector, λ = 1/2 on
    the quantized inner-product kernel
    (`ops/similarity.py:mmr_topk`)."""
    import ray.data as rd

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return sim.mmr_topk(emb, _query_matrix(sf_dir, n_queries=1)[0],
                        k=k, pool=pool, exclude_id=0)


def kmeans_update(sf_dir: str, n_clusters: int = 4):
    """One exact-integer distributed Lloyd iteration over the
    embeddings table (`ops/similarity.py:kmeans_step`): assignment to
    the seed centroids (ids 0..C−1) + the mergeable per-(cluster, dim)
    sum/count sufficient statistics of the updated centroids."""
    import ray.data as rd

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return sim.kmeans_step(emb, n_clusters=n_clusters)


def bloom_audit(sf_dir: str):
    """Streaming Bloom-filter dedup pre-filter audit over the
    documents table (`ops/dedup.py:bloom_dedup_audit`)."""
    return dd.bloom_dedup_audit(_docs(sf_dir, ["doc_id", "text"]))


def cdc_dedup(sf_dir: str, *, k: int = 8, d: int = 32):
    """Content-defined-chunking dedup report over the documents table
    (`ops/dedup.py:cdc_chunk_stats`): per doc, its chunk count and how
    many chunks (occurrences / chars) are shared with another doc."""
    return dd.cdc_chunk_stats(_docs(sf_dir, ["doc_id", "text"]),
                              k=k, d=d)


def fingerprint_overlap(sf_dir: str, min_shared: int = 12):
    """Winnowing-fingerprint overlap pairs (MOSS-style plagiarism /
    boilerplate detection on top of :func:`fingerprints`)."""
    return dd.fingerprint_overlap_pairs(_fingerprints_ds(sf_dir),
                                        min_shared=min_shared)


def length_stats_by_lang(sf_dir: str, qs_e2=(50, 90)) -> "object":
    """Per-language document-length audit (the length-distribution
    check every training-data intake runs): exact ⌈q·n⌉-th order
    statistics of ``n_chars`` plus the MEDIAN ABSOLUTE DEVIATION
    (MAD = lower median of |len − p50|) — all integers, no float.
    One grouped exchange; per group two sorts over its lengths."""
    import ray.data as rd

    configure_context()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])
    qs = tuple(int(q) for q in qs_e2)

    def stats(group: dict) -> dict:
        v = np.sort(group["n_chars"].astype(np.int64))
        n = len(v)
        picks = {q: int(v[max(1, -(-n * q // 100)) - 1]) for q in qs}
        med = int(v[max(1, -(-n * 50 // 100)) - 1])  # MAD anchors on
        dev = np.sort(np.abs(v - med))               # p50 regardless of qs
        mad = int(dev[max(1, -(-n * 50 // 100)) - 1])
        out = {"lang": group["lang"][:1],
               "n": np.array([n], np.int64),
               "mad": np.array([mad], np.int64)}
        for q in qs:
            out[f"p{q}"] = np.array([picks[q]], np.int64)
        return out

    cols = ["lang", "n"] + [f"p{q}" for q in qs] + ["mad"]
    return (ds.groupby("lang").map_groups(stats, batch_format="numpy")
            .sort("lang").select_columns(cols))


def knn_mutual_clusters(sf_dir: str, k: int = 3) -> pa.Table:
    """MUTUAL-kNN semantic clustering: connected components over the
    edges where a is in b's top-k AND b is in a's (the standard
    symmetrization that keeps hub vectors from chaining unrelated
    clusters); component label = min vec_id.  Composition: integer-
    ranked :func:`knn_graph_table` → packed-pair mutuality count →
    the dedup family's cluster machinery.  Under force-scale the knn
    edges STAY A DATASET end-to-end: mutuality is the distributed
    ``_packed_pair_counts`` count==2 filter over the canonicalized
    edge pairs (same sort-based exchange the dedup family uses), and
    clustering is ``duplicate_clusters``' scale path — no O(n·k)
    driver arrays.  Below scale the edges are driver-resident (the
    broadcast knn path already returns a table) and the same filter
    is one ``np.unique``."""
    import ray.data as rd

    from hedonic_ray.context import force_scale
    from hedonic_ray.ops.dedup import duplicate_clusters

    if force_scale():
        import ray.data as rd

        configure_context()
        emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        knn_ds = sim.knn_graph_ds(emb, k=k)

        def canon(t: pa.Table) -> pa.Table:
            src = t.column("src").to_numpy().astype(np.int64)
            nbr = t.column("nbr").to_numpy().astype(np.int64)
            return pa.table({"a": pa.array(np.minimum(src, nbr)),
                             "b": pa.array(np.maximum(src, nbr))})

        from hedonic_ray.ops.dedup import _packed_pair_counts

        counts = _packed_pair_counts(
            knn_ds.map_batches(canon, batch_format="pyarrow"))
        mutual = (counts.filter(expr="i == 2")
                  .select_columns(["a", "b"]))
        comp = duplicate_clusters(mutual, _n_vecs(sf_dir))
        return pa.table({"vec_id": pa.array(np.arange(len(comp)),
                                            pa.int64()),
                         "cluster": pa.array(comp, pa.int64())})

    knn = knn_graph_table(sf_dir, k=k)
    src = knn.column("src").to_numpy()
    nbr = knn.column("nbr").to_numpy()
    a = np.minimum(src, nbr)
    b = np.maximum(src, nbr)
    key = a * np.int64(1 << 31) + b
    uk, cnt = np.unique(key, return_counts=True)
    mut = uk[cnt == 2]          # both directions present
    pairs = rd.from_arrow(pa.table({
        "a": pa.array(mut // (1 << 31), pa.int64()),
        "b": pa.array(mut % (1 << 31), pa.int64())}))
    comp = duplicate_clusters(pairs, _n_vecs(sf_dir))
    return pa.table({"vec_id": pa.array(np.arange(len(comp)), pa.int64()),
                     "cluster": pa.array(comp, pa.int64())})


def _n_vecs(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows


def char_classes(sf_dir: str):
    """Per-doc uppercase/digit/whitespace census (column kernels)."""
    return ts.add_char_classes(_docs(sf_dir, ["doc_id", "text"]))


def editdist_dup_pairs(sf_dir: str, max_dist: int = 60) -> "object":
    """SimHash recall → exact prefix-200 Levenshtein verify: the
    edit-distance near-dup stage (catches char-level edits n-gram
    Jaccard over words dilutes).  The fixture distances are bimodal
    (true dups ≤ 4, hash-collision false positives ≥ 138), so the 60
    cut is semantics, not tuning."""
    return dd.editdist_verify_pairs(
        _simhash_pairs_ds(sf_dir), _docs(sf_dir, ["doc_id", "text"]),
        max_dist=max_dist)


def stratified_sample(sf_dir: str, k: int = 20):
    """Per-language fixed-size deterministic sample (mix-control):
    bottom-k md5(doc_id) within each lang, sorted output."""
    from hedonic_ray.ops.sampling import stratified_bottomk_sample

    out = stratified_bottomk_sample(
        _docs(sf_dir, ["doc_id", "lang"]), id_col="doc_id",
        stratum_col="lang", k=k)

    def drop_h(t: pa.Table) -> pa.Table:
        return t.select(["lang", "doc_id"])

    return (out.map_batches(drop_h, batch_format="pyarrow")
            .sort(["lang", "doc_id"]))


def mixture_weights(sf_dir: str, target: int = 100_000):
    """TEMPERATURE-RESAMPLED SOURCE MIXTURE (the domain-mixing step
    every multi-source pretraining corpus runs — τ = 0.5 here, i.e.
    weight ∝ √count, the Pile/mT5-style upweighting of small sources):
    per-source doc counts → integer weights
    ``w_e6 = floor(1e6 · sqrt(count))`` (IEEE sqrt is correctly
    rounded, so the quantized weight is bit-identical cross-engine) →
    resampling quota ``quota = target · w_e6 // Σ w_e6``.

    Shape: one per-batch ``np.unique`` count partial (combiner) → one
    grouped sum exchange → the per-SOURCE result (bounded by the
    source vocabulary, not the corpus) is finished on the driver.
    Columns: source, n_docs, weight_e6, quota."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["source"])

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("source").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"source": pa.array(u.astype(str)),
                         "c": pa.array(c.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("source").aggregate(Sum("c", alias_name="n_docs")))
    rows = sorted(agg.take_all(), key=lambda r: r["source"])
    src = [r["source"] for r in rows]
    n = np.array([r["n_docs"] for r in rows], dtype=np.int64)
    w = np.floor(1e6 * np.sqrt(n.astype(np.float64))).astype(np.int64)
    quota = (int(target) * w) // max(int(w.sum()), 1)
    return pa.table({"source": pa.array(src, pa.string()),
                     "n_docs": pa.array(n),
                     "weight_e6": pa.array(w),
                     "quota": pa.array(quota)})


def mixture_sample(sf_dir: str, target: int = 40):
    """The EXECUTION half of temperature-resampled mixing: draw each
    source's `mixture_weights` quota as the deterministic bottom-quota
    by md5(doc_id) within the source
    (`ops/sampling.stratified_quota_sample`).  The sampled rows
    themselves are the output, so the gate hashes the actual draw.
    Columns: source, doc_id."""
    from hedonic_ray.ops.sampling import stratified_quota_sample

    w = mixture_weights(sf_dir, target=target)
    quotas = dict(zip(w.column("source").to_pylist(),
                      w.column("quota").to_pylist()))
    out = stratified_quota_sample(
        _docs(sf_dir, ["doc_id", "source"]), id_col="doc_id",
        stratum_col="source", quotas=quotas)
    return out.sort(["source", "doc_id"])


def intake_filter(sf_dir: str):
    """The C4/RefinedWeb-style INTAKE FILTER chain as ONE fused map
    stage — per doc, integer rule flags plus the final keep:
      len_ok      50 ≤ n_chars ≤ 2000
      lang_ok     lang-ID prediction == the labeled lang
      upper_ok    10·n_upper < n_chars  (uppercase ratio < 10 %,
                  exact integer comparison — no float)
      repeat_ok   top-bigram fraction ≤ 20 % (floor-e9 ≤ 2·10⁸)
    keep = all four.  Each rule reuses a kernel a dedicated gate
    query already verifies (lang-ID argmax, char census regex counts,
    Gopher repetition signals); this is the composed filter DAG a
    real intake runs, with NO extra exchange — all rules evaluate
    inside the same batch."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def rules(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        lp = ts.lang_id_batch(batch).column("lang_pred")
        rep = ts.repetition_batch(batch)    # positional: same rows
        n = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.int64)
        nup = pc.count_substring_regex(t, "[A-Z]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        len_ok = (n >= 50) & (n <= 2000)
        lang_ok = pc.equal(lp, batch.column("lang")).to_numpy(
            zero_copy_only=False)
        upper_ok = 10 * nup < n
        rep_ok = (rep.column("top_bigram_frac_e9").to_numpy()
                  <= 200_000_000)
        keep = len_ok & lang_ok & upper_ok & rep_ok

        def b(x):
            return pa.array(x.astype(np.int64))

        return pa.table({"doc_id": batch.column("doc_id"),
                         "len_ok": b(len_ok), "lang_ok": b(lang_ok),
                         "upper_ok": b(upper_ok), "repeat_ok": b(rep_ok),
                         "keep": b(keep)})

    return ds.map_batches(rules, batch_format="pyarrow")


def dedup_funnel(sf_dir: str) -> pa.Table:
    """DEDUP SURVIVORSHIP FUNNEL — the intake report every corpus
    pipeline publishes: documents surviving each successive stage
      0 corpus        all documents
      1 exact         byte-identical dedup keep-list
      2 normalized    + case/punct/whitespace-canonical dedup
      3 near_dup      + MinHash→exact-Jaccard cluster representatives
                        (min doc_id per cluster, the keep rule)
    Each stage is an operator with its own green gate query; the
    funnel composes their keep-sets by intersection (a doc survives
    stage k iff it survived every stage ≤ k), so the counts are
    monotone by construction.

    Shape: DISTRIBUTED multi-way semi-join — each stage's keep-list
    stays a Dataset tagged with a bit weight (exact→1, normalized→2,
    near-dup rep→4), ONE ``union → groupby(doc_id).Sum`` exchange
    folds them, and per-batch partial counts of the bit patterns
    reduce to three integers on the driver.  No keep-list is ever
    collected as a Python set (the near-dup representatives come from
    the cluster labels ``minhash_dedup`` already returns; at corpus
    scale its engine-CC path would hand them over as a Dataset the
    same way)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    n = _n_docs(sf_dir)

    def tagged(ds, bit: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t.column("doc_id"),
                "tag": pa.array(np.full(t.num_rows, bit, np.int64))})

        return ds.map_batches(f, batch_format="pyarrow")

    s_exact = tagged(_exact_keep_ds(sf_dir), 1)
    s_norm = tagged(_norm_keep_ds(sf_dir), 2)
    comp = _minhash_comp(sf_dir)
    # cluster label IS the min member doc_id — the representatives
    s_reps = tagged(rd.from_arrow(pa.table({
        "doc_id": pa.array(np.unique(comp))})), 4)

    tags = (s_exact.union(s_norm).union(s_reps)
            .groupby("doc_id").aggregate(Sum("tag", alias_name="t")))

    def partial_counts(t: pa.Table) -> pa.Table:
        v = t.column("t").to_numpy().astype(np.int64)
        return pa.table({
            "s1": pa.array([int((v & 1 == 1).sum())], pa.int64()),
            "s2": pa.array([int((v & 3 == 3).sum())], pa.int64()),
            "s3": pa.array([int((v == 7).sum())], pa.int64())})

    rows = tags.map_batches(partial_counts,
                            batch_format="pyarrow").take_all()
    s1 = sum(int(r["s1"]) for r in rows)
    s2 = sum(int(r["s2"]) for r in rows)
    s3 = sum(int(r["s3"]) for r in rows)
    return pa.table({
        "stage": pa.array([0, 1, 2, 3], pa.int64()),
        "name": pa.array(["corpus", "exact", "normalized", "near_dup"],
                         pa.string()),
        "n_docs": pa.array([n, s1, s2, s3], pa.int64()),
    })


def wordlen_hist(sf_dir: str):
    """Corpus word-length histogram."""
    return ts.word_length_histogram(_docs(sf_dir, ["doc_id", "text"]))


def pack_plan(sf_dir: str, chunk_tokens: int = 512):
    """GPT-style concat-and-chunk packing plan over the corpus."""
    return ts.pack_plan(_docs(sf_dir, ["doc_id", "text"]),
                        chunk_tokens=chunk_tokens).sort("doc_id")


def greedy_search(sf_dir: str) -> pa.Table:
    """Greedy routing over the exact k-NN graph for the stride-25
    query set (`ops/similarity.greedy_knn_search`), query order."""
    import ray.data as rd

    from hedonic_ray.context import configure_context
    from hedonic_ray.ops.similarity import greedy_knn_search

    configure_context()
    return greedy_knn_search(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]))


def pca_direction(sf_dir: str) -> pa.Table:
    """Leading PCA direction of the embedding second-moment matrix by
    fixed-round integer power iteration
    (`ops/similarity.pca_power_direction`), dim order."""
    import ray.data as rd

    from hedonic_ray.context import configure_context
    from hedonic_ray.ops.similarity import pca_power_direction

    configure_context()
    return pca_power_direction(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["embedding"]))


def centroid_classify(sf_dir: str):
    """Exact nearest-centroid label re-assignment over the embeddings
    table (`ops/similarity.centroid_classify`)."""
    import ray.data as rd

    from hedonic_ray.context import configure_context
    from hedonic_ray.ops.similarity import centroid_classify as cc

    configure_context()
    return cc(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding", "label"]))


def recall_audit(sf_dir: str):
    """Recall@5 of the single-probe label-centroid bucket ANN vs the
    exact brute-force top-5, per sampled query
    (`ops/similarity.ann_recall_audit`)."""
    import ray.data as rd

    from hedonic_ray.context import configure_context
    from hedonic_ray.ops.similarity import ann_recall_audit

    configure_context()
    return ann_recall_audit(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding", "label"]),
        k=5, stride=10)


def chunk_plan(sf_dir: str, window: int = 64, stride: int = 48):
    """Per-document sliding-window chunk plan (64-token windows every
    48 tokens) — the RAG-style chunking counterpart of `pack_plan`."""
    return ts.chunk_plan(_docs(sf_dir, ["doc_id", "text"]),
                         window=window, stride=stride) \
        .sort(["doc_id", "chunk_id"])


def decontaminate(sf_dir: str, k: int = 8, bench_k: int = 25):
    """Contaminated-training-doc report against the deterministic
    bottom-25-md5 benchmark split (the same split
    ``text_bottomk_sample`` verifies): (doc_id, n_shared word-8-grams)
    for every non-benchmark doc sharing at least one 8-gram with a
    benchmark doc — the GPT-3/Llama-style eval-decontamination gate."""
    from hedonic_ray.ops.sampling import bottomk_sample

    bench = bottomk_sample(_docs(sf_dir, ["doc_id"]), id_col="doc_id",
                           k=bench_k)
    return dd.decontaminate_counts(
        _docs(sf_dir, ["doc_id", "text"]),
        bench.column("doc_id").to_numpy(), k=k).sort("doc_id")


def heavy_hitters(sf_dir: str, k_track: int = 64, k_report: int = 10):
    """Top-10 corpus terms via the two-pass Misra-Gries sketch
    (streaming heavy hitters: only O(batches·k_track) counter rows
    leave the workers, never the token stream); equals the exact
    top-10 by the MG survival guarantee, runtime-asserted."""
    from hedonic_ray.ops.sketch import heavy_hitter_terms

    return heavy_hitter_terms(_docs(sf_dir, ["doc_id", "text"]),
                              k_track=k_track, k_report=k_report)


def cms_heavy_hitters(sf_dir: str, denom: int = 64):
    """All corpus terms with frequency ≥ N/64 and their EXACT counts,
    via the Count-Min-sketch candidate filter + exact rescore
    (`ops/sketch.cms_heavy_terms`) — the no-false-negative complement
    of the Misra-Gries `heavy_hitters` report."""
    from hedonic_ray.ops.sketch import cms_heavy_terms

    return cms_heavy_terms(_docs(sf_dir, ["doc_id", "text"]), denom=denom)


def incremental_dedup(sf_dir: str, k: int = 3):
    """Crawl-refresh near-dup report: sources src0–src9 are the
    EXISTING corpus, src10–src19 the NEW snapshot (the fixture's
    source = src{doc_id % 20}); (a=old doc, b=new doc, jacc_e9) at
    word-3-gram Jaccard ≥ 0.7, the cross-side-only inverted index."""
    import pyarrow.compute as pc

    def side_filter(want_new: bool):
        def f(t: pa.Table) -> pa.Table:
            sfx = pc.cast(pc.utf8_slice_codeunits(
                t.column("source"), 3, 99), pa.int64())
            m = pc.greater_equal(sfx, pa.scalar(10, pa.int64()))
            return t.filter(m if want_new else pc.invert(m)).select(
                ["doc_id", "text"])

        return f

    cols = ["doc_id", "text", "source"]
    old = _docs(sf_dir, cols).map_batches(side_filter(False),
                                          batch_format="pyarrow")
    new = _docs(sf_dir, cols).map_batches(side_filter(True),
                                          batch_format="pyarrow")
    return dd.incremental_jaccard_pairs(old, new, _n_docs(sf_dir),
                                        k=k).sort(["a", "b"])


def ngram_novelty(sf_dir: str, k: int = 3):
    """(doc_id, n_novel): distinct word-3-grams first introduced by
    each document, in doc_id order."""
    return dd.ngram_novelty_counts(
        _docs(sf_dir, ["doc_id", "text"]), k=k).sort("doc_id")


def vocab_growth(sf_dir: str, bucket: int = 1):
    """Heaps-law vocabulary growth curve on the doc_id order (the
    fixture vocabulary saturates within the first 9 docs, so the
    per-doc grid is the discriminating one)."""
    return ts.vocab_growth(_docs(sf_dir, ["doc_id", "text"]),
                           bucket=bucket)


def bpe_merges(sf_dir: str, rounds: int = 3) -> pa.Table:
    """BPE tokenizer-training merge table: the first ``rounds`` learned
    merges with their exact weighted pair counts and the corpus token
    length after each merge (`ops/bpe.py`)."""
    from hedonic_ray.ops.bpe import bpe_train_rounds

    return bpe_train_rounds(_docs(sf_dir, ["doc_id", "text"]),
                            rounds=rounds)


def dbscan_clusters(sf_dir: str, *, threshold_e6: int = 300_000,
                    min_nbrs: int = 4) -> pa.Table:
    """Density-based clustering of the embedding table: DBSCAN with
    the rounded-cosine ε-ball (core/border/noise roles + min-id
    cluster labels; `ops/similarity.py:dbscan_cosine`)."""
    import ray.data as rd

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return sim.dbscan_cosine(emb, _n_vecs(sf_dir),
                             threshold_e6=threshold_e6,
                             min_nbrs=min_nbrs)


def lm_scores(sf_dir: str):
    """Per-doc unigram-LM surprisal quality scores
    (`ops/textstats.py:lm_surprisal_scores`), doc_id order."""
    return ts.lm_surprisal_scores(
        _docs(sf_dir, ["doc_id", "text"])).sort("doc_id")


def bigram_lm(sf_dir: str):
    """Per-doc bigram-LM surprisal quality scores
    (`ops/textstats.py:bigram_lm_scores`), doc_id order."""
    return ts.bigram_lm_scores(
        _docs(sf_dir, ["doc_id", "text"])).sort("doc_id")


def bm25_scores(sf_dir: str) -> pa.Table:
    """Exact-integer Lucene-BM25 top-10 docs for two fixed 2-term
    queries (`ops/textstats.py:bm25_topk`), (query, score desc,
    doc) order."""
    return ts.bm25_topk(_docs(sf_dir, ["doc_id", "text"]))


def entropy_scores(sf_dir: str):
    """Per-doc token-distribution Shannon entropy as exact e6
    integers (`ops/textstats.py:token_entropy`), doc_id order."""
    return ts.token_entropy(
        _docs(sf_dir, ["doc_id", "text"])).sort("doc_id")


def multimodal_audio_energy(sf_dir: str) -> pa.Table:
    """Per-window energy/peak of the audio-kind media blobs
    (`ops/multimodal.py:audio_window_energy`), (doc, win) order."""
    import ray.data as rd

    configure_context()
    media = rd.from_arrow(mm.synth_media_table(_n_docs(sf_dir),
                                               body="grid"))
    t = pa.concat_tables(
        b for b in mm.audio_window_energy(media).iter_batches(
            batch_size=65536, batch_format="pyarrow"))
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending"),
                                                ("win", "ascending")]))


def multimodal_phash(sf_dir: str, *, max_hamming: int = 3) -> pa.Table:
    """Perceptual-hash (aHash) near-duplicate image pairs over the
    grid-body media fixture: decode-plane average hash → lossless
    simhash banding → exact popcount verify
    (`ops/multimodal.py:phash_dup_pairs`)."""
    import ray.data as rd

    configure_context()
    media = rd.from_arrow(mm.synth_media_table(_n_docs(sf_dir),
                                               body="grid"))
    return phash_sorted(mm.phash_dup_pairs(media,
                                           max_hamming=max_hamming))


def phash_sorted(pairs_ds) -> pa.Table:
    t = pa.concat_tables(
        b for b in pairs_ds.iter_batches(batch_size=65536,
                                         batch_format="pyarrow"))
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("a", "ascending"),
                                                ("b", "ascending")]))


def weighted_sample(sf_dir: str, k: int = 50) -> pa.Table:
    """Length-weighted fixed-size document sample
    (`ops/sampling.py:weighted_bottomk_sample`, weight = n_chars)."""
    from hedonic_ray.ops.sampling import weighted_bottomk_sample

    return weighted_bottomk_sample(
        _docs(sf_dir, ["doc_id", "n_chars"]), id_col="doc_id",
        weight_col="n_chars", k=k)


def textrank_keywords(sf_dir: str, *, iters: int = 3, k: int = 20) -> pa.Table:
    """TEXTRANK keyword extraction (Mihalcea & Tarau 2004): build the
    word CO-OCCURRENCE GRAPH (adjacent \\S+ tokens, undirected,
    deduped, self-pairs dropped), run the ENGINE'S OWN PageRank over
    its CSR blocks for ``iters`` fixed iterations, report the top-k
    terms by ×1e9 half-up-rounded rank (ties → term asc).  The
    composition query: text stage → graph build → superstep kernel,
    all existing machinery — vocabulary ids are the sorted-distinct
    index (broadcast below any realistic vocab size; the url→id
    dense-rank join of `graph/build.py` is the stated scale path),
    edges pre-deduped per batch, the vocab-sized rank vector is the
    usual O(V) per-vertex output."""
    import ray

    from hedonic_ray.algos.pagerank import pagerank
    from hedonic_ray.graph.build import build_link_graph
    from hedonic_ray.ops.textstats import _flat_words

    docs = _docs(sf_dir, ["doc_id", "text"])
    tf = ts.term_total_frequency(docs)
    terms = np.array(sorted(r["term"] for r in tf.take_all()), dtype=str)
    n_vocab = len(terms)
    vref = ray.put(terms)

    def edges(batch: pa.Table) -> pa.Table:
        flat, _lens, doc_of = _flat_words(batch, "text")
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        vs = ray.get(vref)
        ids = np.searchsorted(vs, np.asarray(flat).astype(str))
        adj = (doc_of[:-1] == doc_of[1:]) & (ids[:-1] != ids[1:])
        if not adj.any():
            return empty
        a = np.minimum(ids[:-1][adj], ids[1:][adj]).astype(np.int64)
        b = np.maximum(ids[:-1][adj], ids[1:][adj]).astype(np.int64)
        key = np.unique(a * np.int64(n_vocab) + b)
        return pa.table({"src": pa.array(key // n_vocab, pa.int64()),
                         "dst": pa.array(key % n_vocab, pa.int64())})

    g = build_link_graph(docs.map_batches(edges, batch_format="pyarrow"),
                         n_vocab, directed=False)
    r = pagerank(g, max_iters=iters, tol=0.0).state["rank"]
    rank_e9 = np.floor(r * 1e9 + 0.5).astype(np.int64)
    order = np.lexsort((terms, -rank_e9))[:k]
    return pa.table({
        "term": pa.array(terms[order].astype(object), pa.string()),
        "rank_e9": pa.array(rank_e9[order], pa.int64())})


def sq8_quant_audit(sf_dir: str):
    """Per-vector SQ8 quantization audit
    (`ops/similarity.py:sq8_audit`)."""
    import ray.data as rd

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return sim.sq8_audit(emb)


def bpe_apply(sf_dir: str, rounds: int = 3):
    """Per-doc token counts under the learned BPE merges
    (`ops/bpe.py:bpe_encode_counts`), doc_id order."""
    from hedonic_ray.ops.bpe import bpe_encode_counts

    return bpe_encode_counts(_docs(sf_dir, ["doc_id", "text"]),
                             rounds=rounds).sort("doc_id")


def kmeans_converged(sf_dir: str, n_clusters: int = 4, iters: int = 3):
    """Final centroid grid after 3 exact-integer Lloyd rounds
    (`ops/similarity.py:kmeans_iterations`)."""
    import ray.data as rd

    configure_context()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return sim.kmeans_iterations(emb, n_clusters=n_clusters, iters=iters)
