"""Text-analysis stages for training-data pipelines over ``documents``.

Beyond the reference's surface (SURVEY §2 note): language-ID, quality
scoring, token counting, document fingerprinting — each a vectorized
``map_batches`` stage (pyarrow.compute regex kernels / numpy; compiled
state lives in actor ``__init__``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hedonic_ray.context import actor_pool
from hedonic_ray.functions.hashing import hash_strings

TOKEN_RE = r"\S+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[!-/:-@\[-`{-~]"

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "de"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "que", "des", "dans"},
}


def add_token_counts(ds, col: str = "text"):
    """n_tokens (whitespace) + n_bpe_tokens (BPE-ish regex) — pure
    pyarrow.compute kernels, zero Python per row."""

    def f(batch: pa.Table) -> pa.Table:
        t = batch.column(col)
        batch = batch.append_column(
            "n_tokens", pc.cast(pc.count_substring_regex(t, TOKEN_RE), pa.int64()))
        return batch.append_column(
            "n_bpe_tokens", pc.cast(pc.count_substring_regex(t, BPE_RE), pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def add_quality_scores(ds, col: str = "text"):
    """Length / punctuation / stopword / mean-word-length heuristics →
    ``quality`` in [0,1].  All pyarrow.compute."""

    def f(batch: pa.Table) -> pa.Table:
        t = batch.column(col)
        n_chars = pc.cast(pc.utf8_length(t), pa.float64())
        n_tok = pc.cast(pc.count_substring_regex(t, TOKEN_RE), pa.float64())
        n_punct = pc.cast(pc.count_substring_regex(t, PUNCT_RE), pa.float64())
        safe_tok = pc.max_element_wise(n_tok, 1.0)
        safe_chars = pc.max_element_wise(n_chars, 1.0)
        punct_ratio = pc.divide(n_punct, safe_chars)
        mean_word_len = pc.divide(n_chars, safe_tok)
        stop = pa.array(np.zeros(len(t)), pa.float64())
        for words in _STOPWORDS.values():
            pat = r"(?i)\b(" + "|".join(sorted(words)) + r")\b"
            stop = pc.add(stop, pc.cast(pc.count_substring_regex(t, pat),
                                        pa.float64()))
        stop_ratio = pc.divide(stop, safe_tok)
        # crude composite: long-enough docs with sane word length,
        # some stopwords, low punctuation density
        len_ok = pc.min_element_wise(pc.divide(n_tok, 20.0), 1.0)
        wl = pc.subtract(mean_word_len, 3.0)
        wl_ok = pc.max_element_wise(
            pc.subtract(1.0, pc.divide(pc.abs(wl), 7.0)), 0.0)
        stop_ok = pc.min_element_wise(pc.multiply(stop_ratio, 4.0), 1.0)
        punct_ok = pc.max_element_wise(
            pc.subtract(1.0, pc.multiply(punct_ratio, 5.0)), 0.0)
        quality = pc.divide(
            pc.add(pc.add(len_ok, wl_ok), pc.add(stop_ok, punct_ok)), 4.0)
        for name, arr in [("n_chars_calc", pc.cast(n_chars, pa.int64())),
                          ("n_tokens", pc.cast(n_tok, pa.int64())),
                          ("punct_ratio", punct_ratio),
                          ("mean_word_len", mean_word_len),
                          ("stopword_ratio", stop_ratio),
                          ("quality", quality)]:
            batch = batch.append_column(name, arr)
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


# langs in sorted order = the tie-break order (argmax first-hit)
_LANGS = sorted(_STOPWORDS)
_LANG_PATS = {lang: r"(?i)\b(" + "|".join(sorted(_STOPWORDS[lang])) + r")\b"
              for lang in _LANGS}
_CJK_PAT = "[一-鿿]"


def lang_id_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Column-kernel language ID: per-language stopword counts via
    pyarrow.compute's RE2 regex (ASCII ``\\b`` — the same boundary the
    DuckDB oracle uses), argmax with ties → alphabetically-first
    language, all-zero → und, any CJK codepoint → zh.  No per-doc
    Python — the whole stage is four count_substring_regex passes plus
    a numpy argmax."""
    t = batch.column(col)
    counts = np.stack([
        pc.count_substring_regex(t, _LANG_PATS[lang])
          .to_numpy(zero_copy_only=False)
        for lang in _LANGS])
    preds = np.array(_LANGS, dtype=object)[counts.argmax(axis=0)]
    preds[counts.max(axis=0) == 0] = "und"
    cjk = pc.match_substring_regex(t, _CJK_PAT).to_numpy(zero_copy_only=False)
    preds[cjk] = "zh"
    return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def add_lang_id(ds):
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


# PII-style redaction: (pattern, replacement) applied IN ORDER — the
# DuckDB oracle chains regexp_replace with the same RE2 patterns, so
# order and pattern syntax must stay lookahead-free and identical
REDACT_RULES = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b[0-9]{6,}\b", "<NUM>"),
)


def redact_batch(batch: pa.Table, col: str = "text",
                 out: str = "clean_text") -> pa.Table:
    """Rule-chain redaction as pure pyarrow.compute RE2 kernels — one
    `replace_substring_regex` pass per rule, zero Python per row.  The
    training-data use: scrub emails/urls/long ids before tokenization
    so they can't leak into the model vocabulary."""
    t = batch.column(col)
    for pat, repl in REDACT_RULES:
        t = pc.replace_substring_regex(t, pat, repl)
    return batch.append_column(out, t)


def add_redaction(ds, col: str = "text"):
    return ds.map_batches(lambda b: redact_batch(b, col),
                          batch_format="pyarrow")


def term_document_frequency(ds, col: str = "text"):
    """Distributed document frequency per whitespace term.

    Shape: per batch, each doc's DISTINCT terms are counted once
    (numpy unique over the batch's (term, doc) pairs — the per-batch
    COMBINER), then ONE ``groupby(term).sum`` shuffle produces the
    global df.  The combiner bounds shuffle volume by the batch
    vocabulary, not the token count — the standard wordcount shape a
    100-TB corpus needs."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # one Arrow regex split for the whole batch (the \s+ split +
        # empty-token filter is exactly str.split() / \S+
        # tokenization) — no per-document Python
        words = pc.split_pattern_regex(batch.column(col),
                                       r"\s+").combine_chunks()
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = words.flatten()
        docs = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        docs = docs[keep]
        if not len(docs):
            return pa.table({"term": pa.array([], pa.string()),
                             "df_partial": pa.array([], pa.int64())})
        # distinct (doc, term) pairs, then count docs per term
        uniq_terms, inv = np.unique(np.asarray(flat).astype(str),
                                    return_inverse=True)
        key = docs * np.int64(len(uniq_terms)) + inv
        uk = np.unique(key)
        tf = np.bincount((uk % len(uniq_terms)).astype(np.int64),
                         minlength=len(uniq_terms))
        return pa.table({"term": pa.array(uniq_terms.astype(object),
                                          pa.string()),
                         "df_partial": pa.array(tf.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=2048)
    return partials.groupby("term").aggregate(Sum("df_partial",
                                                  alias_name="df"))


FP_MULT = 1099511628211  # FNV-64 prime — polynomial hash base


class Fingerprint:
    """Winnowing document fingerprints (Schleimer et al. 2003,
    "Winnowing: Local Algorithms for Document Fingerprinting"): a
    polynomial hash mod 2^64 over CODEPOINT k-grams, a sliding-window
    minimum, and the fingerprint SET = the distinct window minima.

    Emitting the set (rather than folding it into one value) is both
    the shape MOSS-style overlap detection needs and exactly
    reproducible in ANSI SQL (HUGEINT mod-2^64 arithmetic + a window
    MIN — see ``__ray_entry__.oracle_sql()['text_fingerprints']``).
    Docs shorter than ``k`` codepoints have no k-grams → empty set.
    """

    def __init__(self, k: int = 8, window: int = 16):
        self.k, self.window = k, window

    def _kgram_hashes(self, s: str) -> np.ndarray:
        k = self.k
        cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        n = len(cp) - k + 1
        if n <= 0:
            return np.empty(0, np.uint64)
        h = np.zeros(n, dtype=np.uint64)
        mult = np.uint64(FP_MULT)
        with np.errstate(over="ignore"):
            for i in range(k):
                h = h * mult + cp[i:i + n].astype(np.uint64)
        return h

    def _fp(self, s: str) -> tuple:
        """Sorted distinct window minima of the k-gram hash sequence."""
        h = self._kgram_hashes(s)
        if len(h) == 0:
            return ()
        w = self.window
        if len(h) <= w:
            return (int(h.min()),)
        from numpy.lib.stride_tricks import sliding_window_view

        return tuple(int(x) for x in
                     np.unique(sliding_window_view(h, w).min(axis=1)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for i, s in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            for x in self._fp(s):
                ids.append(i)
                fps.append(x)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "fingerprint": pa.array(np.array(fps, dtype=np.uint64)
                                    .astype(np.int64)),
        })


def add_fingerprints(ds, k: int = 8, window: int = 16):
    """(doc_id, fingerprint) rows — one row per selected winnowing
    hash; fingerprints are int64 (two's-complement view of the uint64
    hash)."""
    return ds.map_batches(Fingerprint, fn_constructor_args=(k, window),
                          batch_format="pyarrow", batch_size=1024,
                          concurrency=actor_pool())


def repetition_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    table A1 heuristics; public-heuristic re-derivation — no
    counterpart in the reference repo):

    - ``n_lines``          — ``\\n``-separated line count (≥ 1),
    - ``dup_line_frac_e9`` — ``(n_lines − n_distinct_lines) / n_lines``,
    - ``top_bigram_frac_e9`` — occurrences of the most frequent word
      2-gram over total 2-gram occurrences (0 when < 2 words).

    Fractions are FLOOR-scaled ×1e9 integers (exact ``//`` on both
    engines).  Fully vectorized: ``pc.split_pattern`` for lines/words,
    Arrow C++ hash ``group_by`` for the per-(doc, line) and
    per-(doc, bigram) distinct/count steps — exact string semantics
    (no hash-collision caveat), zero Python per row."""
    n = batch.num_rows
    doc_ids = batch.column("doc_id")
    t = pc.fill_null(batch.column(col), "")

    # --- duplicate-line fraction ------------------------------------
    lines = pc.split_pattern(t, "\n").combine_chunks()
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n_lines = pc.list_value_length(lines).to_numpy().astype(np.int64)
    flat_lines = pc.list_flatten(lines)
    line_doc = np.repeat(np.arange(n, dtype=np.int64), n_lines)
    uniq = pa.table({"d": line_doc, "l": flat_lines}).group_by(
        ["d", "l"]).aggregate([])
    n_uniq = np.bincount(uniq.column("d").to_numpy(), minlength=n)
    dup_frac_e9 = (n_lines - n_uniq) * 1_000_000_000 // n_lines

    # --- top-bigram fraction ----------------------------------------
    words = pc.split_pattern_regex(t, r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n_words = pc.list_value_length(words).to_numpy().astype(np.int64)
    flat_words = pc.list_flatten(words)
    word_doc = np.repeat(np.arange(n, dtype=np.int64), n_words)
    keep = pc.not_equal(flat_words, "").to_numpy(zero_copy_only=False)
    flat_words = flat_words.filter(pa.array(keep))
    word_doc = word_doc[keep]
    top_e9 = np.zeros(n, dtype=np.int64)
    if len(word_doc) > 1:
        same = word_doc[:-1] == word_doc[1:]
        bg = pa.table({
            "d": word_doc[:-1][same],
            "w1": flat_words.slice(0, len(flat_words) - 1).filter(pa.array(same)),
            "w2": flat_words.slice(1).filter(pa.array(same)),
        })
        if bg.num_rows:
            cnt = bg.group_by(["d", "w1", "w2"]).aggregate([("d", "count")])
            cd = cnt.column("d").to_numpy()
            cc = cnt.column("d_count").to_numpy().astype(np.int64)
            mx = np.zeros(n, dtype=np.int64)
            np.maximum.at(mx, cd, cc)
            tot = np.bincount(cd, weights=cc, minlength=n).astype(np.int64)
            nz = tot > 0
            top_e9[nz] = mx[nz] * 1_000_000_000 // tot[nz]
    return pa.table({
        "doc_id": doc_ids,
        "n_lines": pa.array(n_lines, pa.int64()),
        "dup_line_frac_e9": pa.array(dup_frac_e9, pa.int64()),
        "top_bigram_frac_e9": pa.array(top_e9, pa.int64()),
    })


def add_repetition_signals(ds, col: str = "text"):
    """(doc_id, n_lines, dup_line_frac_e9, top_bigram_frac_e9) —
    per-document repetition/quality signals, one stateless vectorized
    ``map_batches`` stage."""
    return ds.map_batches(lambda b: repetition_batch(b, col),
                          batch_format="pyarrow")


def _flat_words(batch: pa.Table, col: str):
    """Arrow split → (flat word StringArray, per-row word counts,
    per-word row index) — the shared explode for the per-doc
    vocabulary kernels below.  Pure Arrow/numpy.

    Tokenization is ``\\s+`` with empty tokens dropped — the same rule
    the SQL oracles use (``regexp_extract_all(text, '\\S+')``) and the
    same rule :func:`term_document_frequency` uses, so every consumer
    (tf, ttr, bigrams, passages, tfidf) agrees with the oracles on
    corpora with tabs/newlines/repeated/leading/trailing whitespace,
    not just on single-space-joined fixtures."""
    words = pc.split_pattern_regex(batch.column(col), r"\s+").combine_chunks()
    offs = words.offsets.to_numpy().astype(np.int64)
    raw_lens = np.diff(offs)
    flat = words.flatten()
    doc_of = np.repeat(np.arange(len(raw_lens), dtype=np.int64), raw_lens)
    nonempty = pc.not_equal(pc.utf8_length(flat), 0)
    ne = nonempty.to_numpy(zero_copy_only=False)
    if not ne.all():
        flat = flat.filter(nonempty)
        doc_of = doc_of[ne]
        lens = np.bincount(doc_of, minlength=len(raw_lens)).astype(np.int64)
    else:
        lens = raw_lens
    return flat, lens, doc_of


def add_ttr(ds, col: str = "text"):
    """Type-token ratio per document: ``(doc_id, n_tokens, n_types,
    ttr_e6 = n_types·10⁶ // n_tokens)`` — all integers (no float tie
    risk against the SQL oracle).

    Vectorized: one Arrow split per batch, one ``np.unique`` over the
    batch vocabulary, one over the packed (doc, word) keys — no
    per-document Python.  The lexical-diversity signal quality
    filters use (Gopher-style vocabulary stats)."""

    def f(batch: pa.Table) -> pa.Table:
        flat, lens, doc_of = _flat_words(batch, col)
        n = batch.num_rows
        n_types = np.zeros(n, dtype=np.int64)
        if len(doc_of):
            # dictionary-encode the batch vocabulary, then count
            # distinct (doc, word_code) pairs per doc
            enc = pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy().astype(np.int64)
            key = np.unique(doc_of * (codes.max() + 1) + codes)
            n_types = np.bincount(key // (codes.max() + 1),
                                  minlength=n).astype(np.int64)
        ttr = np.zeros(n, dtype=np.int64)
        np.floor_divide(n_types * np.int64(1_000_000), lens, out=ttr,
                        where=lens > 0)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pa.array(lens),
                         "n_types": pa.array(n_types),
                         "ttr_e6": pa.array(ttr)})

    return ds.map_batches(f, batch_format="pyarrow")


def duplicated_passages(ds, col: str = "text", chunk_words: int = 16):
    """Passage-level exact dedup (the C4/RefinedWeb intra-corpus
    stage): documents are cut into consecutive ``chunk_words``-word
    passages (the trailing partial passage included) and every passage
    occurring more than once corpus-wide is reported as
    ``(passage, n_occ, n_docs)``.

    Shape: per batch, passages are materialized once and collapsed to
    ``(passage, n_occ_partial, n_docs_partial)`` — documents never
    straddle batches, so per-batch distinct-doc counts sum exactly —
    then ONE ``groupby(passage)`` exchange carries only the distinct
    passage grid.  The per-chunk ``str.join`` is O(tokens/chunk_words)
    string builds per batch (inherent to emitting variable-length
    text), everything around it is numpy."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, lens, doc_of = _flat_words(batch, col)
        empty = pa.table({"passage": pa.array([], pa.string()),
                          "n_occ": pa.array([], pa.int64()),
                          "n_docs": pa.array([], pa.int64())})
        if not len(doc_of):
            return empty
        idx = np.arange(len(doc_of), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens)
        # chunk boundaries: new doc OR word index hits a multiple of W
        new = np.ones(len(doc_of), dtype=bool)
        new[1:] = (doc_of[1:] != doc_of[:-1]) | (idx[1:] % chunk_words == 0)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(doc_of))
        words = flat.to_pylist()
        passages = [" ".join(words[s:e]) for s, e in
                    zip(starts.tolist(), ends.tolist())]
        chunk_doc = doc_of[starts]
        uniq, inv = np.unique(np.array(passages, dtype=object).astype(str),
                              return_inverse=True)
        n_occ = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        dkey = np.unique(inv * np.int64(batch.num_rows) + chunk_doc)
        n_docs = np.bincount(dkey // batch.num_rows,
                             minlength=len(uniq)).astype(np.int64)
        return pa.table({"passage": pa.array(uniq.astype(object),
                                             pa.string()),
                         "n_occ": pa.array(n_occ),
                         "n_docs": pa.array(n_docs)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=2048)
    agg = partials.groupby("passage").aggregate(
        Sum("n_occ", alias_name="n_occ"),
        Sum("n_docs", alias_name="n_docs"))
    return agg.filter(expr="n_occ > 1")


def term_total_frequency(ds, col: str = "text"):
    """Distributed term frequency (total occurrences, not document
    frequency): per batch, one Arrow split + ``np.unique`` with counts
    (the combiner), then ONE ``groupby(term).sum`` — shuffle volume is
    the batch vocabulary."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _flat_words(batch, col)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "tf_partial": pa.array([], pa.int64())})
        uniq, cnt = np.unique(np.asarray(flat).astype(str),
                              return_counts=True)
        return pa.table({"term": pa.array(uniq.astype(object), pa.string()),
                         "tf_partial": pa.array(cnt.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=2048)
    return partials.groupby("term").aggregate(Sum("tf_partial",
                                                  alias_name="tf"))


def tfidf_top_terms(ds, n_docs: int, k: int = 3, col: str = "text",
                    method: str = "auto", broadcast_max: int = 2_000_000):
    """Integer TF-IDF keyword extraction: per document, the top-``k``
    terms by ``score = tf · N // df`` (ties → term asc) — the rational
    tf/df ratio IS the idf ordering without a float log, so the result
    is bit-exact against SQL.

    Two stages: the distributed wordcount (document frequency), then a
    second corpus pass scoring each doc's terms.  The df table rides
    to the scorers as a broadcast sorted (term, df) pair below
    ``broadcast_max`` distinct terms (``ray.put`` once, searchsorted
    per batch); above it — or under force_scale — the (doc, term, tf)
    explosion joins the df table with a hash-partitioned
    ``Dataset.join`` and the per-doc top-k runs in a grouped exchange
    instead."""
    import ray
    from hedonic_ray.context import force_scale

    df_ds = term_document_frequency(ds, col)
    if method == "auto":
        method = "join" if force_scale() else "broadcast"
    if method not in ("broadcast", "join"):
        raise ValueError(f"unknown tfidf_top_terms method {method!r}")

    def doc_tf(batch: pa.Table) -> pa.Table:
        flat, lens, doc_of = _flat_words(batch, col)
        if not len(doc_of):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        words = np.asarray(flat).astype(str)
        uniq, inv = np.unique(words, return_inverse=True)
        key = doc_of * np.int64(len(uniq)) + inv
        uk, tf = np.unique(key, return_counts=True)
        d_idx = (uk // len(uniq)).astype(np.int64)
        t_idx = (uk % len(uniq)).astype(np.int64)
        ids = batch.column("doc_id").to_numpy()
        return pa.table({"doc_id": pa.array(ids[d_idx], pa.int64()),
                         "term": pa.array(uniq[t_idx].astype(object),
                                          pa.string()),
                         "tf": pa.array(tf.astype(np.int64))})

    def topk_within(doc_ids, terms, tf, df):
        score = tf * np.int64(n_docs) // df
        # per-doc top-k: sort by (doc, -score, term), keep first k
        order = np.lexsort((terms, -score, doc_ids))
        d = doc_ids[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = d[1:] != d[:-1]
        pos = np.arange(len(d)) - np.maximum.accumulate(
            np.where(new, np.arange(len(d)), 0))
        keep = pos < k
        sel = order[keep]
        return pa.table({"doc_id": pa.array(doc_ids[sel], pa.int64()),
                         "rank": pa.array((pos[keep] + 1).astype(np.int64)),
                         "term": pa.array(terms[sel].astype(object),
                                          pa.string()),
                         "score": pa.array(score[sel], pa.int64())})

    if method == "broadcast":
        rows = df_ds.take_all()
        terms_sorted = np.array(sorted(r["term"] for r in rows), dtype=str)
        df_by_term = dict((r["term"], int(r["df"])) for r in rows)
        df_sorted = np.array([df_by_term[t] for t in terms_sorted.tolist()],
                             dtype=np.int64)
        lut_ref = ray.put((terms_sorted, df_sorted))

        # FUSED with the tf explosion (one pass over the raw docs): a
        # document's term rows must never straddle the per-doc top-k's
        # batch boundary, and Ray re-batches between stages — rows of
        # the raw documents table ARE whole documents, so fusing makes
        # the boundary guarantee structural
        def score_batch(batch: pa.Table) -> pa.Table:
            t = doc_tf(batch)
            if t.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "rank": pa.array([], pa.int64()),
                                 "term": pa.array([], pa.string()),
                                 "score": pa.array([], pa.int64())})
            ts, dfs = ray.get(lut_ref)
            terms = t.column("term").to_numpy(zero_copy_only=False).astype(str)
            df = dfs[np.searchsorted(ts, terms)]
            return topk_within(t.column("doc_id").to_numpy().astype(np.int64),
                               terms, t.column("tf").to_numpy().astype(np.int64),
                               df)

        return ds.map_batches(score_batch, batch_format="pyarrow",
                              batch_size=2048)

    tf_ds = ds.map_batches(doc_tf, batch_format="pyarrow", batch_size=2048)

    from hedonic_ray.context import drop_empty_blocks

    s_tf = pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                      ("tf", pa.int64())])
    s_df = pa.schema([("term", pa.string()), ("df", pa.int64())])
    j = drop_empty_blocks(tf_ds, s_tf).join(
        drop_empty_blocks(df_ds, s_df), "inner", 8, on=("term",))

    def group_topk(g: dict) -> dict:
        t = topk_within(g["doc_id"].astype(np.int64),
                        g["term"].astype(str),
                        g["tf"].astype(np.int64),
                        g["df"].astype(np.int64))
        return {c: t.column(c).to_numpy(zero_copy_only=False)
                for c in t.column_names}

    return j.groupby("doc_id").map_groups(group_topk, batch_format="numpy")


def bigram_total_frequency(ds, col: str = "text"):
    """Distributed BIGRAM counts (adjacent whitespace-token pairs
    within a document — the n-gram LM statistics stage): per batch,
    one Arrow split + the same-doc adjacency mask + an Arrow
    ``binary_join_element_wise`` builds the batch's bigram strings,
    ``np.unique`` pre-counts them (the combiner), then ONE
    ``groupby(bigram).sum`` — shuffle volume is the batch's bigram
    vocabulary, not its token count."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"bigram": pa.array([], pa.string()),
                          "tf_partial": pa.array([], pa.int64())})
        words = pc.split_pattern_regex(
            batch.column(col), r"\s+").combine_chunks()
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = words.flatten()
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
        if len(doc_of) < 2:
            return empty
        same = doc_of[:-1] == doc_of[1:]
        w1 = flat.slice(0, len(flat) - 1).filter(pa.array(same))
        w2 = flat.slice(1).filter(pa.array(same))
        if len(w1) == 0:
            return empty
        bg = pc.binary_join_element_wise(w1, w2, " ")
        uniq, cnt = np.unique(np.asarray(bg).astype(str),
                              return_counts=True)
        return pa.table({"bigram": pa.array(uniq.astype(object),
                                            pa.string()),
                         "tf_partial": pa.array(cnt.astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bigram")
            .aggregate(Sum("tf_partial", alias_name="tf")))


def add_char_classes(ds, col: str = "text"):
    """Per-document character-class census (the case/digit/whitespace
    signals quality filters cut on, complementing
    :func:`add_quality_scores`): counts of uppercase / digit /
    whitespace characters plus ×10⁹ FLOOR ratios — pure
    ``count_substring_regex`` column kernels, zero Python per row,
    integers only (FLOOR of an exact int/int double has no tie
    rule)."""

    def f(batch: pa.Table) -> pa.Table:
        t = batch.column(col)
        n = pc.cast(pc.utf8_length(t), pa.int64())
        out = {"doc_id": batch.column("doc_id"), "n_chars": n}
        nf = pc.cast(pc.max_element_wise(n, 1), pa.float64())
        for name, pat in (("upper", "[A-Z]"), ("digit", "[0-9]"),
                          ("space", r"\s")):
            c = pc.cast(pc.count_substring_regex(t, pat), pa.int64())
            out[f"n_{name}"] = c
            ratio = pc.divide(pc.cast(c, pa.float64()), nf)
            out[f"{name}_ratio_e9"] = pc.cast(
                pc.floor(pc.multiply(ratio, pa.scalar(1e9))), pa.int64())
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


def word_length_histogram(ds, col: str = "text"):
    """Corpus-wide WORD-LENGTH HISTOGRAM (tokenizer sanity signal):
    (word_len, n_words) over whitespace tokens — one Arrow split +
    ``np.bincount`` per batch (the combiner), one tiny grouped sum."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _flat_words(batch, col)
        if len(flat) == 0:
            return pa.table({"word_len": pa.array([], pa.int64()),
                             "n_words": pa.array([], pa.int64())})
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        lens = lens[lens > 0]        # split artifacts
        cnt = np.bincount(lens)
        nz = np.flatnonzero(cnt)
        return pa.table({"word_len": pa.array(nz.astype(np.int64)),
                         "n_words": pa.array(cnt[nz].astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word_len")
            .aggregate(Sum("n_words", alias_name="n_words"))
            .sort("word_len"))


def pack_plan(ds, chunk_tokens: int = 512, col: str = "text",
              key: str = "doc_id"):
    """CONCAT-AND-CHUNK PACKING PLAN — the final stage of every
    GPT-style pretraining pipeline: documents are concatenated in
    ``key`` order and cut into fixed ``chunk_tokens`` windows; per
    doc, emit its whitespace-token count, its global token offset,
    and the first/last chunk it lands in (exact integers).

    Shape: per-partition token subtotals → a ≤-num-blocks driver
    offset scan (the classic distributed PREFIX SUM — only the
    per-partition totals ever leave the workers) → one stateless map
    attaches offsets.  No sort is needed when the input is already
    key-ordered (parquet row order); the defensive global sort is one
    exchange."""
    import ray
    import pyarrow.compute as pc_

    def counts(t: pa.Table) -> pa.Table:
        return pa.table({key: t.column(key),
                         "n_tokens": pc_.cast(pc_.count_substring_regex(
                             t.column(col), TOKEN_RE), pa.int64())})

    toks = ds.map_batches(counts, batch_format="pyarrow") \
        .sort(key).materialize()

    # per-block subtotals keyed by the block's FIRST doc id (content-
    # addressed, no arrival-order assumption): after the sort, block
    # doc ranges are disjoint, so first-doc-id identifies the block
    sub = []
    for b in toks.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            sub.append((int(b.column(key)[0].as_py()),
                        int(np.sum(b.column("n_tokens").to_numpy()))))
    sub.sort()
    bases = {first: int(base) for (first, _), base in zip(
        sub, np.concatenate(([0], np.cumsum([t for _, t in sub])[:-1])))}
    bases_ref = ray.put(bases)

    def attach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "token_offset": pa.array([], pa.int64()),
                             "first_chunk": pa.array([], pa.int64()),
                             "last_chunk": pa.array([], pa.int64())})
        base = ray.get(bases_ref)[int(t.column(key)[0].as_py())]
        n = t.column("n_tokens").to_numpy()
        off = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        first = off // chunk_tokens
        last = np.where(n > 0, (off + n - 1) // chunk_tokens, first)
        return pa.table({key: t.column(key),
                         "n_tokens": t.column("n_tokens"),
                         "token_offset": pa.array(off.astype(np.int64)),
                         "first_chunk": pa.array(first.astype(np.int64)),
                         "last_chunk": pa.array(last.astype(np.int64))})

    return toks.map_batches(attach, batch_format="pyarrow",
                            batch_size=None)


def vocab_growth(ds, col: str = "text", key: str = "doc_id",
                 bucket: int = 100):
    """VOCABULARY GROWTH CURVE (the Heaps-law audit): distinct terms
    seen within the first N documents, for N on a ``bucket`` grid.
    Expanding distinct needs no rescan — a term enters the vocabulary
    at its FIRST document, so the curve is the running sum of
    first-seen counts: per batch (term, min doc) partials → one
    groupby(term) Min → DISTRIBUTED bucket groupby-count → tiny driver
    cumsum.  The driver collects O(buckets) rows, never O(vocab) —
    at web scale vocabulary is billions of terms and must stay in the
    exchange."""
    from ray.data.aggregate import Count, Min

    def partial(batch: pa.Table) -> pa.Table:
        flat, lens, doc_of = _flat_words(batch, col)
        if not len(doc_of):
            return pa.table({"term": pa.array([], pa.string()),
                             "first_doc": pa.array([], pa.int64())})
        ids = batch.column(key).to_numpy()[doc_of]
        # per-batch combiner: min doc per term
        terms = np.asarray(flat).astype(str)
        keep = terms != ""
        terms, ids = terms[keep], ids[keep]
        order = np.lexsort((ids, terms))
        terms, ids = terms[order], ids[order]
        first = np.concatenate(([True], terms[1:] != terms[:-1]))
        return pa.table({"term": pa.array(terms[first].astype(object),
                                          pa.string()),
                         "first_doc": pa.array(ids[first].astype(np.int64))})

    firsts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("term").aggregate(Min("first_doc",
                                             alias_name="first_doc")))

    def to_bucket(t: pa.Table) -> pa.Table:
        fd = t.column("first_doc").to_numpy()
        return pa.table({"b": pa.array((fd // bucket).astype(np.int64))})

    rows = (firsts.map_batches(to_bucket, batch_format="pyarrow")
            .groupby("b").aggregate(Count(alias_name="c"))
            .take_all())  # O(buckets)
    if not rows:
        return pa.table({"n_docs": pa.array([], pa.int64()),
                         "vocab": pa.array([], pa.int64())})
    bs = np.array([int(r["b"]) for r in rows], np.int64)
    cs = np.array([int(r["c"]) for r in rows], np.int64)
    hi = int(bs.max()) + 1
    counts = np.zeros(hi, np.int64)
    counts[bs] = cs
    grid = (np.arange(hi, dtype=np.int64) + 1) * bucket
    return pa.table({"n_docs": pa.array(grid),
                     "vocab": pa.array(np.cumsum(counts).astype(np.int64))})


def chunk_plan(ds, *, window: int = 64, stride: int = 48,
               col: str = "text", key: str = "doc_id"):
    """PER-DOCUMENT SLIDING-WINDOW CHUNK PLAN — the RAG/eval-time
    counterpart of the GPT-style concat :func:`pack_plan`: each doc is
    cut into ``window``-token chunks every ``stride`` tokens
    (``window − stride`` tokens of overlap), final chunk truncated.
    Emits (doc_id, chunk_id, start_tok, len_tok); a doc with n > 0
    tokens yields ⌊(n−1)/stride⌋ + 1 chunks, an empty doc none.

    Embarrassingly parallel: one vectorized ``map_batches`` (token
    count via the compiled regex, chunk fan-out via repeat/arange) —
    no exchange, no driver state; the SQL oracle is the
    ``unnest(range(...))`` idiom over the same count."""
    import pyarrow.compute as pc_

    if not (0 < stride <= window):
        raise ValueError("chunk_plan needs 0 < stride <= window")

    def f(t: pa.Table) -> pa.Table:
        n = pc_.cast(pc_.count_substring_regex(t.column(col), TOKEN_RE),
                     pa.int64()).to_numpy()
        ids = t.column(key).to_numpy()
        n_chunks = np.where(n > 0, (n - 1) // stride + 1, 0)
        doc = np.repeat(ids, n_chunks)
        nn = np.repeat(n, n_chunks)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             "start_tok": pa.array([], pa.int64()),
                             "len_tok": pa.array([], pa.int64())})
        off = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        cid = np.arange(total, dtype=np.int64) - np.repeat(off, n_chunks)
        start = cid * stride
        ln = np.minimum(window, nn - start)
        return pa.table({key: pa.array(doc, pa.int64()),
                         "chunk_id": pa.array(cid, pa.int64()),
                         "start_tok": pa.array(start, pa.int64()),
                         "len_tok": pa.array(ln, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def lm_surprisal_scores(ds, col: str = "text", method: str = "auto",
                        broadcast_max: int = 2_000_000):
    """Unigram language-model SURPRISAL per document — the corpus-
    self-trained perplexity-proxy quality filter (the CCNet/KenLM
    pattern: score each doc by how surprising its tokens are under a
    LM fit on the corpus; outliers on either end are boilerplate or
    garbage).  Add-one smoothing: p(w) = (tf(w)+1)/(N+V), and every
    per-token surprisal is the exact integer

        s_e6(w) = floor(10⁶·ln(N+V)) − floor(10⁶·ln(tf(w)+1))

    (−ln p quantized term-wise; both floors are of ln(INTEGER), the
    `graph_adamic_adar` parity pattern — libm-vs-DuckDB last-ulp drift
    lands far from floor boundaries), so the per-doc totals are exact
    int64 sums with no float association order anywhere.  Returns
    ``(doc_id, n_tokens, surprisal_e6, mean_surprisal_e6)`` with
    mean = total // n_tokens.

    Two stages like `tfidf_top_terms`: the distributed wordcount,
    then a second corpus pass scoring each doc — surprisal table
    broadcast below ``broadcast_max`` distinct terms (ray.put once,
    searchsorted per batch), (doc, term, k) ⋈ surprisal hash join at
    scale / under force_scale."""
    import ray
    from ray.data.aggregate import Sum

    from hedonic_ray.context import drop_empty_blocks, force_scale

    tf_ds = term_total_frequency(ds, col=col)
    n_tok = int(tf_ds.sum("tf"))
    n_vocab = tf_ds.count()
    base_e6 = int(np.floor(1e6 * np.log(n_tok + n_vocab)))
    if method == "auto":
        method = ("join" if force_scale()
                  else "broadcast" if n_vocab <= broadcast_max else "join")

    def add_s(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy().astype(np.int64)
        s = base_e6 - np.floor(1e6 * np.log(tf + 1)).astype(np.int64)
        return pa.table({"term": t.column("term"),
                         "s_e6": pa.array(s, pa.int64())})

    sup = tf_ds.map_batches(add_s, batch_format="pyarrow")

    if method == "broadcast":
        rows = sup.take_all()
        terms_sorted = np.array(sorted(r["term"] for r in rows), dtype=str)
        by_term = {r["term"]: int(r["s_e6"]) for r in rows}
        s_sorted = np.array([by_term[t] for t in terms_sorted.tolist()],
                            dtype=np.int64)
        lut_ref = ray.put((terms_sorted, s_sorted))

        def score(batch: pa.Table) -> pa.Table:
            flat, lens, doc_of = _flat_words(batch, col)
            ids = batch.column("doc_id").to_numpy().astype(np.int64)
            tot = np.zeros(batch.num_rows, np.int64)
            if len(flat):
                ts_, ss_ = ray.get(lut_ref)
                s = ss_[np.searchsorted(
                    ts_, np.asarray(flat).astype(str))]
                np.add.at(tot, doc_of, s)
            keep = lens > 0
            mean = tot[keep] // lens[keep]
            return pa.table({
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(lens[keep], pa.int64()),
                "surprisal_e6": pa.array(tot[keep], pa.int64()),
                "mean_surprisal_e6": pa.array(mean, pa.int64()),
            })

        return ds.map_batches(score, batch_format="pyarrow",
                              batch_size=2048)

    def doc_tf(batch: pa.Table) -> pa.Table:
        flat, _lens, doc_of = _flat_words(batch, col)
        if len(flat) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "k": pa.array([], pa.int64())})
        words = np.asarray(flat).astype(str)
        uniq, inv = np.unique(words, return_inverse=True)
        key = doc_of * np.int64(len(uniq)) + inv
        uk, k = np.unique(key, return_counts=True)
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[(uk // len(uniq)).astype(np.int64)],
                               pa.int64()),
            "term": pa.array(uniq[(uk % len(uniq)).astype(np.int64)]
                             .astype(object), pa.string()),
            "k": pa.array(k.astype(np.int64)),
        })

    pairs = ds.map_batches(doc_tf, batch_format="pyarrow",
                           batch_size=2048)
    s_pairs = pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                         ("k", pa.int64())])
    s_sup = pa.schema([("term", pa.string()), ("s_e6", pa.int64())])
    j = drop_empty_blocks(pairs, s_pairs).join(
        drop_empty_blocks(sup, s_sup), "inner", 8, on=("term",))

    def contrib(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy().astype(np.int64)
        s = t.column("s_e6").to_numpy().astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "ntok_p": pa.array(k, pa.int64()),
                         "sup_p": pa.array(k * s, pa.int64())})

    g = (j.map_batches(contrib, batch_format="pyarrow")
         .groupby("doc_id")
         .aggregate(Sum("ntok_p", alias_name="n_tokens"),
                    Sum("sup_p", alias_name="surprisal_e6")))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_tokens").to_numpy().astype(np.int64)
        s = t.column("surprisal_e6").to_numpy().astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64()),
                         "surprisal_e6": pa.array(s, pa.int64()),
                         "mean_surprisal_e6": pa.array(s // n, pa.int64())})

    return g.map_batches(finish, batch_format="pyarrow")


def zipf_slope(ds, col: str = "text", top_n: int = 100):
    """ZIPF RANK-FREQUENCY SLOPE over the corpus vocabulary — the
    one-number lexical-health diagnostic (natural corpora sit near
    slope −1; generated/templated text drifts): least-squares slope of
    ``ln(tf)`` on ``ln(rank)`` over the ``top_n`` terms by frequency.

    Exactness contract (cross-engine): ranks are 1-based over the
    deterministic (tf desc, term asc) order; both logs enter the
    regression as ``FLOOR(ln(integer)·1e6)`` int64 (the adamic-adar /
    lm_score parity pattern — both engines take ln of the SAME exact
    integer), the four sufficient sums are exact int64, and the slope
    finishes as a sign-split floor ratio in Python ints (the 1e6·num
    product needs >63 bits).

    One wordcount shuffle + a top-n sort; the regression runs on
    ``top_n`` driver rows."""
    tf = term_total_frequency(ds, col)
    top = (tf.sort(["tf", "term"], descending=[True, False])
           .limit(top_n).take_all())
    n = len(top)
    if n == 0:
        z = pa.array([], pa.int64())
        return pa.table({"n_terms": z, "sx": z, "sy": z, "sxy": z,
                         "sxx": z, "slope_e6": z})
    ranks = np.arange(1, n + 1, dtype=np.int64)
    tfs = np.array([int(r["tf"]) for r in top], np.int64)
    x = np.floor(np.log(ranks.astype(np.float64)) * 1e6).astype(np.int64)
    y = np.floor(np.log(tfs.astype(np.float64)) * 1e6).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    if den == 0:
        slope = 0
    else:
        q = (10**6 * abs(num)) // den
        slope = q if num >= 0 else -q
    return pa.table({
        "n_terms": pa.array([n], pa.int64()),
        "sx": pa.array([sx], pa.int64()),
        "sy": pa.array([sy], pa.int64()),
        "sxy": pa.array([sxy], pa.int64()),
        "sxx": pa.array([sxx], pa.int64()),
        "slope_e6": pa.array([slope], pa.int64())})


def term_burstiness(ds, col: str = "text", k: int = 50,
                    min_df: int = 5):
    """TERM BURSTINESS (Church & Gale shape): collection frequency
    over document frequency per term, ``burst_e6 = 1e6·cf // df`` —
    bursty terms (high cf/df) concentrate in few documents (topical /
    boilerplate markers), while cf ≈ df terms spread evenly (function
    words).  Top-``k`` by (burst_e6 desc, term asc) among terms with
    df ≥ ``min_df``.

    ONE pass computes both statistics: each batch emits per-term
    (total count, distinct-doc count) from the same unique() sweep,
    then one ``groupby(term)`` with two Sums — the wordcount shuffle
    shape, volume bounded by batch vocabulary."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(batch.column(col),
                                       r"\s+").combine_chunks()
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = words.flatten()
        docs = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        docs = docs[keep]
        if not len(docs):
            e = pa.array([], pa.int64())
            return pa.table({"term": pa.array([], pa.string()),
                             "cf_p": e, "df_p": e})
        terms, inv = np.unique(np.asarray(flat).astype(str),
                               return_inverse=True)
        cf = np.bincount(inv, minlength=len(terms))
        key = docs * np.int64(len(terms)) + inv
        uk = np.unique(key)
        df = np.bincount((uk % len(terms)).astype(np.int64),
                         minlength=len(terms))
        return pa.table({
            "term": pa.array(terms.astype(object), pa.string()),
            "cf_p": pa.array(cf.astype(np.int64)),
            "df_p": pa.array(df.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=2048)
           .groupby("term")
           .aggregate(Sum("cf_p", alias_name="cf"),
                      Sum("df_p", alias_name="df")))

    def score(t: pa.Table) -> pa.Table:
        cf = t.column("cf").to_numpy().astype(np.int64)
        df = t.column("df").to_numpy().astype(np.int64)
        m = pa.array(df >= min_df)
        burst = cf * np.int64(1_000_000) // np.maximum(df, 1)
        return pa.table({"term": t.column("term").filter(m),
                         "cf": pa.array(cf).filter(m),
                         "df": pa.array(df).filter(m),
                         "burst_e6": pa.array(burst).filter(m)})

    out = (agg.map_batches(score, batch_format="pyarrow")
           .sort(["burst_e6", "term"], descending=[True, False])
           .limit(k).take_all())
    return pa.table({
        "term": pa.array([r["term"] for r in out], pa.string()),
        "cf": pa.array([int(r["cf"]) for r in out], pa.int64()),
        "df": pa.array([int(r["df"]) for r in out], pa.int64()),
        "burst_e6": pa.array([int(r["burst_e6"]) for r in out],
                             pa.int64())})


_BM25_QUERIES = (("q1", ("scan", "merge")),
                 ("q2", ("customer", "window")))


def bm25_topk(ds, *, col="text", id_col="doc_id",
              queries=_BM25_QUERIES, k=10):
    """Lucene-BM25 (k1=1.2, b=0.75) top-k docs per query, EXACT
    integers end to end: with L = corpus tokens, N = docs,
    avgdl = L/N, the per-(doc, term) contribution is

        contrib = idf_e6(t) * (22*tf*L) // (10*tf*L + 3*L + 9*dl*N)

    (the k1/b rationals cleared by multiplying num/den by 10*L), and
    idf_e6(t) = floor(1e6*ln(2N+2)) - floor(1e6*ln(2*df+1)) — the
    nonnegative Lucene idf ln(1 + (N-df+.5)/(df+.5)) as a difference
    of floors of ln(INTEGER) (adamic-adar parity pattern); nonneg
    everywhere so // floor==trunc on both engines.  Two passes:
    corpus stats (N, L, df per query term), then a scoring pass with
    per-batch top-k partials and a driver merge bounded by
    batches*queries*k.  Columns: query_id, doc_id, score_e6."""
    import ray

    terms = sorted({t for _, ts_ in queries for t in ts_})
    t_idx = {t: i for i, t in enumerate(terms)}
    T = len(terms)
    terms_arr = np.array(terms, dtype=str)

    def stats(batch: pa.Table) -> pa.Table:
        flat, lens, doc_of = _flat_words(batch, col)
        w = np.asarray(flat).astype(str)
        ti = np.searchsorted(terms_arr, w)
        ti[ti == T] = 0
        m = (terms_arr[ti] == w) if T else np.zeros(len(w), bool)
        # per-batch df partial: distinct (doc, term) among query terms
        pk = np.unique(doc_of[m] * T + ti[m])
        df_part = np.bincount((pk % T).astype(np.int64), minlength=T)
        return pa.table({
            "ti": pa.array(np.arange(T + 1, dtype=np.int64)),
            "df": pa.array(np.concatenate([df_part, [0]]).astype(np.int64)),
            "n_docs": pa.array([0] * T + [batch.num_rows], pa.int64()),
            "n_tok": pa.array([0] * T + [int(lens.sum())], pa.int64())})

    from ray.data.aggregate import Sum

    srows = (ds.map_batches(stats, batch_format="pyarrow")
             .groupby("ti")
             .aggregate(Sum("df", alias_name="df"),
                        Sum("n_docs", alias_name="n_docs"),
                        Sum("n_tok", alias_name="n_tok"))
             .take_all())
    df = np.zeros(T, np.int64)
    N = L = 0
    for r in srows:
        i = int(r["ti"])
        if i == T:
            N, L = int(r["n_docs"]), int(r["n_tok"])
        else:
            df[i] = int(r["df"])
    idf_e6 = (int(np.floor(1e6 * np.log(2 * N + 2)))
              - np.floor(1e6 * np.log(2 * df + 1)).astype(np.int64))
    assert idf_e6.size == 0 or \
        int(idf_e6.max()) * 22 * L * L < 2**62, \
        "idf*tf*L exceeds int64 — rescale to e3 units"
    # query membership matrix: q x T
    qids = [q for q, _ in queries]
    member = np.zeros((len(queries), T), np.int64)
    for qi, (_, ts_) in enumerate(queries):
        for t in ts_:
            member[qi, t_idx[t]] = 1
    bref = ray.put((terms_arr, idf_e6, member, np.array(qids, dtype=str)))

    def score(batch: pa.Table) -> pa.Table:
        ta, idf, mem, qn = ray.get(bref)
        flat, lens, doc_of = _flat_words(batch, col)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        w = np.asarray(flat).astype(str)
        ti = np.searchsorted(ta, w)
        ti[ti == T] = 0
        m = (ta[ti] == w) if T else np.zeros(len(w), bool)
        pk, tf = np.unique(doc_of[m] * T + ti[m], return_counts=True)
        d, t = pk // T, pk % T
        tf = tf.astype(np.int64)
        dl = lens[d]
        contrib = (idf[t] * (22 * tf * L)
                   // (10 * tf * L + 3 * L + 9 * dl * N))
        # scores: (#queries, #batch docs) via membership scatter
        sc = np.zeros((mem.shape[0], batch.num_rows), np.int64)
        for qi in range(mem.shape[0]):
            sel = mem[qi, t] == 1
            np.add.at(sc[qi], d[sel], contrib[sel])
        out_q, out_d, out_s = [], [], []
        for qi in range(mem.shape[0]):
            nz = np.flatnonzero(sc[qi] > 0)
            if not len(nz):
                continue
            order = np.lexsort((ids[nz], -sc[qi][nz]))[:k]
            out_q.append(np.full(len(order), qi, np.int64))
            out_d.append(ids[nz][order])
            out_s.append(sc[qi][nz][order])
        if not out_q:
            return pa.table({"qi": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "score_e6": pa.array([], pa.int64())})
        return pa.table({"qi": pa.array(np.concatenate(out_q)),
                         "doc_id": pa.array(np.concatenate(out_d)),
                         "score_e6": pa.array(np.concatenate(out_s))})

    parts = [b for b in ds.map_batches(score, batch_format="pyarrow",
                                       batch_size=2048)
             .iter_batches(batch_size=65536, batch_format="pyarrow")]
    t = pa.concat_tables([p for p in parts if p.num_rows]) if parts \
        else None
    if t is None or t.num_rows == 0:
        return pa.table({"query_id": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64()),
                         "score_e6": pa.array([], pa.int64())})
    qi = t.column("qi").to_numpy()
    d = t.column("doc_id").to_numpy()
    s = t.column("score_e6").to_numpy()
    out_q, out_d, out_s = [], [], []
    for q in range(len(qids)):
        m = qi == q
        order = np.lexsort((d[m], -s[m]))[:k]
        out_q += [qids[q]] * len(order)
        out_d.append(d[m][order])
        out_s.append(s[m][order])
    return pa.table({
        "query_id": pa.array(out_q, pa.string()),
        "doc_id": pa.array(np.concatenate(out_d) if out_d else
                           np.empty(0, np.int64), pa.int64()),
        "score_e6": pa.array(np.concatenate(out_s) if out_s else
                             np.empty(0, np.int64), pa.int64())})


def token_entropy(ds, *, col="text", id_col="doc_id"):
    """Per-doc Shannon entropy of the token distribution as the exact
    integer  H_e6 = (dl*lnE6(dl) - sum_t tf_t*lnE6(tf_t)) // dl  with
    lnE6(x) = floor(1e6*ln(x)) (ln of INTEGERS only — the adamic-adar
    parity pattern; the numerator is nonnegative so // is safe).
    Columns: doc_id, n_tokens, entropy_e6 (docs with 0 tokens drop)."""
    def f(batch: pa.Table) -> pa.Table:
        flat, lens, doc_of = _flat_words(batch, col)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        w = np.asarray(flat).astype(str)
        # per-(doc, distinct word) counts: unique on (doc, word) pairs
        _, inv = np.unique(w, return_inverse=True) if len(w) else \
            (None, np.empty(0, np.int64))
        nv = int(inv.max()) + 1 if len(w) else 1
        pk, tf = np.unique(doc_of * nv + inv, return_counts=True)
        d = (pk // nv).astype(np.int64)
        tf = tf.astype(np.int64)
        s = np.zeros(batch.num_rows, np.int64)
        np.add.at(s, d, tf * np.floor(
            1e6 * np.log(tf)).astype(np.int64))
        keep = lens > 0
        dl = lens[keep]
        h = (dl * np.floor(1e6 * np.log(dl)).astype(np.int64)
             - s[keep]) // dl
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "n_tokens": pa.array(dl, pa.int64()),
                         "entropy_e6": pa.array(h, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=2048)


def bigram_lm_scores(ds, col: str = "text", method: str = "auto",
                     broadcast_max: int = 2_000_000):
    """BIGRAM language-model surprisal per document — the next-order
    refinement of :func:`lm_surprisal_scores` (the CCNet/KenLM quality
    filter actually uses n-gram context, not unigrams): add-one
    smoothing over the corpus's own bigram table,

        p(w_i | w_{i-1}) = (c2(w_{i-1}, w_i) + 1) / (c1(w_{i-1}) + V)

    with c2 = bigram count, c1(w) = Σ_x c2(w, x) (bigram-prefix count)
    and V = unigram vocabulary size.  Every per-position surprisal is
    the exact integer

        s_e6 = floor(1e6·ln(c1+V)) − floor(1e6·ln(c2+1))

    (both floors of ln(INTEGER), the adamic-adar parity pattern;
    c1 + V > c2 + 1 always, so s_e6 ≥ 0 and // is trunc on both
    engines).  Returns (doc_id, n_bigrams, surprisal_e6,
    mean_surprisal_e6) with mean = total // n_bigrams; docs with < 2
    tokens have no bigram positions and drop.

    Stages: the distributed bigram wordcount
    (:func:`bigram_total_frequency`), prefix counts as ONE further
    groupby over the bigram table (not a second corpus pass), then a
    scoring pass — s_e6 LUT broadcast below ``broadcast_max`` distinct
    bigrams, (doc, bigram, k) ⋈ s_e6 hash joins at scale / under
    force_scale (the lm_surprisal join posture)."""
    import ray
    from ray.data.aggregate import Sum

    from hedonic_ray.context import drop_empty_blocks, force_scale

    bg_tf = bigram_total_frequency(ds, col=col)
    n_vocab = term_total_frequency(ds, col=col).count()
    if method == "auto":
        method = "join" if force_scale() else "broadcast"
        if method == "broadcast" and bg_tf.count() > broadcast_max:
            method = "join"

    def add_prefix(t: pa.Table) -> pa.Table:
        w1 = pc.list_element(
            pc.split_pattern(t.column("bigram"), " ", max_splits=1), 0)
        return t.append_column("w1", w1)

    bgp = bg_tf.map_batches(add_prefix, batch_format="pyarrow")

    def doc_bg(batch: pa.Table) -> pa.Table:
        """(doc_id, bigram, k) occurrence counts — each row is one
        whole document, so per-doc counts complete per batch."""
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "bigram": pa.array([], pa.string()),
                          "k": pa.array([], pa.int64())})
        flat, _lens, doc_of = _flat_words(batch, col)
        if len(flat) < 2:
            return empty
        same = doc_of[:-1] == doc_of[1:]
        if not same.any():
            return empty
        w1 = flat.slice(0, len(flat) - 1).filter(pa.array(same))
        w2 = flat.slice(1).filter(pa.array(same))
        bg = np.asarray(pc.binary_join_element_wise(w1, w2, " ")
                        ).astype(str)
        d = doc_of[:-1][same]
        uniq, inv = np.unique(bg, return_inverse=True)
        key = d * np.int64(len(uniq)) + inv
        uk, k = np.unique(key, return_counts=True)
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[(uk // len(uniq)).astype(np.int64)]),
            "bigram": pa.array(uniq[(uk % len(uniq)).astype(np.int64)]
                               .astype(object), pa.string()),
            "k": pa.array(k.astype(np.int64))})

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_bigrams").to_numpy().astype(np.int64)
        s = t.column("surprisal_e6").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bigrams": pa.array(n, pa.int64()),
            "surprisal_e6": pa.array(s, pa.int64()),
            "mean_surprisal_e6": pa.array(s // n, pa.int64())})

    if method == "broadcast":
        rows_bg, rows_w1 = {}, {}
        for b in bgp.iter_batches(batch_size=65536,
                                  batch_format="pyarrow"):
            for bgm, tf, w1 in zip(b.column("bigram").to_pylist(),
                                   b.column("tf").to_numpy(),
                                   b.column("w1").to_pylist()):
                rows_bg[bgm] = int(tf)
                rows_w1[w1] = rows_w1.get(w1, 0) + int(tf)
        bgs = np.array(sorted(rows_bg), dtype=str)
        c2 = np.array([rows_bg[x] for x in bgs.tolist()], np.int64)
        c1 = np.array([rows_w1[x.split(" ", 1)[0]] for x in bgs.tolist()],
                      np.int64)
        s_e6 = (np.floor(1e6 * np.log(c1 + n_vocab)).astype(np.int64)
                - np.floor(1e6 * np.log(c2 + 1)).astype(np.int64))
        lut_ref = ray.put((bgs, s_e6))

        def score(batch: pa.Table) -> pa.Table:
            t = doc_bg(batch)
            if t.num_rows == 0:
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "surprisal_e6": pa.array([], pa.int64()),
                    "mean_surprisal_e6": pa.array([], pa.int64())})
            keys, lut = ray.get(lut_ref)
            i = np.searchsorted(keys, np.asarray(t.column("bigram"))
                                .astype(str))
            k = t.column("k").to_numpy().astype(np.int64)
            d = t.column("doc_id").to_numpy().astype(np.int64)
            ud, inv = np.unique(d, return_inverse=True)
            n = np.zeros(len(ud), np.int64)
            s = np.zeros(len(ud), np.int64)
            np.add.at(n, inv, k)
            np.add.at(s, inv, k * lut[i])
            return pa.table({
                "doc_id": pa.array(ud),
                "n_bigrams": pa.array(n),
                "surprisal_e6": pa.array(s),
                "mean_surprisal_e6": pa.array(s // n)})

        return ds.map_batches(score, batch_format="pyarrow",
                              batch_size=2048)

    # join path: bigram table ⋈ prefix counts → s_e6 table; doc pairs
    # ⋈ s_e6 → per-doc grouped totals
    c1 = bgp.groupby("w1").aggregate(Sum("tf", alias_name="c1"))
    s_bgp = pa.schema([("bigram", pa.string()), ("tf", pa.int64()),
                       ("w1", pa.string())])
    s_c1 = pa.schema([("w1", pa.string()), ("c1", pa.int64())])
    sj = drop_empty_blocks(bgp, s_bgp).join(
        drop_empty_blocks(c1, s_c1), "inner", 8, on=("w1",))

    def add_s(t: pa.Table) -> pa.Table:
        c2 = t.column("tf").to_numpy().astype(np.int64)
        c1v = t.column("c1").to_numpy().astype(np.int64)
        s = (np.floor(1e6 * np.log(c1v + n_vocab)).astype(np.int64)
             - np.floor(1e6 * np.log(c2 + 1)).astype(np.int64))
        return pa.table({"bigram": t.column("bigram"),
                         "s_e6": pa.array(s, pa.int64())})

    sup = sj.map_batches(add_s, batch_format="pyarrow")
    pairs = ds.map_batches(doc_bg, batch_format="pyarrow",
                           batch_size=2048)
    s_pairs = pa.schema([("doc_id", pa.int64()), ("bigram", pa.string()),
                         ("k", pa.int64())])
    s_sup = pa.schema([("bigram", pa.string()), ("s_e6", pa.int64())])
    j = drop_empty_blocks(pairs, s_pairs).join(
        drop_empty_blocks(sup, s_sup), "inner", 8, on=("bigram",))

    def contrib(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy().astype(np.int64)
        s = t.column("s_e6").to_numpy().astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "nbg_p": pa.array(k, pa.int64()),
                         "sup_p": pa.array(k * s, pa.int64())})

    g = (j.map_batches(contrib, batch_format="pyarrow")
         .groupby("doc_id")
         .aggregate(Sum("nbg_p", alias_name="n_bigrams"),
                    Sum("sup_p", alias_name="surprisal_e6")))
    return g.map_batches(finish, batch_format="pyarrow")
