"""Byte-pair-encoding tokenizer TRAINING as a Ray Data pipeline.

The merge-learning loop of Sennrich et al. 2016 (the algorithm behind
GPT-2/RoBERTa tokenizers): start from the corpus word-count table with
each word as a character sequence, then repeatedly (a) count adjacent
symbol pairs weighted by word frequency, (b) merge the most frequent
pair everywhere.  The reference repo has no tokenizer stage; this is
part of the training-data extension surface (SURVEY.md §2 "beyond the
reference" — token counting already exists in `ops/textstats.py`; this
adds the trainer that PRODUCES such a tokenizer).

Scale shape: the working set after the first aggregation is the
DISTINCT-WORD table (vocab), which is orders of magnitude smaller than
the corpus — exactly how production BPE trainers (HuggingFace
tokenizers, SentencePiece) structure it.  Each merge round is one
vectorized pair-count combiner (`map_batches` partials → one small
`groupby(l, r).sum`) plus one vectorized merge map; per-round driver
traffic is one (left, right, count) row per block (grouped-argmax
pattern).  The vocab table is materialized once per round — it IS the
algorithm state, bounded by |vocab|, never the corpus.

Merge-application semantics: a merge replaces non-overlapping
occurrences of the pair LEFT-TO-RIGHT, implemented as two passes of a
literal space-delimited string replace (`pc.replace_substring`; the
DuckDB oracle uses `replace` with the same two-pass expression, and
the two engines agree byte-for-byte — tested).  One pass can skip a
pair whose leading delimiter was consumed by the immediately preceding
match; such skipped pairs are never adjacent to each other, so the
second pass completes the merge (see `tests/test_bpe.py` for the
property check vs a slot-level simulator).  Inside an ODD RUN of a
self-adjacent symbol (`a a a a a`) the pass-2 tie resolution differs
from canonical BPE (`aa a aa` vs `aa aa a`) — pair statistics, merge
choices and corpus length are unaffected for typical text; documented
deviation.

Initial symbol sequences split words per Unicode CODE POINT
(`np.char.join`), matching DuckDB `string_split(w, '')` on ASCII/BMP
fixtures; combining-grapheme corpora may split differently between
engines (not exercised here — the fixture is lowercase ASCII).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["bpe_train_rounds"]

_SEP = "\x1f"


def _pair_partials(batch: pa.Table) -> pa.Table:
    """Per-batch weighted adjacent-pair counts over (symseq, tf) rows.

    One Arrow split, one flatten, one `np.unique` over packed pair
    keys, one exact-int64 `np.add.at` — no per-word Python."""
    syms = pc.split_pattern(batch.column("symseq"), " ").combine_chunks()
    offs = syms.offsets.to_numpy().astype(np.int64)
    lens = np.diff(offs)
    flat = np.asarray(syms.flatten()).astype(str)
    word_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    empty = pa.table({"l": pa.array([], pa.string()),
                      "r": pa.array([], pa.string()),
                      "c_partial": pa.array([], pa.int64())})
    if len(flat) < 2:
        return empty
    adj = word_of[:-1] == word_of[1:]
    if not adj.any():
        return empty
    left, right = flat[:-1][adj], flat[1:][adj]
    w = batch.column("tf").to_numpy(zero_copy_only=False)[word_of[:-1][adj]]
    keys = np.char.add(np.char.add(left, _SEP), right)
    uniq, first, inv = np.unique(keys, return_index=True,
                                 return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(acc, inv, w.astype(np.int64))
    return pa.table({
        "l": pa.array(left[first].astype(object), pa.string()),
        "r": pa.array(right[first].astype(object), pa.string()),
        "c_partial": pa.array(acc),
    })


def _block_best(batch: pa.Table) -> pa.Table:
    """Grouped-argmax combiner: the single best (c desc, l asc, r asc)
    row of this block — driver traffic is one row per block."""
    if batch.num_rows == 0:
        return batch
    c = batch.column("c").to_numpy(zero_copy_only=False)
    l = np.asarray(batch.column("l")).astype(str)
    r = np.asarray(batch.column("r")).astype(str)
    i = int(np.lexsort((r, l, -c))[0])
    return batch.slice(i, 1)


def _merged_len(batch: pa.Table) -> pa.Table:
    n_sym = pc.add(pc.count_substring(batch.column("symseq"), " "),
                   1).to_numpy(zero_copy_only=False)
    tf = batch.column("tf").to_numpy(zero_copy_only=False)
    tot = int(np.dot(tf.astype(np.int64), n_sym.astype(np.int64)))
    return pa.table({"len_partial": pa.array([tot], pa.int64())})


def bpe_train_rounds(docs_ds, rounds: int = 3, col: str = "text",
                     return_vocab: bool = False):
    """Learn ``rounds`` BPE merges over the \\S+-tokenized corpus.

    Returns one row per merge round: ``(merge_round, left_sym,
    right_sym, pair_count, corpus_len)`` where ``pair_count`` is the
    exact weighted frequency of the chosen pair and ``corpus_len`` the
    corpus token length (Σ word_count · symbols_per_word) AFTER
    applying the merge — the tokenizer compression curve."""
    from ray.data.aggregate import Sum

    from hedonic_ray.ops.textstats import term_total_frequency

    vocab_tf = term_total_frequency(docs_ds, col=col)

    def init_sym(batch: pa.Table) -> pa.Table:
        term = np.asarray(batch.column("term")).astype(str)
        return pa.table({
            "term": batch.column("term"),
            "symseq": pa.array(np.char.join(" ", term).astype(object),
                               pa.string()),
            "tf": batch.column("tf"),
        })

    vocab = vocab_tf.map_batches(init_sym,
                                 batch_format="pyarrow").materialize()

    out_round, out_l, out_r, out_c, out_len = [], [], [], [], []
    for rnd in range(1, rounds + 1):
        counts = (vocab.map_batches(_pair_partials, batch_format="pyarrow")
                  .groupby(["l", "r"])
                  .aggregate(Sum("c_partial", alias_name="c")))
        tops = counts.map_batches(_block_best,
                                  batch_format="pyarrow").take_all()
        if not tops:
            break
        best = min(tops, key=lambda t: (-int(t["c"]), t["l"], t["r"]))
        lsym, rsym, cnt = str(best["l"]), str(best["r"]), int(best["c"])
        pattern = f" {lsym} {rsym} "
        repl = f" {lsym}{rsym} "

        def merge(batch: pa.Table, pattern=pattern, repl=repl) -> pa.Table:
            s = batch.column("symseq")
            padded = pc.binary_join_element_wise(
                pa.array([""] * len(s), pa.string()), s,
                pa.array([""] * len(s), pa.string()), " ")
            # two passes: pass 1 can skip a pair whose leading space the
            # previous match consumed; skipped pairs are never adjacent,
            # so pass 2 is exact (module docstring).
            m = pc.replace_substring(
                pc.replace_substring(padded, pattern=pattern,
                                     replacement=repl),
                pattern=pattern, replacement=repl)
            return pa.table({"term": batch.column("term"),
                             "symseq": pc.utf8_trim(m, " "),
                             "tf": batch.column("tf")})

        vocab = vocab.map_batches(merge,
                                  batch_format="pyarrow").materialize()
        corpus_len = int(vocab.map_batches(
            _merged_len, batch_format="pyarrow").sum("len_partial"))
        out_round.append(rnd)
        out_l.append(lsym)
        out_r.append(rsym)
        out_c.append(cnt)
        out_len.append(corpus_len)

    merges = pa.table({
        "merge_round": pa.array(out_round, pa.int64()),
        "left_sym": pa.array(out_l, pa.string()),
        "right_sym": pa.array(out_r, pa.string()),
        "pair_count": pa.array(out_c, pa.int64()),
        "corpus_len": pa.array(out_len, pa.int64()),
    })
    if return_vocab:
        return merges, vocab  # final (term, symseq, tf) Dataset
    return merges


def bpe_encode_counts(docs_ds, rounds: int = 3, col: str = "text",
                      id_col: str = "doc_id"):
    """Tokenizer APPLY: encode every document with the ``rounds``
    learned merges and return ``(doc_id, n_tokens_merged)`` — the
    post-BPE token count (the sequence-length planning input;
    `text_token_counts`'s regex proxy measured against the REAL
    learned tokenizer).  The trained vocab's final symbol counts
    (term → symbols-per-word) broadcast as sorted arrays — vocab ≪
    corpus, the tokenizer-shipping pattern — and one corpus pass sums
    them per document (`_flat_words` + searchsorted, no Python in the
    hot path)."""
    import ray

    from hedonic_ray.ops.textstats import _flat_words

    _merges, vocab = bpe_train_rounds(docs_ds, rounds=rounds, col=col,
                                      return_vocab=True)
    terms, nsyms = [], []
    for b in vocab.iter_batches(batch_size=65536, batch_format="pyarrow"):
        terms.append(np.asarray(b.column("term")).astype(str))
        nsyms.append(pc.add(pc.count_substring(b.column("symseq"), " "),
                            1).to_numpy(zero_copy_only=False)
                     .astype(np.int64))
    t = np.concatenate(terms) if terms else np.empty(0, str)
    s = np.concatenate(nsyms) if nsyms else np.empty(0, np.int64)
    order = np.argsort(t)
    lut_ref = ray.put((t[order], s[order]))

    def encode(batch: pa.Table) -> pa.Table:
        flat, lens, doc_of = _flat_words(batch, col)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        tot = np.zeros(batch.num_rows, np.int64)
        if len(flat):
            ts_, ss_ = ray.get(lut_ref)
            tot_syms = ss_[np.searchsorted(
                ts_, np.asarray(flat).astype(str))]
            np.add.at(tot, doc_of, tot_syms)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_tokens_merged": pa.array(tot, pa.int64())})

    return docs_ds.map_batches(encode, batch_format="pyarrow",
                               batch_size=2048)
