"""JSONL (newline-delimited JSON) source/sink — the interchange
format of web-scale LLM training corpora (each line one document
record; the layout of Common Crawl derivatives, The Pile, Dolma, …).

The reference's only JSON surface is the whole-file result dump
(``/root/reference/scripts/exp.py:108-122``); this module is the
corpus-side generalization: a partitioned, streaming JSONL sink (one
file per Ray block — never one giant file) and a streaming reader, so
a parquet↔jsonl conversion is a pure pass-through pipeline with no
driver materialization.

Round-trip fidelity is gate-checked end-to-end (`text_jsonl_io`): the
documents table is written to JSONL, read back, and audited per
(lang, source) group with exact-integer checksums — doc count, id
sum, a character count RECOMPUTED from the round-tripped text, the
round-tripped ``n_chars`` column sum, and a Σ(md5_low64(text) mod
2³¹) content hash (``md5_number_lower``-compatible, so the DuckDB
oracle computes the identical value straight off the parquet).  Any
escaping, encoding or column-type corruption in either direction
breaks at least one checksum.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HASH_MOD = np.int64(1) << 31  # per-doc hash width; Σ headroom below

# session cache: (path, mtime_ns, size) -> written JSONL root, so the
# gate query and its forced-scale rerun share one conversion
_JSONL_CACHE: dict = {}


def write_jsonl(ds, root: str) -> str:
    """Write ``ds`` as newline-delimited JSON, one file per block
    under ``root`` (Ray's partitioned layout — a resumable consumer
    can re-read any subset; never one giant file).

    The write runs inside Ray tasks, so on a multi-node cluster
    ``root`` must be shared storage — the same constraint
    `sources/sinks.py:write_partitioned` documents and asserts."""
    os.makedirs(root, exist_ok=True)
    ds.write_json(root)
    return root


def read_jsonl(path: str, *, columns: list[str] | None = None):
    """Streaming JSONL reader (`ray.data.read_json`); ``columns``
    prunes immediately after parse (JSONL is row-major text, so unlike
    parquet the parse itself cannot skip columns — convert hot corpora
    to parquet for column pruning at the read)."""
    import ray

    ds = ray.data.read_json(path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def jsonl_roundtrip_stats(sf_dir: str) -> pa.Table:
    """Gate query: parquet → JSONL → read back → per-(lang, source)
    exact-integer fidelity checksums (columns: lang, source, n_docs,
    sum_id, sum_chars, sum_nchars, text_hash_sum), sorted by
    (lang, source).

    Shape: one pass writes (block-parallel), one pass audits — a
    per-batch grouped partial combiner (lexsort + reduceat) feeding
    one small ``groupby(lang, source)`` exchange; the collected result
    is bounded by the (lang × source) grid.  Per-doc md5 is the
    engine's accepted per-row cost (`ops/dedup.py:md5_low64`, the
    SimHash posture); Σ(h mod 2³¹) headroom allows 2³² docs per group
    (asserted loudly)."""
    import ray
    from ray.data.aggregate import Sum

    from hedonic_ray.ops.dedup import md5_low64

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    key = (os.path.abspath(src), st.st_mtime_ns, st.st_size)
    root = _JSONL_CACHE.get(key)
    if root is None:
        tag = hashlib.md5(repr(key).encode()).hexdigest()[:16]
        root = f"/tmp/hedonic_ray_jsonl_{tag}"
        shutil.rmtree(root, ignore_errors=True)
        cols = ["doc_id", "text", "lang", "source", "n_chars"]
        write_jsonl(ray.data.read_parquet(src, columns=cols), root)
        _JSONL_CACHE[key] = root

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "sum_id": pa.array([], pa.int64()),
                "sum_chars": pa.array([], pa.int64()),
                "sum_nchars": pa.array([], pa.int64()),
                "text_hash_sum": pa.array([], pa.int64()),
            })
        docs = t.column("doc_id").to_numpy().astype(np.int64)
        nch = t.column("n_chars").to_numpy().astype(np.int64)
        chars = pc.utf8_length(t.column("text")).to_numpy().astype(np.int64)
        h = np.fromiter(
            (md5_low64(s) % int(_HASH_MOD) for s in t.column("text").to_pylist()),
            dtype=np.int64, count=t.num_rows)
        # group within the batch: lexsort on the dictionary-encoded pair
        lang = t.column("lang")
        source = t.column("source")
        lcodes = lang.dictionary_encode().combine_chunks().indices.to_numpy()
        scodes = source.dictionary_encode().combine_chunks().indices.to_numpy()
        order = np.lexsort((scodes, lcodes))
        lc, sc = lcodes[order], scodes[order]
        starts = np.flatnonzero(
            np.concatenate([[True], (lc[1:] != lc[:-1]) | (sc[1:] != sc[:-1])]))
        def seg(v):
            return np.add.reduceat(v[order], starts)
        take = order[starts]
        return pa.table({
            "lang": lang.take(pa.array(take)),
            "source": source.take(pa.array(take)),
            "n_docs": pa.array(seg(np.ones(t.num_rows, np.int64)), pa.int64()),
            "sum_id": pa.array(seg(docs), pa.int64()),
            "sum_chars": pa.array(seg(chars), pa.int64()),
            "sum_nchars": pa.array(seg(nch), pa.int64()),
            "text_hash_sum": pa.array(seg(h), pa.int64()),
        })

    agg = (read_jsonl(root)
           .map_batches(partials, batch_format="pyarrow")
           .groupby(["lang", "source"])
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("sum_id", alias_name="sum_id"),
                      Sum("sum_chars", alias_name="sum_chars"),
                      Sum("sum_nchars", alias_name="sum_nchars"),
                      Sum("text_hash_sum", alias_name="text_hash_sum")))
    out = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    assert pc.max(out.column("n_docs")).as_py() < (1 << 32), \
        "text_hash_sum headroom: > 2^32 docs in one (lang, source) group"
    idx = pc.sort_indices(out, sort_keys=[("lang", "ascending"),
                                          ("source", "ascending")])
    out = out.take(idx)
    return out.select(["lang", "source", "n_docs", "sum_id",
                       "sum_chars", "sum_nchars", "text_hash_sum"])
