"""Deduplication family over the ``documents`` table.

Exact dedup, MinHash+LSH, SimHash, n-gram Jaccard verification, and
embedding-cosine near-dup — each staged Ray-Data-first:

    signatures:  map_batches (vectorized numpy per batch, hashing from
                 functions.hashing — process-stable)
    bucketing:   groupby((band, band_hash)) — THE shuffle; bucket sizes
                 are capped (hot buckets are almost always boilerplate
                 duplicates; the cap is logged in the row output)
    candidates:  per-bucket pair emission (map_groups)
    verify:      signature-estimate / exact-Jaccard / hamming check
    clustering:  connected components over the dup-pair graph — reusing
                 the engine's own superstep CC (algos/components.py);
                 representative = min doc_id per component.

The reference only ever dedups exact-identical partitions
(``/root/reference/scripts/exp.py:97-99``) — the near-dup family is the
training-data extension SURVEY §2.7 calls for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.context import actor_pool
from hedonic_ray.functions.hashing import combine_hashes, hash_strings, splitmix64

_U64 = np.uint64


# ------------------------------------------------------------- exact dedup


def add_text_hash(ds, col: str = "text", out: str = "text_hash"):
    def f(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch.column(col).to_pylist())
        return batch.append_column(out, pa.array(h.astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")


def exact_dedup(ds, col: str = "text", key: str = "doc_id"):
    """Keep the min-key row per distinct text: content hash per batch →
    groupby(hash) → first.  Returns the kept rows (key column only,
    plus the hash)."""

    def keep_first(group) -> dict:
        k = group[key]
        return {key: np.array([k.min()], dtype=np.int64)}

    return (add_text_hash(ds, col).select_columns([key, "text_hash"])
            .groupby("text_hash").map_groups(keep_first, batch_format="numpy"))


# ---------------------------------------------------------------- minhash


def _word_shingles(text: str, k: int) -> list[str]:
    w = text.split()
    if len(w) < k:
        return [" ".join(w)] if w else [""]
    return [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]


class MinHashSignatures:
    """doc → uint64[P] MinHash signature over word k-shingles."""

    def __init__(self, num_perm: int = 64, k: int = 3):
        self.k = k
        self.salts = splitmix64(np.arange(1, num_perm + 1, dtype=_U64))

    def signature(self, text: str) -> np.ndarray:
        sh = hash_strings(_word_shingles(text, self.k))
        with np.errstate(over="ignore"):
            m = splitmix64(sh[:, None] ^ self.salts[None, :])
        return m.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.stack([self.signature(t)
                         for t in batch.column("text").to_pylist()])
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).astype(np.int64)), sigs.shape[1]),
        })


def minhash_signatures(ds, num_perm: int = 64, k: int = 3):
    return ds.map_batches(MinHashSignatures, fn_constructor_args=(num_perm, k),
                          batch_format="pyarrow", batch_size=1024,
                          concurrency=actor_pool())


def _lsh_bucket_rows(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    ids = batch.column("doc_id").to_numpy()
    sig = np.asarray(batch.column("sig").combine_chunks().flatten()).reshape(
        len(ids), -1).astype(_U64)
    out_band, out_hash, out_id = [], [], []
    for b in range(bands):
        seg = sig[:, b * rows:(b + 1) * rows]
        h = seg[:, 0]
        for r in range(1, rows):
            h = combine_hashes(h, seg[:, r])
        out_band.append(np.full(len(ids), b, dtype=np.int64))
        out_hash.append(h.astype(np.int64))
        out_id.append(ids)
    return pa.table({"band": np.concatenate(out_band),
                     "bh": np.concatenate(out_hash),
                     "doc_id": np.concatenate(out_id)})


def _bucket_pairs(group: dict, cap: int) -> dict:
    ids = np.sort(group["doc_id"].astype(np.int64))
    if len(ids) < 2:
        return {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
    if len(ids) > cap:  # hot bucket: chain instead of quadratic blowup
        return {"a": ids[:-1], "b": ids[1:]}
    iu = np.triu_indices(len(ids), k=1)
    return {"a": ids[iu[0]], "b": ids[iu[1]]}


def candidate_pairs(sig_ds, *, bands: int = 16, rows: int = 4, cap: int = 512):
    """LSH: band-hash bucketing → within-bucket pairs (deduped)."""
    buckets = sig_ds.map_batches(
        lambda b: _lsh_bucket_rows(b, bands, rows), batch_format="pyarrow")
    pairs = buckets.groupby(["band", "bh"]).map_groups(
        lambda g: _bucket_pairs(g, cap), batch_format="numpy")

    def dedup_batch(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        key = np.unique(a * np.int64(1) * np.int64(2**32) + b)
        return pa.table({"a": key // 2**32, "b": key % 2**32})

    return pairs.map_batches(dedup_batch, batch_format="pyarrow")


def verify_pairs_minhash(pairs_ds, sig_ds, threshold: float):
    """Estimated Jaccard = matching signature fraction ≥ threshold.
    Signatures are broadcast (V-scale, not payload-scale); at extreme V
    this becomes a hash join on doc_id."""
    import ray

    ids, sigs = [], []
    for batch in sig_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids.append(batch.column("doc_id").to_numpy())
        sigs.append(np.asarray(batch.column("sig").combine_chunks().flatten())
                    .reshape(len(batch), -1))
    ids = np.concatenate(ids)
    sigs = np.concatenate(sigs)
    lut = np.zeros(ids.max() + 1, dtype=np.int64)
    lut[ids] = np.arange(len(ids))
    ref = ray.put((lut, sigs))

    def verify(batch: pa.Table) -> pa.Table:
        lut_, sigs_ = ray.get(ref)
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        est = (sigs_[lut_[a]] == sigs_[lut_[b]]).mean(axis=1)
        keep = est >= threshold
        return pa.table({"a": a[keep], "b": b[keep],
                         "est_jaccard": est[keep]})

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


def duplicate_clusters(pairs_ds, n_docs: int):
    """Dup-pair graph → engine connected components → (doc_id, dup_of)
    with dup_of = min doc_id of the duplicate cluster."""
    from hedonic_ray.algos.components import connected_components
    from hedonic_ray.graph.build import build_link_graph

    renamed = pairs_ds.map_batches(
        lambda t: pa.table({"src": t.column("a"), "dst": t.column("b")}),
        batch_format="pyarrow")
    g = build_link_graph(renamed, n_docs, directed=False, num_parts=8)
    comp = connected_components(g).state["component"]
    return comp  # comp[d] == d → representative/unique


def minhash_dedup(ds, n_docs: int, *, num_perm: int = 64, k: int = 3,
                  bands: int = 16, rows: int = 4, threshold: float = 0.7):
    """End-to-end MinHash-LSH near-dedup: returns (component array,
    verified pairs dataset)."""
    sigs = minhash_signatures(ds, num_perm=num_perm, k=k).materialize()
    pairs = candidate_pairs(sigs, bands=bands, rows=rows)
    verified = verify_pairs_minhash(pairs, sigs, threshold).materialize()
    comp = duplicate_clusters(verified, n_docs)
    return comp, verified


# ---------------------------------------------------------------- simhash

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POP[x.view(np.uint8).reshape(*x.shape, 8)].sum(axis=-1)


class SimHashSignatures:
    """64-bit SimHash over word hashes."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.empty(len(batch), dtype=_U64)
        for i, t in enumerate(batch.column("text").to_pylist()):
            words = t.split() or [""]
            h = hash_strings(words)
            bits = ((h[:, None] >> np.arange(64, dtype=_U64)) & _U64(1))
            score = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
            sig = _U64(0)
            for j in np.flatnonzero(score > 0):
                sig |= _U64(1) << _U64(j)
            out[i] = sig
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(out.astype(np.int64))})


def simhash_signatures(ds):
    return ds.map_batches(SimHashSignatures, batch_format="pyarrow",
                          batch_size=1024, concurrency=actor_pool())


def simhash_pairs(sig_ds, *, max_hamming: int = 3, cap: int = 512):
    """Band the 64-bit simhash into 4×16-bit keys (any pair within
    hamming ≤ 3 shares ≥ 1 band) → bucket → exact hamming verify."""

    def bucket_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sh = batch.column("simhash").to_numpy().astype(np.int64).view(_U64)
        bands, hashes, out_ids, sigs = [], [], [], []
        for b in range(4):
            bands.append(np.full(len(ids), b, dtype=np.int64))
            hashes.append(((sh >> _U64(16 * b)) & _U64(0xFFFF)).astype(np.int64))
            out_ids.append(ids)
            sigs.append(sh.astype(np.int64))
        return pa.table({"band": np.concatenate(bands),
                         "bh": np.concatenate(hashes),
                         "doc_id": np.concatenate(out_ids),
                         "sig": np.concatenate(sigs)})

    def bucket_pairs(group: dict) -> dict:
        order = np.argsort(group["doc_id"])
        ids = group["doc_id"][order].astype(np.int64)
        sig = group["sig"][order].astype(np.int64).view(_U64)
        if len(ids) < 2:
            return {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
                    "hamming": np.empty(0, np.int64)}
        if len(ids) > cap:
            a_i, b_i = np.arange(len(ids) - 1), np.arange(1, len(ids))
        else:
            a_i, b_i = np.triu_indices(len(ids), k=1)
        ham = _popcount64(sig[a_i] ^ sig[b_i]).astype(np.int64)
        keep = ham <= max_hamming
        return {"a": ids[a_i[keep]], "b": ids[b_i[keep]],
                "hamming": ham[keep]}

    buckets = sig_ds.map_batches(bucket_rows, batch_format="pyarrow")
    pairs = buckets.groupby(["band", "bh"]).map_groups(
        bucket_pairs, batch_format="numpy")

    def dedup(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        h = batch.column("hamming").to_numpy().astype(np.int64)
        key, first = np.unique(a * np.int64(2**32) + b, return_index=True)
        return pa.table({"a": key // 2**32, "b": key % 2**32, "hamming": h[first]})

    return pairs.map_batches(dedup, batch_format="pyarrow")


# ------------------------------------------------------- exact n-gram verify


def verify_pairs_exact(pairs_ds, docs_ds, *, k: int = 3, threshold: float = 0.7):
    """Exact n-gram Jaccard on candidate pairs.  Candidate texts are the
    small side (pairs ≪ corpus): broadcast doc_id → text for candidate
    ids only."""
    import ray

    cand: set[int] = set()
    for batch in pairs_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        cand.update(batch.column("a").to_pylist())
        cand.update(batch.column("b").to_pylist())
    texts: dict[int, str] = {}
    for batch in docs_ds.select_columns(["doc_id", "text"]).iter_batches(
            batch_size=8192, batch_format="pyarrow"):
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if i in cand:
                texts[i] = t
    ref = ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        tx = ray.get(ref)
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        jac = np.empty(len(a))
        for i in range(len(a)):
            sa = set(_word_shingles(tx[int(a[i])], k))
            sb = set(_word_shingles(tx[int(b[i])], k))
            jac[i] = len(sa & sb) / max(1, len(sa | sb))
        keep = jac >= threshold
        return pa.table({"a": a[keep], "b": b[keep], "jaccard": jac[keep]})

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------- embedding-cosine near-dup


def embedding_neardup_pairs(emb_ds, *, threshold: float = 0.95,
                            id_col: str = "vec_id", vec_col: str = "embedding"):
    """Brute-force blocked cosine: each batch multiplies against the
    broadcast normalized matrix (numpy matmul), keeps i<j pairs with
    cos ≥ threshold.  Scale path: IVF-bucket first (ops/similarity.py)
    so only same-centroid blocks multiply."""
    import ray

    ids, vecs = [], []
    for batch in emb_ds.select_columns([id_col, vec_col]).iter_batches(
            batch_size=8192, batch_format="pyarrow"):
        ids.append(batch.column(id_col).to_numpy())
        vecs.append(np.asarray(batch.column(vec_col).combine_chunks().flatten(),
                               dtype=np.float32).reshape(len(batch), -1))
    ids = np.concatenate(ids)
    mat = np.concatenate(vecs)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def f(batch: pa.Table) -> pa.Table:
        all_ids, m = ray.get(ref)
        bid = batch.column(id_col).to_numpy()
        bv = np.asarray(batch.column(vec_col).combine_chunks().flatten(),
                        dtype=np.float32).reshape(len(batch), -1)
        bv = bv / np.maximum(np.linalg.norm(bv, axis=1, keepdims=True), 1e-12)
        cos = bv @ m.T
        r, c = np.nonzero(cos >= threshold)
        a, b = bid[r], all_ids[c]
        keep = a < b
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64()),
                         "cosine": pa.array(cos[r, c][keep].astype(np.float64))})

    return emb_ds.map_batches(f, batch_format="pyarrow", batch_size=2048)
