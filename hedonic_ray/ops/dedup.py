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
    """doc → uint64[P] MinHash signature over word k-shingles.

    The whole batch's shingles are hashed in ONE vectorized
    ``hash_strings`` call (the per-doc pandas-hash overhead was the
    hot cost); per-doc salting/minima then run on small cache-resident
    slices — one big (shingles × perms) matrix was measured
    bandwidth-bound on this box."""

    def __init__(self, num_perm: int = 64, k: int = 3):
        self.k = k
        self.salts = splitmix64(np.arange(1, num_perm + 1, dtype=_U64))

    def signature(self, text: str) -> np.ndarray:
        sh = hash_strings(_word_shingles(text, self.k))
        with np.errstate(over="ignore"):
            m = splitmix64(sh[:, None] ^ self.salts[None, :])
        return m.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        shingles: list[str] = []
        offsets = np.empty(len(texts) + 1, dtype=np.int64)
        offsets[0] = 0
        for i, t in enumerate(texts):
            shingles.extend(_word_shingles(t, self.k))
            offsets[i + 1] = len(shingles)
        h = hash_strings(shingles)
        # per-doc mixing on small cache-resident slices — one big
        # (S, P) matrix is bandwidth-bound, the hot loop is not
        sigs = np.empty((len(texts), len(self.salts)), dtype=_U64)
        with np.errstate(over="ignore"):
            for i in range(len(texts)):
                hh = h[offsets[i]:offsets[i + 1]]
                sigs[i] = splitmix64(hh[:, None] ^ self.salts[None, :]).min(axis=0)
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
    if batch.num_rows == 0:
        return pa.table({"band": pa.array([], pa.int64()),
                         "bh": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64())})
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


def _pack_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pack (a, b) into one int64 key for per-batch dedup.  Requires doc
    ids < 2^31 (packed into a SIGNED 64-bit key) — asserted, not
    assumed."""
    if len(a) and (a.max() >= 2**31 or b.max() >= 2**31):
        raise ValueError("pair packing requires doc ids < 2^31; "
                         "use the groupby distinct path for wider ids")
    return a * np.int64(2**31) + b


def distinct_pairs(pairs_ds, extra_min: tuple[str, ...] = (),
                   method: str = "auto"):
    """GLOBAL (a, b) distinct — the per-batch packed-key dedup is only a
    combiner; the same pair emitted by different LSH bands lands in
    different blocks, so a global exchange is needed for exactness.
    ``extra_min`` columns are carried through with Min (they are
    pair-determined, so Min is the identity).

    ``method="packed"`` swaps the groupby for the sort-based
    ``_packed_pair_counts`` path (no per-group Python — Ray's
    ``groupby().aggregate`` spends ~10 µs/group, which dominates once
    the pair set reaches millions of mostly-singleton keys; measured
    A/B-equal at LSH-candidate scale, where the band cap keeps pairs
    small, so the default stays groupby).  Packed inherits
    ``_pack_pairs``' id < 2³¹ assertion."""
    from ray.data.aggregate import Count, Min

    aggs = [Min(c, alias_name=c) for c in extra_min]
    if not aggs:
        if method == "packed":
            return _packed_pair_counts(pairs_ds).drop_columns(["i"])
        out = pairs_ds.groupby(["a", "b"]).aggregate(Count(alias_name="_c"))
        return out.drop_columns(["_c"])
    return pairs_ds.groupby(["a", "b"]).aggregate(*aggs)


def _dedup_pairs_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (a, b) distinct via the packed int64 key — the
    combiner in front of `distinct_pairs`' global exchange."""
    a = batch.column("a").to_numpy().astype(np.int64)
    b = batch.column("b").to_numpy().astype(np.int64)
    key = np.unique(_pack_pairs(a, b))
    return pa.table({"a": key // 2**31, "b": key % 2**31})


def candidate_pairs(sig_ds, *, bands: int = 16, rows: int = 4, cap: int = 512,
                    distinct: bool = True):
    """LSH: band-hash bucketing → within-bucket pairs → per-batch dedup
    (combiner) → global (a, b) distinct.

    ``distinct=False`` skips the global-distinct shuffle for consumers
    that are duplicate-insensitive (e.g. clustering: the CSR build
    dedups the pair graph's edges exactly) — cross-band duplicate
    pairs may then appear."""
    buckets = sig_ds.map_batches(
        lambda b: _lsh_bucket_rows(b, bands, rows), batch_format="pyarrow")
    pairs = buckets.groupby(["band", "bh"]).map_groups(
        lambda g: _bucket_pairs(g, cap), batch_format="numpy")
    out = pairs.map_batches(_dedup_pairs_batch, batch_format="pyarrow")
    return distinct_pairs(out) if distinct else out


def _sig_matrix(batch: pa.Table, col: str = "sig") -> np.ndarray:
    return (np.asarray(batch.column(col).combine_chunks().flatten())
            .reshape(len(batch), -1))


def _join_pair_sides(pairs_ds, side_ds, key_col: str, payload: str,
                     num_partitions: int = 8, carry: tuple[str, ...] = ()):
    """pairs(a, b) ⋈ side on ``a`` then ``b`` (two hash-partitioned
    ``Dataset.join``s) → (a, b, *carry, <payload>_a, <payload>_b).
    ``carry`` columns from the pair side ride along through both joins.

    Ray Data operators can emit schema-less EMPTY blocks, which the
    hash-shuffle join rejects ("no match for key field") — every
    inter-join map stage therefore replaces empties with a typed empty
    table of the expected schema.
    """
    from hedonic_ray.context import drop_empty_blocks

    pschema = pairs_ds.schema().base_schema
    ptype = side_ds.schema().base_schema.field(payload).type
    s_pairs = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                         *[pschema.field(c) for c in carry]])
    s_j1 = s_pairs.append(pa.field(f"{payload}_a", ptype))

    ktype = side_ds.schema().base_schema.field(key_col).type
    pairs2 = drop_empty_blocks(
        pairs_ds.select_columns(["a", "b", *carry]), s_pairs)
    side2 = drop_empty_blocks(side_ds.select_columns([key_col, payload]),
                              pa.schema([(key_col, ktype), (payload, ptype)]))
    j1 = pairs2.join(side2, "inner", num_partitions,
                     on=("a",), right_on=(key_col,))
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            [f"{payload}_a" if c == payload else c for c in t.column_names]),
        batch_format="pyarrow")
    j2 = drop_empty_blocks(j1, s_j1).join(
        side2, "inner", num_partitions, on=("b",), right_on=(key_col,),
        left_suffix="_l", right_suffix="_r")
    return j2.map_batches(
        lambda t: t.rename_columns(
            [f"{payload}_b" if c in (payload, f"{payload}_r") else c
             for c in t.column_names]),
        batch_format="pyarrow")


def verify_pairs_minhash(pairs_ds, sig_ds, threshold: float, *,
                         method: str = "auto", broadcast_max: int = 2_000_000):
    """Estimated Jaccard = matching signature fraction ≥ threshold.

    ``method="broadcast"`` ships the full signature matrix via
    ``ray.put`` (fine while V·P·8 bytes fits a worker heap);
    ``method="join"`` is the scale path — two hash joins of the pair
    table against the signature dataset, vectorized compare per batch,
    nothing V-sized on the driver.  ``"auto"`` switches on corpus size.
    Both paths are tested equal.
    """
    import ray

    if method == "auto":
        from hedonic_ray.context import force_scale

        method = ("join" if force_scale()
                  else "broadcast" if sig_ds.count() <= broadcast_max
                  else "join")

    if method == "join":
        # acero joins reject fixed_size_list payloads — carry the
        # signature as one binary blob per doc through the joins
        def to_bin(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "sig": pa.array([], pa.binary())})
            m = _sig_matrix(t).astype("<i8")
            return pa.table({
                "doc_id": t.column("doc_id"),
                "sig": pa.array([m[i].tobytes() for i in range(len(m))],
                                pa.binary()),
            })

        sig_bin = sig_ds.map_batches(to_bin, batch_format="pyarrow")
        joined = _join_pair_sides(pairs_ds, sig_bin, "doc_id", "sig")

        def _decode(col) -> np.ndarray:
            rows = col.to_pylist()
            return np.frombuffer(b"".join(rows), "<i8").reshape(len(rows), -1)

        def verify_j(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "est_jaccard": pa.array([], pa.float64())})
            a = batch.column("a").to_numpy().astype(np.int64)
            b = batch.column("b").to_numpy().astype(np.int64)
            est = (_decode(batch.column("sig_a"))
                   == _decode(batch.column("sig_b"))).mean(axis=1)
            keep = est >= threshold
            return pa.table({"a": a[keep], "b": b[keep],
                             "est_jaccard": est[keep]})

        return joined.map_batches(verify_j, batch_format="pyarrow")

    ids, sigs = [], []
    for batch in sig_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids.append(batch.column("doc_id").to_numpy())
        sigs.append(_sig_matrix(batch))
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


def duplicate_clusters(pairs_ds, n_docs: int, *, method: str = "auto",
                       driver_max_pairs: int = 1_000_000):
    """Dup-pair graph → connected components → per-doc component array
    with component = min doc_id of the duplicate cluster.

    Near-dup pair sets are typically tiny relative to the corpus —
    ``method="driver"`` (auto-picked below ``driver_max_pairs``)
    collects the pairs and runs a union-find on the driver, skipping a
    distributed CSR build + superstep CC whose fixed costs dwarf the
    work.  ``method="distributed"`` reuses the engine's own superstep
    CC for genuinely huge pair graphs.  Identical min-label semantics
    (tested equal)."""
    pairs_ds = pairs_ds.materialize()
    if method == "auto":
        from hedonic_ray.context import force_scale

        method = ("distributed" if force_scale()
                  else "driver" if pairs_ds.count() <= driver_max_pairs
                  else "distributed")
    if method not in ("driver", "distributed"):
        raise ValueError(method)
    if method == "driver":
        # vectorized min-hooking (Shiloach–Vishkin style): no per-pair
        # Python loop — O(log n) rounds of numpy hook + pointer-jumping
        # compression over the (bounded ≤ driver_max_pairs) pair arrays
        aa, bb = [], []
        for batch in pairs_ds.select_columns(["a", "b"]).iter_batches(
                batch_size=262144, batch_format="pyarrow"):
            aa.append(batch.column("a").to_numpy().astype(np.int64))
            bb.append(batch.column("b").to_numpy().astype(np.int64))
        a = np.concatenate(aa) if aa else np.empty(0, np.int64)
        b = np.concatenate(bb) if bb else np.empty(0, np.int64)
        parent = np.arange(n_docs, dtype=np.int64)
        while True:
            ra, rb = parent[a], parent[b]
            hi = np.maximum(ra, rb)
            lo = np.minimum(ra, rb)
            diff = lo != hi
            if not diff.any():
                return parent
            # hook every higher root to the min opposing label...
            np.minimum.at(parent, hi[diff], lo[diff])
            # ...then compress to the fixed point (roots only ever
            # decrease toward the component min, so this terminates
            # with component = min doc_id — same semantics as the
            # sequential union-by-min)
            while True:
                nxt = parent[parent]
                if np.array_equal(nxt, parent):
                    break
                parent = nxt

    from hedonic_ray.algos.components import connected_components
    from hedonic_ray.graph.build import build_link_graph

    renamed = pairs_ds.map_batches(
        lambda t: pa.table({"src": t.column("a"), "dst": t.column("b")}),
        batch_format="pyarrow")
    g = build_link_graph(renamed, n_docs, directed=False, num_parts=8)
    comp = connected_components(g).state["component"]
    return comp  # comp[d] == d → representative/unique


def minhash_dedup(ds, n_docs: int, *, num_perm: int = 64, k: int = 3,
                  bands: int = 16, rows: int = 4, threshold: float = 0.7,
                  verify: str = "minhash"):
    """End-to-end MinHash-LSH near-dedup: returns (component array,
    verified pairs dataset).

    ``verify="minhash"`` keeps pairs whose signature-estimated Jaccard
    clears the threshold (cheap, approximate); ``verify="exact"``
    recomputes the exact word-k-gram Jaccard on the LSH candidates
    (distributed pairs ⋈ docs joins) — candidates are recall-only, so
    the result is exactly "pairs with true Jaccard ≥ threshold that
    share ≥1 LSH band", which is SQL-oracle-checkable."""
    sigs = minhash_signatures(ds, num_perm=num_perm, k=k).materialize()
    # clustering dedups pairs in the CSR build; skip the distinct
    # shuffle (duplicate candidates only cost duplicate verify rows)
    pairs = candidate_pairs(sigs, bands=bands, rows=rows, distinct=False)
    if verify == "exact":
        verified = verify_pairs_exact(pairs, ds, k=k,
                                      threshold=threshold).materialize()
    else:
        verified = verify_pairs_minhash(pairs, sigs, threshold).materialize()
    comp = duplicate_clusters(verified, n_docs)
    return comp, verified


# ---------------------------------------------------------------- simhash

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POP[x.view(np.uint8).reshape(*x.shape, 8)].sum(axis=-1)


def md5_low64(word: str) -> int:
    """Lower 64 bits of md5 (little-endian bytes 8..16) — matches
    DuckDB's ``md5_number_lower`` exactly, so simhash signatures are
    SQL-reproducible."""
    import hashlib

    return int.from_bytes(hashlib.md5(word.encode()).digest()[8:16], "little")


class SimHashSignatures:
    """64-bit SimHash over per-occurrence word hashes.

    Word hash = md5 low64 (cross-engine stable; DuckDB
    ``md5_number_lower`` computes the identical value, making the whole
    signature SQL-checkable).  A per-actor word→hash cache amortizes
    the md5 cost over the vocabulary, which is tiny relative to the
    corpus."""

    def __init__(self):
        self._cache: dict[str, int] = {}

    def _word_hashes(self, words: list[str]) -> np.ndarray:
        c = self._cache
        out = np.empty(len(words), dtype=_U64)
        for i, w in enumerate(words):
            h = c.get(w)
            if h is None:
                h = c[w] = md5_low64(w)
            out[i] = h
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"doc_id": batch.column("doc_id"),
                             "simhash": pa.array([], pa.int64())})
        # one flat word array for the whole batch; per-doc ±1 bit scores
        # via a single add.reduceat over the doc offsets (no per-doc
        # Python loop, no per-doc (words × 64) matrix)
        docs = [t.split() or [""] for t in batch.column("text").to_pylist()]
        offsets = np.cumsum([0] + [len(w) for w in docs[:-1]])
        flat = [w for ws in docs for w in ws]
        h = self._word_hashes(flat)
        shifts = np.arange(64, dtype=_U64)
        pm1 = (((h[:, None] >> shifts) & _U64(1)).astype(np.int8) * 2 - 1)
        score = np.add.reduceat(pm1.astype(np.int32), offsets, axis=0)
        sigs = ((score > 0).astype(_U64) << shifts).sum(axis=1, dtype=_U64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(sigs.astype(np.int64))})


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
        key, first = np.unique(_pack_pairs(a, b), return_index=True)
        return pa.table({"a": key // 2**31, "b": key % 2**31, "hamming": h[first]})

    return distinct_pairs(pairs.map_batches(dedup, batch_format="pyarrow"),
                          extra_min=("hamming",))


# ------------------------------------------------------- exact n-gram verify


def _jaccard_rows(texts_a, texts_b, k: int) -> np.ndarray:
    jac = np.empty(len(texts_a))
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        sa = set(_word_shingles(ta, k))
        sb = set(_word_shingles(tb, k))
        jac[i] = len(sa & sb) / max(1, len(sa | sb))
    return jac


def _gather_candidate_texts(pairs_ds, docs_ds):
    """Semi-join text gather shared by the exact verifiers: broadcast
    the candidate id set, filter docs DISTRIBUTED, collect only the
    O(pairs) candidate texts, broadcast them back as an object-store
    ref.  The corpus itself never lands on the driver."""
    import ray

    ids = []
    for batch in pairs_ds.select_columns(["a", "b"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        ids.append(batch.column("a").to_numpy().astype(np.int64))
        ids.append(batch.column("b").to_numpy().astype(np.int64))
    cand = np.unique(np.concatenate(ids)) if ids else np.empty(0, np.int64)
    cand_ref = ray.put(cand)

    def filt(t: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        keys = t.column("doc_id").to_numpy().astype(np.int64)
        p = np.clip(np.searchsorted(c, keys), 0, max(0, len(c) - 1))
        mask = (c[p] == keys) if len(c) else np.zeros(len(keys), bool)
        return t.filter(pa.array(mask))

    texts: dict[int, str] = {}
    for batch in (docs_ds.select_columns(["doc_id", "text"])
                  .map_batches(filt, batch_format="pyarrow")
                  .iter_batches(batch_size=8192, batch_format="pyarrow")):
        texts.update(zip(batch.column("doc_id").to_pylist(),
                         batch.column("text").to_pylist()))
    return ray.put(texts)


def verify_pairs_exact(pairs_ds, docs_ds, *, k: int = 3, threshold: float = 0.7,
                       num_partitions: int = 8, method: str = "auto",
                       broadcast_max: int = 500_000):
    """Exact word-k-gram Jaccard on candidate pairs.

    ``method="semi"`` (auto-picked while the candidate PAIR set is
    small): broadcast the candidate id set, filter docs DISTRIBUTED,
    collect only the O(pairs) candidate texts, broadcast them back —
    the corpus itself never lands on the driver, and the per-superstep
    fixed costs of two hash-shuffle joins are avoided.

    ``method="join"`` (the huge-candidate-set path): two
    hash-partitioned pairs ⋈ docs joins bring both texts onto the
    same row; nothing driver-resident at any scale.
    """
    # pairs are consumed multiple times (count, id scan, verify) — pin
    # them once instead of re-executing the LSH pipeline per pass
    pairs_ds = pairs_ds.materialize()
    if method == "auto":
        from hedonic_ray.context import force_scale

        method = ("join" if force_scale()
                  else "semi" if pairs_ds.count() <= broadcast_max
                  else "join")

    if method == "semi":
        import ray

        tx_ref = _gather_candidate_texts(pairs_ds, docs_ds)

        def verify_s(batch: pa.Table) -> pa.Table:
            tx = ray.get(tx_ref)
            a = batch.column("a").to_numpy().astype(np.int64)
            b = batch.column("b").to_numpy().astype(np.int64)
            jac = _jaccard_rows([tx[int(x)] for x in a],
                                [tx[int(x)] for x in b], k)
            keep = jac >= threshold
            return pa.table({"a": a[keep], "b": b[keep], "jaccard": jac[keep]})

        return pairs_ds.select_columns(["a", "b"]).map_batches(
            verify_s, batch_format="pyarrow")

    joined = _join_pair_sides(pairs_ds.select_columns(["a", "b"]),
                              docs_ds.select_columns(["doc_id", "text"]),
                              "doc_id", "text", num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        jac = _jaccard_rows(batch.column("text_a").to_pylist(),
                            batch.column("text_b").to_pylist(), k)
        keep = jac >= threshold
        return pa.table({"a": a[keep], "b": b[keep], "jaccard": jac[keep]})

    return joined.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------- n-gram Jaccard dedup


def _strict_shingles(text: str, k: int) -> set:
    """DISTINCT full word-k-grams only (docs with < k words get NONE) —
    exactly the SQL inverted-index semantics (positional self-joins
    produce no row without k consecutive words), unlike
    ``_word_shingles``'s short-doc fallback used by MinHash."""
    w = text.split()
    return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}


def ngram_gram_rows(ds, k: int = 3):
    """Explode docs to (doc_id, gram, gh) rows, DISTINCT per doc.

    The partition key is ``gh`` (int64 hash of the gram) — sorting
    int64 keys in the groupby shuffle is ~5× cheaper than sorting the
    gram strings themselves — but the gram STRING rides along and the
    pair emitter splits hash collisions on it, so the operator stays
    exact against the string inverted index (the SQL oracle joins on
    gram text), not merely collision-probably-exact."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        out_id: list = []
        out_g: list = []
        for d, t in zip(ids, texts):
            gs = _strict_shingles(t, k)
            out_id.extend([int(d)] * len(gs))
            out_g.extend(gs)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "gram": pa.array(out_g, pa.string()),
                         "gh": pa.array(hash_strings(out_g).astype(np.int64))})

    return ds.map_batches(f, batch_format="pyarrow")


def ngram_sizes(ds, k: int = 3):
    """(doc_id, n_grams > 0) — distinct-gram count per doc, from a
    second shuffle-free scan of the docs (cheaper than a groupby over
    the exploded gram rows)."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        n = np.fromiter((len(_strict_shingles(t, k)) for t in texts),
                        dtype=np.int64, count=len(texts))
        keep = n > 0
        return pa.table({"doc_id": pa.array(ids[keep].astype(np.int64)),
                         "n_grams": pa.array(n[keep])})

    return ds.map_batches(f, batch_format="pyarrow")


def ngram_prefix_rows(ds, k: int, threshold_num: int, threshold_den: int):
    """Explode docs to PREFIX gram rows only (AllPairs prefix filter,
    Bayardo/Ma/Srikant WWW'07): order each doc's distinct grams by the
    GLOBAL total order (gh, gram) and keep only the first
    ``p = n − ⌈t·n⌉ + 1`` of them.  Lossless for Jaccard ≥ t: a
    qualifying pair has ``|A∩B| ≥ ⌈t·max(|A|,|B|)⌉``, and if A and B
    shared no element inside both prefixes, each side's intersection
    elements would all sit in its length-(⌈t·n⌉−1) suffix — too few by
    pigeonhole.  ANY fixed global total order is lossless (frequency
    order only improves selectivity), so the gram-hash order needs no
    document-frequency pass.  Index volume drops to ≈ (1−t)·|grams|
    (~70% fewer posting rows at t = 0.7); the price is that prefix
    co-occurrence counts are PARTIAL, so candidates need the separate
    exact verify pass (`_ngram_verify_pairs`).

    Each posting row also carries the gram's 0-based POSITION in the
    doc's global-order ranking and the doc's total distinct-gram
    count, enabling the PPJoin positional filter
    (`_prefix_group_pairs`)."""
    tnum, tden = int(threshold_num), int(threshold_den)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        out_id: list = []
        out_g: list = []
        out_h: list = []
        out_pos: list = []
        out_n: list = []
        for d, t in zip(ids, texts):
            gs = sorted(_strict_shingles(t, k))
            if not gs:
                continue
            n = len(gs)
            h = hash_strings(gs).astype(np.int64)
            order = np.lexsort((np.array(gs, dtype=object), h))
            p = n - (tnum * n + tden - 1) // tden + 1  # n − ⌈t·n⌉ + 1 ≥ 1
            keep = order[:p]
            out_id.extend([int(d)] * len(keep))
            out_g.extend([gs[i] for i in keep])
            out_h.extend(h[keep].tolist())
            out_pos.extend(range(len(keep)))
            out_n.extend([n] * len(keep))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "pos": pa.array(out_pos, pa.int64()),
                         "n": pa.array(out_n, pa.int64()),
                         "gram": pa.array(out_g, pa.string()),
                         "gh": pa.array(out_h, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def _strict_intersections(ta: list[str], tb: list[str], k: int):
    """(i, na, nb) int64 arrays for row-aligned text pairs — the same
    strict-shingle semantics as the inverted index."""
    n = len(ta)
    i = np.zeros(n, np.int64)
    na = np.zeros(n, np.int64)
    nb = np.zeros(n, np.int64)
    for j in range(n):
        sa = _strict_shingles(ta[j], k)
        sb = _strict_shingles(tb[j], k)
        i[j] = len(sa & sb)
        na[j] = len(sa)
        nb[j] = len(sb)
    return i, na, nb


def _ngram_verify_pairs(pairs_ds, docs_ds, *, k: int, threshold_num: int,
                        threshold_den: int, method: str):
    """Exact integer Jaccard over candidate (a, b) pairs — emits the
    same (a, b, jacc_e9) rows and threshold rule as the full inverted
    index, so prefix-filtered candidates finish bit-identical to it.

    ``method="broadcast"``: the shared semi-join text gather
    (`_gather_candidate_texts`).  ``method="join"``: two
    hash-partitioned pairs ⋈ docs joins carry both texts onto the
    row; nothing driver-resident at any scale."""
    tnum, tden = int(threshold_num), int(threshold_den)

    def finish(a, b, i, na, nb) -> pa.Table:
        denom = na + nb - i
        keep = tden * i >= tnum * denom
        jacc = np.zeros(len(i), dtype=np.int64)
        np.floor_divide(i * np.int64(1_000_000_000), denom, out=jacc,
                        where=denom > 0)
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                         "jacc_e9": pa.array(jacc[keep])})

    if method == "broadcast":
        import ray

        # the candidate pipeline (two shuffles) is consumed twice —
        # once by the id gather, once by the verify map — pin it
        # (verify_pairs_exact learned this the hard way, see its
        # materialize note)
        pairs_ds = pairs_ds.materialize()
        tx_ref = _gather_candidate_texts(pairs_ds, docs_ds)

        def verify_s(batch: pa.Table) -> pa.Table:
            tx = ray.get(tx_ref)
            a = batch.column("a").to_numpy().astype(np.int64)
            b = batch.column("b").to_numpy().astype(np.int64)
            i, na, nb = _strict_intersections(
                [tx[int(x)] for x in a], [tx[int(x)] for x in b], k)
            return finish(a, b, i, na, nb)

        return pairs_ds.select_columns(["a", "b"]).map_batches(
            verify_s, batch_format="pyarrow")

    joined = _join_pair_sides(pairs_ds.select_columns(["a", "b"]),
                              docs_ds.select_columns(["doc_id", "text"]),
                              "doc_id", "text")

    def verify_j(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        i, na, nb = _strict_intersections(
            batch.column("text_a").to_pylist(),
            batch.column("text_b").to_pylist(), k)
        return finish(a, b, i, na, nb)

    return joined.map_batches(verify_j, batch_format="pyarrow")


def _prefix_group_pairs(group: dict, tnum: int, tden: int, max_df) -> dict:
    """Prefix-collision pairs with the PPJoin POSITIONAL filter
    (Xiao/Wang/Lin/Yu WWW'08): a pair sharing this gram at positions
    (i, j) of docs sized (nA, nB) can still reach overlap at most
    ``ub = 1 + min(nA−i−1, nB−j−1)``; it qualifies only if
    ``ub ≥ α = ⌈tnum·(nA+nB)/(tnum+tden)⌉`` (the J ≥ t minimum
    overlap).  Lossless under the keep-if-ANY-shared-gram-passes rule:
    the smallest common element c₁ has at least the other α−1 common
    elements after it on BOTH sides, so its ub ≥ α."""
    ids_all = group["doc_id"].astype(np.int64)
    out_a: list = []
    out_b: list = []
    if len(ids_all) >= 2:
        pos_all = group["pos"].astype(np.int64)
        n_all = group["n"].astype(np.int64)
        _, inv = np.unique(group["gram"], return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.flatnonzero(np.diff(inv[order])) + 1
        for seg in np.split(order, bounds):
            if len(seg) < 2 or (max_df is not None and len(seg) > max_df):
                continue
            ids, pos, n = ids_all[seg], pos_all[seg], n_all[seg]
            iu, iv = np.triu_indices(len(ids), k=1)
            ub = 1 + np.minimum(n[iu] - pos[iu] - 1, n[iv] - pos[iv] - 1)
            alpha = (tnum * (n[iu] + n[iv]) + tnum + tden - 1) \
                // (tnum + tden)
            keep = ub >= alpha
            if not keep.any():
                continue
            a, b = ids[iu[keep]], ids[iv[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
    if not out_a:
        return {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
    return {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}


def _gram_group_pairs(group: dict, max_df) -> dict:
    """Pairs per DISTINCT GRAM in a hash group.  A group almost always
    holds one gram; the np.unique split makes 64-bit collisions merge
    nothing (exactness does not rest on hash width)."""
    ids_all = group["doc_id"].astype(np.int64)
    out_a: list = []
    out_b: list = []
    if len(ids_all) >= 2:
        _, inv = np.unique(group["gram"], return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.flatnonzero(np.diff(inv[order])) + 1
        for seg in np.split(ids_all[order], bounds):
            if len(seg) < 2 or (max_df is not None and len(seg) > max_df):
                continue
            ids = np.sort(seg)
            iu = np.triu_indices(len(ids), k=1)
            out_a.append(ids[iu[0]])
            out_b.append(ids[iu[1]])
    if not out_a:
        return {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
    return {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}


def _packed_pair_counts(pairs_ds):
    """(a, b) occurrence counts → (a, b, i) WITHOUT a per-group
    aggregate (Ray's ``groupby().aggregate`` spends ~10 µs of Python
    per group — measured 12–15 s for 1.1 M mostly-singleton pair
    groups, vs ~3 s for this whole path).

    Global sort by the packed int64 pair key, then vectorized
    ``np.unique`` partial counts per batch: after a range-partitioned
    sort equal keys are CONTIGUOUS across the concatenated batch
    sequence, so a key appearing in more than one batch must be the
    first or last key of each of its batches — interior keys are
    provably batch-local and their partial count is final.  Only the
    ≤ 2 boundary keys per batch (a few hundred rows) go through the
    real groupby-sum, then union the two streams.  Fully streaming,
    no driver state, exact at any scale."""
    from ray.data.aggregate import Sum

    def pack(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        return pa.table({"p": pa.array(_pack_pairs(a, b))})

    packed = pairs_ds.map_batches(pack, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        p = t.column("p").to_numpy()
        if len(p) == 0:
            return pa.table({"p": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "edge": pa.array([], pa.bool_())})
        key, cnt = np.unique(p, return_counts=True)
        edge = np.zeros(len(key), dtype=bool)
        edge[0] = edge[-1] = True
        return pa.table({"p": pa.array(key), "c": pa.array(cnt.astype(np.int64)),
                         "edge": pa.array(edge)})

    parts = packed.sort("p").map_batches(
        partial, batch_format="pyarrow", batch_size=None).materialize()

    def select(want_edge: bool):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = t.column("edge") if want_edge else pc.invert(t.column("edge"))
            return t.filter(mask).drop_columns(["edge"])

        return f

    interior = parts.map_batches(select(False), batch_format="pyarrow")
    edges = (parts.map_batches(select(True), batch_format="pyarrow")
             .groupby("p").aggregate(Sum("c", alias_name="c")))
    merged = interior.union(edges)

    def unpack(t: pa.Table) -> pa.Table:
        p = t.column("p").to_numpy()
        return pa.table({"a": pa.array(p // 2**31), "b": pa.array(p % 2**31),
                         "i": t.column("c")})

    return merged.map_batches(unpack, batch_format="pyarrow")


def ngram_pair_stage(ds, *, k: int = 3, max_df: int | None = None):
    """(counts, sizes) — the full-inverted-index pair stage SHARED by
    the Jaccard and containment scorers (explode → gram groupby →
    packed pair counts; per-doc gram-set sizes from a second
    shuffle-free scan).  Exposed so a caller running BOTH scorers over
    one corpus (the gate does; a real intake often does too) can
    materialize the stage once — the scorers differ only in their
    integer threshold/denominator, applied after this stage."""
    grams = ngram_gram_rows(ds, k)
    sizes = ngram_sizes(ds, k)
    pairs = grams.groupby("gh").map_groups(
        lambda g: _gram_group_pairs(g, max_df), batch_format="numpy")
    return _packed_pair_counts(pairs), sizes


def ngram_jaccard_pairs(ds, n_docs: int, *, k: int = 3,
                        threshold_num: int = 7, threshold_den: int = 10,
                        method: str = "auto", broadcast_max: int = 500_000,
                        max_df: int | None = None, index: str = "auto",
                        precomputed=None):
    """EXACT word-k-gram Jaccard near-dup pairs via a distributed
    inverted index — no signatures, no candidate recall gap.  This is
    the dedup family's third blocking strategy (exact hash, LSH
    signatures, and here the posting-list self-join the SQL oracle
    also uses):

        explode:   (doc_id, distinct gram) rows        [map_batches]
        invert:    groupby(gram) → co-occurrence pairs [THE shuffle]
        count:     groupby((a, b)) → |A ∩ B|           [pair shuffle]
        denoms:    per-doc gram counts attached (broadcast lookup
                   below ``broadcast_max`` docs; two hash-partitioned
                   ``Dataset.join``s above, or under force_scale)
        filter:    threshold_den·i ≥ threshold_num·(|A|+|B|−i)

    All arithmetic is integer (the threshold is the rational
    ``threshold_num/threshold_den``; the reported score is
    ``jacc_e9 = i·10⁹ // (|A|+|B|−i)``), so the result is bit-exact
    against the SQL inverted-index oracle — no float tie risk.

    Scale notes: the gram groupby is the standard exact-Jaccard
    inverted-index exchange (shuffle volume ≈ corpus token count).
    Hot grams produce quadratic pair blowup — ``max_df`` drops grams
    appearing in more than ``max_df`` docs (document-frequency
    pruning, the standard mitigation), which makes the result a
    documented UNDER-approximation, so the default is None/exact and
    the driver-gate oracle runs with None.

    ``index="prefix"`` (ROADMAP 8, still EXACT): posts only each
    doc's AllPairs prefix — ``n − ⌈t·n⌉ + 1`` grams in the global
    (gh, gram) order — into the inverted-index exchange (≈ (1−t)·
    fewer posting rows and no quadratic pair emission on grams
    outside the prefixes), then finishes candidates through the
    separate exact-verify pass, which re-applies the same integer
    threshold and score.  With the PPJoin positional filter the
    prefix path reaches wall-time parity with the full index even at
    toy scale (and ~69 % less posting volume), but ``index="auto"``
    still resolves to "full" in normal runs — at gate scale neither
    wins and full is the simpler plan — and to "prefix" under
    ``HEDONIC_RAY_FORCE_SCALE``, so the forced-scale oracle test
    drives the 100 TB shape against the same SQL.  A/B-equality with
    the full index is additionally unit-tested through both verify
    paths.

    ``precomputed``: a (counts, sizes) pair from
    :func:`ngram_pair_stage`, used by the full-index branch instead of
    rebuilding the stage (the prefix branch ignores it) — for callers
    running several scorers over one corpus.
    """
    from hedonic_ray.context import force_scale

    if index == "auto":
        index = "prefix" if force_scale() else "full"
    if index not in ("full", "prefix"):
        raise ValueError(f"unknown ngram_jaccard_pairs index {index!r}")
    if method == "auto":
        method = ("join" if force_scale()
                  else "broadcast" if n_docs <= broadcast_max else "join")
    if method not in ("broadcast", "join"):
        raise ValueError(f"unknown ngram_jaccard_pairs method {method!r}")

    if index == "prefix":
        tnum, tden = int(threshold_num), int(threshold_den)
        pre = ngram_prefix_rows(ds, k, threshold_num, threshold_den)
        cand = pre.groupby("gh").map_groups(
            lambda g: _prefix_group_pairs(g, tnum, tden, max_df),
            batch_format="numpy")

        cand = distinct_pairs(
            cand.map_batches(_dedup_pairs_batch, batch_format="pyarrow"))
        return _ngram_verify_pairs(
            cand, ds, k=k, threshold_num=threshold_num,
            threshold_den=threshold_den, method=method)

    counts, sizes = precomputed or ngram_pair_stage(ds, k=k, max_df=max_df)

    tnum, tden = int(threshold_num), int(threshold_den)

    def finish(t: pa.Table, na: np.ndarray, nb: np.ndarray) -> pa.Table:
        i = t.column("i").to_numpy().astype(np.int64)
        denom = na + nb - i
        keep = tden * i >= tnum * denom
        jacc = np.zeros(len(i), dtype=np.int64)
        np.floor_divide(i * np.int64(1_000_000_000), denom, out=jacc,
                        where=denom > 0)
        idx = pa.array(np.flatnonzero(keep))
        return pa.table({"a": t.column("a").take(idx),
                         "b": t.column("b").take(idx),
                         "jacc_e9": pa.array(jacc[keep])})

    return _attach_sizes_and_score(counts, sizes, n_docs, method, finish,
                                   score_col="jacc_e9")


def _attach_sizes_and_score(counts, sizes, n_docs: int, method: str,
                            finish, score_col: str):
    """Shared denominator-attach tail for the intersection-count pair
    scorers: pair counts (a, b, i) get both docs' gram-set sizes
    attached — broadcast int64 LUT below ``broadcast_max`` docs, two
    hash-partitioned joins above — then ``finish(t, na, nb)`` applies
    the caller's integer threshold/score.  ``score_col`` only names the
    typed empty block (Ray Data operators can emit schema-less empty
    blocks)."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      score_col: pa.array([], pa.int64())})

    if method == "broadcast":
        import ray

        lut = np.zeros(n_docs, dtype=np.int64)
        for r in sizes.take_all():
            lut[int(r["doc_id"])] = int(r["n_grams"])
        lut_ref = ray.put(lut)

        def bfin(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty
            lt = ray.get(lut_ref)
            a = t.column("a").to_numpy().astype(np.int64)
            b = t.column("b").to_numpy().astype(np.int64)
            return finish(t, lt[a], lt[b])

        return counts.map_batches(bfin, batch_format="pyarrow")

    joined = _join_pair_sides(counts, sizes, "doc_id", "n_grams",
                              carry=("i",))

    def jfin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        return finish(t, t.column("n_grams_a").to_numpy().astype(np.int64),
                      t.column("n_grams_b").to_numpy().astype(np.int64))

    return joined.map_batches(jfin, batch_format="pyarrow")


def ngram_containment_pairs(ds, n_docs: int, *, k: int = 3,
                            threshold_num: int = 8, threshold_den: int = 10,
                            method: str = "auto",
                            broadcast_max: int = 500_000,
                            max_df: int | None = None,
                            precomputed=None):
    """EXACT word-k-gram CONTAINMENT near-dup pairs: report (a < b)
    whenever ``|A ∩ B| ≥ t · min(|A|, |B|)`` — the asymmetric
    complement of :func:`ngram_jaccard_pairs` that catches a short
    document wholly embedded in a longer one (quote inclusion, page
    boilerplate + article), which Jaccard misses because the union is
    dominated by the longer side (Broder 1997's *containment* measure).

    Same inverted-index shape and integer arithmetic as the Jaccard
    variant (explode → gram groupby → packed pair counts → size attach
    → threshold); the reported score is
    ``cont_e9 = i·10⁹ // min(|A|, |B|)``.  ``max_df`` is the same
    documented under-approximation knob and defaults to None/exact;
    ``precomputed`` takes an (counts, sizes) pair from
    :func:`ngram_pair_stage` shared with the Jaccard scorer."""
    if method == "auto":
        from hedonic_ray.context import force_scale

        method = ("join" if force_scale()
                  else "broadcast" if n_docs <= broadcast_max else "join")
    if method not in ("broadcast", "join"):
        raise ValueError(f"unknown ngram_containment_pairs method {method!r}")

    counts, sizes = precomputed or ngram_pair_stage(ds, k=k, max_df=max_df)

    tnum, tden = int(threshold_num), int(threshold_den)

    def finish(t: pa.Table, na: np.ndarray, nb: np.ndarray) -> pa.Table:
        i = t.column("i").to_numpy().astype(np.int64)
        denom = np.minimum(na, nb)
        keep = tden * i >= tnum * denom
        cont = np.zeros(len(i), dtype=np.int64)
        np.floor_divide(i * np.int64(1_000_000_000), denom, out=cont,
                        where=denom > 0)
        idx = pa.array(np.flatnonzero(keep))
        return pa.table({"a": t.column("a").take(idx),
                         "b": t.column("b").take(idx),
                         "cont_e9": pa.array(cont[keep])})

    return _attach_sizes_and_score(counts, sizes, n_docs, method, finish,
                                   score_col="cont_e9")


# ------------------------------------------------ test-set decontamination


def decontaminate_counts(ds, bench_ids, *, k: int = 8,
                         method: str = "auto", num_partitions: int = 8,
                         bench_broadcast_max: int = 100_000):
    """TEST-SET DECONTAMINATION (the GPT-3 appendix-C / Llama-2 intake
    step): for every TRAINING document, count the DISTINCT word-k-grams
    it shares with a held-out BENCHMARK document set (``bench_ids``);
    a nonzero count flags eval contamination.  Returns (doc_id,
    n_shared) rows for contaminated training docs only — benchmark
    docs are excluded, clean docs emit nothing (the report is the
    contamination list, not a corpus scan).

    ``method="broadcast"`` (auto while the benchmark has ≤
    ``bench_broadcast_max`` documents — the normal case: an eval set
    is tiny by definition): the benchmark gram set is gathered ONCE
    into a frozenset, ``ray.put`` once, and every corpus batch counts
    per-doc set intersections locally — zero exchanges beyond the
    benchmark-side gather.
    ``method="join"`` (auto above the cap; forced by
    ``HEDONIC_RAY_FORCE_SCALE``): fully distributed — training gram
    rows (distinct per doc, :func:`ngram_gram_rows`) inner-join the
    DISTINCT benchmark gram rows on ``(gh, gram)`` (hash key for
    shuffle economy, gram string for exactness), then one
    ``groupby(doc_id)`` count.  No driver-held gram state: both sides
    hash-partition on the join key, so a million-document benchmark
    suite against a 100-TB corpus stays in the exchange."""
    import ray
    from ray.data.aggregate import Count

    from hedonic_ray.context import drop_empty_blocks, force_scale

    bench_ids = np.sort(np.asarray(bench_ids, dtype=np.int64))
    if method == "auto":
        method = ("join" if force_scale()
                  else "broadcast" if len(bench_ids) <= bench_broadcast_max
                  else "join")
    if method not in ("broadcast", "join"):
        raise ValueError(f"unknown decontaminate_counts method {method!r}")

    bench_ref = ray.put(bench_ids)

    def side(t: pa.Table, want_bench: bool) -> pa.Table:
        m = np.isin(t.column("doc_id").to_numpy(), ray.get(bench_ref))
        return t.filter(pa.array(m if want_bench else ~m))

    bench_grams = ngram_gram_rows(
        ds.map_batches(lambda t: side(t, True), batch_format="pyarrow"), k)
    train = ds.map_batches(lambda t: side(t, False), batch_format="pyarrow")

    if method == "broadcast":
        gset = frozenset(
            r["gram"] for r in
            bench_grams.select_columns(["gram"]).take_all())
        gset_ref = ray.put(gset)

        def count_shared(t: pa.Table) -> pa.Table:
            bset = ray.get(gset_ref)
            ids = t.column("doc_id").to_numpy()
            texts = t.column("text").to_pylist()
            out_i: list = []
            out_n: list = []
            for d, txt in zip(ids, texts):
                n = len(_strict_shingles(txt, k) & bset)
                if n:
                    out_i.append(int(d))
                    out_n.append(n)
            return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                             "n_shared": pa.array(out_n, pa.int64())})

        return train.map_batches(count_shared, batch_format="pyarrow")

    # join path: distinct benchmark grams (CLAUDE.md distinct idiom),
    # then gram-keyed semi-join + per-doc count
    bg = (bench_grams.groupby(["gh", "gram"])
          .aggregate(Count(alias_name="_c")).drop_columns(["_c"]))
    s_tg = pa.schema([("doc_id", pa.int64()), ("gram", pa.string()),
                      ("gh", pa.int64())])
    s_bg = pa.schema([("gh", pa.int64()), ("gram", pa.string())])
    j = drop_empty_blocks(ngram_gram_rows(train, k), s_tg).join(
        drop_empty_blocks(bg.select_columns(["gh", "gram"]), s_bg),
        "inner", num_partitions, on=("gh", "gram"),
        right_on=("gh", "gram"))
    return j.groupby("doc_id").aggregate(Count(alias_name="n_shared"))


def ngram_novelty_counts(ds, *, k: int = 3):
    """N-GRAM NOVELTY per document: the number of distinct word-k-grams
    whose FIRST corpus occurrence (minimum doc_id) is this document —
    the marginal-novelty signal data-curriculum and crawl-refresh
    pipelines score incoming documents with (a doc full of
    already-seen passages adds nothing).  Corpus sum telescopes to the
    corpus distinct-gram count (pytest invariant).

    Shape: per-batch (gram, min doc) dict combiner → one
    ``groupby(gram).Min`` exchange → ``groupby(first_doc).Count`` —
    the vocab-growth exchange (``textstats.vocab_growth``) at passage
    granularity; the driver never holds gram state."""
    from ray.data.aggregate import Count, Min

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        agg: dict = {}
        for d, txt in zip(ids, texts):
            d = int(d)
            for g in _strict_shingles(txt, k):
                prev = agg.get(g)
                if prev is None or d < prev:
                    agg[g] = d
        return pa.table({"gram": pa.array(list(agg.keys()), pa.string()),
                         "first_doc": pa.array(list(agg.values()),
                                               pa.int64())})

    firsts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("gram").aggregate(Min("first_doc",
                                             alias_name="first_doc")))

    def to_doc(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("first_doc")})

    return (firsts.map_batches(to_doc, batch_format="pyarrow")
            .groupby("doc_id").aggregate(Count(alias_name="n_novel")))


def _cross_group_pairs(group: dict, max_df) -> dict:
    """Cross-side pairs per DISTINCT GRAM in a hash group: every
    (old, new) combination, NO within-side pairs — the refresh-dedup
    emitter (:func:`_gram_group_pairs` with the old×old and new×new
    quadratic terms never generated)."""
    ids_all = group["doc_id"].astype(np.int64)
    side_all = group["side"].astype(np.int8)
    out_a: list = []
    out_b: list = []
    if len(ids_all) >= 2:
        _, inv = np.unique(group["gram"], return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.flatnonzero(np.diff(inv[order])) + 1
        for seg_ids, seg_side in zip(np.split(ids_all[order], bounds),
                                     np.split(side_all[order], bounds)):
            if max_df is not None and len(seg_ids) > max_df:
                continue
            old = seg_ids[seg_side == 0]
            new = seg_ids[seg_side == 1]
            if len(old) == 0 or len(new) == 0:
                continue
            out_a.append(np.repeat(old, len(new)))
            out_b.append(np.tile(new, len(old)))
    if not out_a:
        return {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
    return {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}


def incremental_jaccard_pairs(old_ds, new_ds, n_docs: int, *, k: int = 3,
                              threshold_num: int = 7,
                              threshold_den: int = 10,
                              method: str = "auto",
                              broadcast_max: int = 500_000,
                              max_df: int | None = None):
    """INCREMENTAL (crawl-refresh) near-dup detection: exact word-k-gram
    Jaccard ≥ t pairs BETWEEN an existing corpus (``old_ds``) and a new
    snapshot (``new_ds``) — (a=old doc, b=new doc, jacc_e9) rows; no
    side is ever paired with itself.  Doc ids must be globally unique
    across the two sides (two partitions of one id space — asserted by
    the packing, not assumed).

    Why its own operator instead of filtering a monolithic re-dedup:
    at refresh scale the new snapshot is a sliver of the corpus, and
    the posting-list pair emitter here does O(|old∩g|·|new∩g|) work
    per gram instead of C(|g|, 2) — the old×old quadratic term, which
    DOMINATES a monolithic run (old ≫ new), is never generated, not
    merely filtered out.  Exchanges, pair packing and integer
    arithmetic are shared with :func:`ngram_jaccard_pairs`, so the
    result equals the cross-side subset of the monolithic pair set
    (unit-tested)."""
    from hedonic_ray.context import force_scale

    if method == "auto":
        method = ("join" if force_scale()
                  else "broadcast" if n_docs <= broadcast_max else "join")
    if method not in ("broadcast", "join"):
        raise ValueError(
            f"unknown incremental_jaccard_pairs method {method!r}")

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int8)))

        return f

    grams = (ngram_gram_rows(old_ds, k)
             .map_batches(tag(0), batch_format="pyarrow")
             .union(ngram_gram_rows(new_ds, k)
                    .map_batches(tag(1), batch_format="pyarrow")))
    sizes = ngram_sizes(old_ds, k).union(ngram_sizes(new_ds, k))

    pairs = grams.groupby("gh").map_groups(
        lambda g: _cross_group_pairs(g, max_df), batch_format="numpy")
    counts = _packed_pair_counts(pairs)

    tnum, tden = int(threshold_num), int(threshold_den)

    def finish(t: pa.Table, na: np.ndarray, nb: np.ndarray) -> pa.Table:
        i = t.column("i").to_numpy().astype(np.int64)
        denom = na + nb - i
        keep = tden * i >= tnum * denom
        jacc = np.zeros(len(i), dtype=np.int64)
        np.floor_divide(i * np.int64(1_000_000_000), denom, out=jacc,
                        where=denom > 0)
        idx = pa.array(np.flatnonzero(keep))
        return pa.table({"a": t.column("a").take(idx),
                         "b": t.column("b").take(idx),
                         "jacc_e9": pa.array(jacc[keep])})

    return _attach_sizes_and_score(counts, sizes, n_docs, method, finish,
                                   score_col="jacc_e9")


# -------------------------------------------------- embedding-cosine near-dup


def embedding_neardup_pairs(emb_ds, *, threshold: float = 0.95,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            method: str = "auto", brute_max: int = 100_000,
                            n_clusters: int = 32, probes: int = 2,
                            sample_size: int = 8192, seed: int = 0,
                            dtype=np.float32):
    """Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold).

    ``method="brute"``: blocked all-pairs — each batch matmuls against
    the broadcast normalized matrix.  O(N²) compute and an O(N·d)
    broadcast: a baseline, not a scale path.

    ``method="ivf"`` (the scale path): vectors are assigned to their
    ``probes`` nearest k-means centroids (multi-probe so near
    neighbors straddling a Voronoi boundary still co-bucket), bucketed
    with ONE ``groupby(bucket)`` shuffle, and only within-bucket blocks
    multiply; duplicate pairs from overlapping probes collapse in a
    global (a, b) distinct.  No full-matrix broadcast anywhere.
    Tested pair-identical to brute force on fixtures.

    ``"auto"`` picks brute below ``brute_max`` vectors.
    """
    if method == "auto":
        from hedonic_ray.context import force_scale

        method = ("ivf" if force_scale()
                  else "brute" if emb_ds.count() <= brute_max else "ivf")
    if method == "ivf":
        return _embedding_neardup_ivf(
            emb_ds, threshold=threshold, id_col=id_col, vec_col=vec_col,
            n_clusters=n_clusters, probes=probes, sample_size=sample_size,
            seed=seed, dtype=dtype)
    return _embedding_neardup_brute(emb_ds, threshold=threshold,
                                    id_col=id_col, vec_col=vec_col, dtype=dtype)


def _emb_matrix(batch: pa.Table, vec_col: str, dtype) -> np.ndarray:
    m = np.asarray(batch.column(vec_col).combine_chunks().flatten(),
                   dtype=dtype).reshape(len(batch), -1)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _embedding_neardup_brute(emb_ds, *, threshold, id_col, vec_col, dtype):
    import ray

    ids, vecs = [], []
    for batch in emb_ds.select_columns([id_col, vec_col]).iter_batches(
            batch_size=8192, batch_format="pyarrow"):
        ids.append(batch.column(id_col).to_numpy())
        vecs.append(_emb_matrix(batch, vec_col, dtype))
    ids = np.concatenate(ids)
    mat = np.concatenate(vecs)
    ref = ray.put((ids, mat))

    def f(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        all_ids, m = ray.get(ref)
        bid = batch.column(id_col).to_numpy()
        bv = _emb_matrix(batch, vec_col, dtype)
        cos = bv @ m.T
        r, c = np.nonzero(cos >= threshold)
        a, b = bid[r], all_ids[c]
        keep = a < b
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64()),
                         "cosine": pa.array(cos[r, c][keep].astype(np.float64))})

    return emb_ds.map_batches(f, batch_format="pyarrow", batch_size=2048)


def _embedding_neardup_ivf(emb_ds, *, threshold, id_col, vec_col,
                           n_clusters, probes, sample_size, seed, dtype):
    import ray
    from hedonic_ray.ops.similarity import kmeans_fit

    sample, taken = [], 0
    for batch in emb_ds.select_columns([vec_col]).iter_batches(
            batch_size=2048, batch_format="pyarrow"):
        sample.append(np.asarray(batch.column(vec_col).combine_chunks()
                                 .flatten(), dtype=np.float32)
                      .reshape(len(batch), -1))
        taken += len(batch)
        if taken >= sample_size:
            break
    cent = kmeans_fit(np.concatenate(sample)[:sample_size], n_clusters,
                      seed=seed)
    cent_ref = ray.put(cent.astype(dtype))
    p = probes

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             vec_col: pa.array([], pa.list_(pa.float64()))})
        m = _emb_matrix(batch, vec_col, dtype)
        sims = m @ c.T
        kk = min(p, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        d = m.shape[1]
        return pa.table({
            "bucket": pa.array(top.reshape(-1), pa.int64()),
            id_col: pa.array(np.repeat(ids, kk), pa.int64()),
            vec_col: pa.FixedSizeListArray.from_arrays(
                pa.array(np.repeat(m, kk, axis=0).reshape(-1)
                         .astype(np.float64)), d),
        })

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy().astype(np.int64)
        m = np.asarray(group.column(vec_col).combine_chunks().flatten(),
                       dtype=dtype).reshape(len(ids), -1)
        outs = {"a": [], "b": [], "cosine": []}
        # blocked within-bucket matmul keeps peak memory bounded even
        # for hot buckets
        step = 4096
        for i in range(0, len(ids), step):
            cos = m[i:i + step] @ m.T
            r, c = np.nonzero(cos >= threshold)
            a, b = ids[i + r], ids[c]
            keep = a < b
            outs["a"].append(a[keep])
            outs["b"].append(b[keep])
            outs["cosine"].append(cos[r, c][keep].astype(np.float64))
        return pa.table({
            "a": pa.array(np.concatenate(outs["a"]) if outs["a"]
                          else np.empty(0, np.int64), pa.int64()),
            "b": pa.array(np.concatenate(outs["b"]) if outs["b"]
                          else np.empty(0, np.int64), pa.int64()),
            "cosine": pa.array(np.concatenate(outs["cosine"]) if outs["cosine"]
                               else np.empty(0, np.float64), pa.float64()),
        })

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow",
                                  batch_size=4096)
    pairs = assigned.groupby("bucket").map_groups(bucket_pairs,
                                                  batch_format="pyarrow")
    return distinct_pairs(pairs, extra_min=("cosine",))


def normalized_exact_dedup(ds, col: str = "text", key: str = "doc_id"):
    """NEAR-exact dedup on NORMALIZED text (the C4-style canonical
    form: lowercase, every non-alphanumeric run collapsed to one
    space, trimmed) — catches case/punctuation/whitespace variants
    plain exact dedup misses.  Normalization is three pure
    pyarrow.compute kernels per batch (RE2, no Python per row); then
    the same hash → groupby(hash) → min-key shape as
    :func:`exact_dedup`."""
    import pyarrow.compute as pc

    def norm(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t.column(col))
        s = pc.replace_substring_regex(s, "[^a-z0-9]+", " ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table({key: t.column(key), "norm_text": s})

    normed = ds.map_batches(norm, batch_format="pyarrow")
    return exact_dedup(normed, col="norm_text", key=key)


# --- sliding-window substring dedup (character-level) ----------------

def _text_window_words(t: pa.Table, L: int, mode: str,
                       col: str = "text", key: str = "doc_id") -> pa.Table:
    """Every L-BYTE sliding window of each text, encoded as int64
    words.  ``mode="exact"`` emits the window VALUE as L/8
    order-preserving words (big-endian bytes, sign-bit-flipped so
    int64 ordering equals bytewise ordering — a bijection, so equality
    is exact); ``mode="hash"`` folds the words into ONE int64 (the
    100-TB exchange-size path; collisions are ~2⁻⁶⁴ per pair and the
    fixture-scale equality with the exact path is unit-tested).

    Fully vectorized: the batch's texts are read as one UTF-8 byte
    buffer straight out of the Arrow offsets/data buffers,
    ``sliding_window_view`` + one fancy-index copy materializes all
    windows, and the per-(window, doc) DISTINCT is an Arrow group_by.
    Windows are BYTE windows — identical to SQL ``substr`` character
    windows on ASCII corpora (the oracle's applicability condition).
    """
    nwords = L // 8
    arr = t.column(col).combine_chunks()
    arr = arr.cast(pa.large_string())
    docs = t.column(key).to_numpy()
    offs = np.frombuffer(arr.buffers()[1], np.int64)[
        arr.offset:arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = np.diff(offs)
    counts = np.maximum(lens - L + 1, 0)
    total = int(counts.sum())
    names = ([f"w{i}" for i in range(nwords)] if mode == "exact" else ["w0"])
    if total == 0:
        return pa.table({key: pa.array([], pa.int64()),
                         **{n: pa.array([], pa.int64()) for n in names}})
    shift = np.cumsum(counts) - counts
    starts = (np.repeat(offs[:-1], counts)
              + (np.arange(total, dtype=np.int64) - np.repeat(shift, counts)))
    wins = np.lib.stride_tricks.sliding_window_view(data, L)[starts]
    words = wins.view(">u8").astype(np.uint64)          # (total, nwords)
    if mode == "exact":
        signed = (words ^ np.uint64(1 << 63)).view(np.int64)
        cols = {names[i]: signed[:, i] for i in range(nwords)}
    else:
        # one odd multiplier per word position, derived for ANY nwords
        # (splitmix64 of the position index) — a fixed 4-entry table
        # would IndexError at L > 32
        from hedonic_ray.functions.hashing import splitmix64

        muls = splitmix64(np.arange(nwords, dtype=np.uint64)) | np.uint64(1)
        h = np.zeros(total, np.uint64)
        with np.errstate(over="ignore"):
            for i in range(words.shape[1]):
                h ^= (words[:, i] * muls[i]) + np.uint64(i)
        cols = {"w0": h.view(np.int64)}
    g = pa.table({key: pa.array(np.repeat(docs, counts)),
                  **{n: pa.array(c) for n, c in cols.items()}})
    return g.group_by([key] + names).aggregate([]).select([key] + names)


def substring_dup_counts(ds, L: int = 32, mode: str = "auto",
                         col: str = "text", key: str = "doc_id"):
    """Sliding-window substring dedup (the suffix-array stage of Lee
    et al., "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499, re-expressed for Ray Data): for every
    document, count how many of its DISTINCT L-byte windows also occur
    in at least one OTHER document.  Returns (key, n_dup_windows) for
    documents with at least one shared window, sorted by key.

    Shape: window rows (already per-(doc,window) distinct — a doc's
    windows never straddle batches, so the per-batch Arrow distinct is
    globally exact) → ONE range-partitioned sort on the window words →
    per-block vectorized run-length counting.  After the sort, equal
    keys are contiguous across the block sequence, so any key that is
    not the first or last key of its block is provably block-local and
    its dup verdict is final; only the ≤2 boundary keys per block go
    through a real (tiny) groupby.  Per-doc totals then need only a
    doc-keyed count over O(dup windows) rows.  No driver state, no
    per-row Python, exact at any scale (``mode="exact"``);
    ``mode="hash"`` ships 1 word instead of L/8 per window (forced by
    ``HEDONIC_RAY_FORCE_SCALE``).
    """
    from ray.data.aggregate import Count
    from hedonic_ray.context import force_scale

    if L % 8 != 0:
        raise ValueError("L must be a multiple of 8")
    if mode == "auto":
        mode = "hash" if force_scale() else "exact"
    if mode not in ("exact", "hash"):
        raise ValueError(f"unknown substring_dup_counts mode {mode!r}")
    names = [f"w{i}" for i in range(L // 8)] if mode == "exact" else ["w0"]

    P = ds.map_batches(lambda t: _text_window_words(t, L, mode, col, key),
                       batch_format="pyarrow")

    def split(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.table({key: pa.array([], pa.int64()),
                          **{c: pa.array([], pa.int64()) for c in names},
                          "edge": pa.array([], pa.bool_())})
        if n == 0:
            return empty
        arr = np.column_stack([t.column(c).to_numpy() for c in names])
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = np.any(arr[1:] != arr[:-1], axis=1)
        gid = np.cumsum(change) - 1
        ngroups = int(gid[-1]) + 1
        sizes = np.bincount(gid, minlength=ngroups)
        is_edge = (gid == 0) | (gid == ngroups - 1)
        keep_int = (~is_edge) & (sizes[gid] >= 2)
        idx = np.flatnonzero(keep_int | is_edge)
        return pa.table({key: t.column(key).take(pa.array(idx)),
                         **{c: t.column(c).take(pa.array(idx))
                            for c in names},
                         "edge": pa.array(is_edge[idx])})

    parts = P.sort(names).map_batches(
        split, batch_format="pyarrow", batch_size=None).materialize()

    interior = parts.filter(expr="edge == False").select_columns([key])

    def edge_group(group: dict) -> dict:
        d = group[key]
        if len(d) >= 2:
            return {key: d.astype(np.int64)}
        return {key: np.array([], np.int64)}

    edge = (parts.filter(expr="edge == True")
            .groupby(names).map_groups(edge_group, batch_format="numpy"))

    return (interior.union(edge)
            .groupby(key)
            .aggregate(Count(alias_name="n_dup_windows"))
            .sort(key))


FINGERPRINT_SCALE_CAP = 1024  # force-scale hot-bucket chain threshold


def fingerprint_overlap_pairs(fp_ds, *, min_shared: int = 2,
                              cap: int | None = None,
                              key: str = "doc_id",
                              fp_col: str = "fingerprint"):
    """MOSS-style document overlap detection (Schleimer et al. 2003,
    the consumer of the winnowing fingerprints): pairs of documents
    sharing at least ``min_shared`` DISTINCT fingerprints, with the
    exact shared count.  ``groupby(fingerprint)`` pair emission →
    the sort-based ``_packed_pair_counts`` exchange → threshold.

    ``cap`` chains hot boilerplate fingerprint buckets (recall-only
    trade: a bucket larger than ``cap`` emits its sorted id chain
    instead of O(bucket²) pairs).  Default exact semantics below
    scale; under ``HEDONIC_RAY_FORCE_SCALE`` the cap auto-engages at
    ``FINGERPRINT_SCALE_CAP`` — mirroring the ``max_df`` posture of
    the n-gram join — so the production path never emits a quadratic
    hot bucket."""
    from hedonic_ray.context import force_scale

    if cap is None and force_scale():
        cap = FINGERPRINT_SCALE_CAP

    def emit(group: dict) -> dict:
        ids = np.sort(group[key].astype(np.int64))
        if len(ids) < 2:
            return {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
        if cap is not None and len(ids) > cap:
            return {"a": ids[:-1], "b": ids[1:]}
        iu = np.triu_indices(len(ids), k=1)
        return {"a": ids[iu[0]], "b": ids[iu[1]]}

    pairs = fp_ds.groupby(fp_col).map_groups(emit, batch_format="numpy")
    counts = _packed_pair_counts(pairs)

    def finish(t: pa.Table) -> pa.Table:
        i = t.column("i").to_numpy().astype(np.int64)
        m = pa.array(i >= min_shared)
        return pa.table({"a": t.column("a").filter(m),
                         "b": t.column("b").filter(m),
                         "shared": pa.array(i[i >= min_shared])})

    return (counts.map_batches(finish, batch_format="pyarrow")
            .sort(["a", "b"]))


def _levenshtein_batch(texts_a, texts_b, prefix: int) -> np.ndarray:
    """Unit-cost Levenshtein distance per pair over the first
    ``prefix`` bytes — row-vectorized DP (numpy minimum over the
    previous row; the only Python loop is over the O(prefix) rows of
    each pair, not cells).  Matches SQL ``levenshtein`` on ASCII."""
    out = np.empty(len(texts_a), np.int64)
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        a = np.frombuffer(ta.encode()[:prefix], np.uint8)
        b = np.frombuffer(tb.encode()[:prefix], np.uint8)
        if not len(a) or not len(b):
            out[i] = max(len(a), len(b))
            continue
        prev = np.arange(len(b) + 1, dtype=np.int64)
        for j, ca in enumerate(a):
            cur = np.empty(len(b) + 1, np.int64)
            cur[0] = j + 1
            sub = prev[:-1] + (b != ca)
            np.minimum(sub, prev[1:] + 1, out=cur[1:])
            # insertion needs the running cur prefix — cumulative trick:
            # cur[k] = min(cur[k], cur[k-1]+1) is a prefix-min of
            # (cur[k] - k), vectorized via minimum.accumulate
            shifted = cur - np.arange(len(b) + 1)
            np.minimum.accumulate(shifted, out=shifted)
            cur = shifted + np.arange(len(b) + 1)
            prev = cur
        out[i] = prev[-1]
    return out


def editdist_verify_pairs(pairs_ds, docs_ds, *, max_dist: int = 60,
                          prefix: int = 200, key: str = "doc_id",
                          col: str = "text"):
    """EDIT-DISTANCE verify for near-dup candidate pairs: exact
    unit-cost Levenshtein over the first ``prefix`` characters, keep
    pairs with distance ≤ ``max_dist``.  Candidates come from any
    recall stage (simhash / minhash); texts are attached through the
    same semi-join gather the exact-Jaccard verify uses (only the
    O(pairs) candidate texts are collected and re-broadcast — the
    corpus never lands on the driver), with the distributed
    pairs⋈docs join as the huge-candidate-set analog already wired in
    :func:`verify_pairs_exact`."""
    import ray

    pairs_ds = pairs_ds.materialize()
    texts_ref = _gather_candidate_texts(pairs_ds, docs_ds)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        tx = ray.get(texts_ref)
        av = batch.column("a").to_pylist()
        bv = batch.column("b").to_pylist()
        d = _levenshtein_batch([tx.get(x, "") for x in av],
                               [tx.get(x, "") for x in bv], prefix)
        m = pa.array(d <= max_dist)
        return pa.table({"a": batch.column("a").filter(m),
                         "b": batch.column("b").filter(m),
                         "dist": pa.array(d[d <= max_dist])})

    return pairs_ds.map_batches(verify, batch_format="pyarrow",
                                batch_size=256).sort(["a", "b"])


def cdc_chunk_stats(ds, *, k: int = 8, d: int = 32, col: str = "text",
                    key: str = "doc_id", dup_broadcast_max: int = 2_000_000):
    """CONTENT-DEFINED CHUNKING dedup (the LBFS / FastCDC shape used
    for storage- and corpus-level dedup): a byte position ends a chunk
    when the polynomial hash of the trailing ``k`` bytes —
    H = Σⱼ byteⱼ·37ʲ, exact int64, no modulus needed at k=8 — lands in
    the 1/``d`` boundary class (H % d == d−1); the document tail
    always closes the last chunk.  A FIXED-WINDOW rule rather than a
    true rolling Rabin fingerprint, deliberately: boundaries are a
    position-independent pure function of the local bytes (the CDC
    property that makes chunks insertion-stable) AND reproducible by
    SQL ``substr`` arithmetic, which a stateful rolling hash is not.

    Per batch, ONE vectorized pass lifts the Arrow offsets/data
    buffers into numpy (the `_text_window_words` idiom), computes
    every window hash with a single sliding-window matmul and
    assembles chunk spans with index arithmetic — the only per-item
    Python is one md5 per CHUNK (≈ text_len/d of them, two orders
    below the window count).  Chunk identity = md5 low64
    (`md5_low64` convention, ≡ DuckDB ``md5_number_lower``).

    Cross-document duplicate chunks (hash in ≥ 2 distinct docs) are
    gathered and broadcast (asserted < ``dup_broadcast_max``; the
    100-TB path swaps this for the distinct-gram semi-join used by
    `decontaminate_counts` — same exchange shape).  Returns one row
    per document: (key, n_chunks, n_dup_chunks, dup_chars).

    Byte windows ≡ SQL character windows on ASCII corpora (the
    oracle's applicability condition, as for `substring_dup_counts`).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    pows = 37 ** np.arange(k, dtype=np.int64)

    def chunk_rows(batch: pa.Table) -> pa.Table:
        import hashlib

        arr = batch.column(col).combine_chunks().cast(pa.large_string())
        docs = batch.column(key).to_numpy()
        offs = np.frombuffer(arr.buffers()[1], np.int64)[
            arr.offset:arr.offset + len(arr) + 1]
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        lens = np.diff(offs)
        counts = np.maximum(lens - k + 1, 0)
        total = int(counts.sum())
        if total and len(data) >= k:
            # k strided adds instead of materializing the (N, k) int64
            # window view (64 bytes per text byte at k=8); int64 adds
            # are modular-commutative, so this is bit-identical to the
            # windowed matmul
            nw = len(data) - k + 1
            data_i = data.astype(np.int64)
            h_all = np.zeros(nw, dtype=np.int64)
            tmp = np.empty(nw, dtype=np.int64)
            for j in range(k):
                np.multiply(data_i[j:nw + j], pows[j], out=tmp)
                h_all += tmp
            shift = np.cumsum(counts) - counts
            starts = (np.repeat(offs[:-1], counts)
                      + (np.arange(total, dtype=np.int64)
                         - np.repeat(shift, counts)))
            hb = h_all[starts] % d == d - 1
            bend = starts[hb] + k
            bdoc = np.repeat(np.arange(len(docs)), counts)[hb]
        else:
            bend = np.empty(0, np.int64)
            bdoc = np.empty(0, np.int64)
        ends = np.concatenate([bend, offs[1:]])
        edoc = np.concatenate([bdoc, np.arange(len(docs), dtype=np.int64)])
        order = np.lexsort((ends, edoc))
        ends, edoc = ends[order], edoc[order]
        keep = np.empty(len(ends), bool)
        keep[0] = True
        keep[1:] = (ends[1:] != ends[:-1]) | (edoc[1:] != edoc[:-1])
        ends, edoc = ends[keep], edoc[keep]
        first = np.empty(len(ends), bool)
        first[0] = True
        first[1:] = edoc[1:] != edoc[:-1]
        starts_c = np.where(first, offs[:-1][edoc],
                            np.concatenate([[np.int64(0)], ends[:-1]]))
        ok = ends > starts_c  # drop empty tails (zero-length docs)
        starts_c, ends, edoc = starts_c[ok], ends[ok], edoc[ok]
        hs = np.fromiter(
            (int.from_bytes(
                hashlib.md5(data[s:e].tobytes()).digest()[8:16], "little")
             for s, e in zip(starts_c, ends)),
            dtype=np.uint64, count=len(ends)).view(np.int64)
        return pa.table({key: pa.array(docs[edoc]),
                         "h": pa.array(hs),
                         "l": pa.array(ends - starts_c)})

    # materialized: both the dup-hash pass and the per-doc pass
    # consume it, and re-running the chunker doubles the md5 work
    occ = ds.map_batches(chunk_rows, batch_format="pyarrow",
                         batch_size=2048).materialize()

    def doc_hash_distinct(t: pa.Table) -> pa.Table:
        return t.select([key, "h"]).group_by([key, "h"]).aggregate([])

    dup_rows = (occ.map_batches(doc_hash_distinct, batch_format="pyarrow")
                .groupby([key, "h"])
                .aggregate(Count(alias_name="_c")).drop_columns(["_c"])
                .groupby("h").aggregate(Count(alias_name="n_docs"))
                .filter(lambda r: r["n_docs"] >= 2)
                .take_all())
    assert len(dup_rows) < dup_broadcast_max, \
        "dup-chunk set exceeds broadcast cap: switch to the semi-join path"
    dup_ref = ray.put(np.sort(np.array([r["h"] for r in dup_rows],
                                       np.int64)))

    def per_doc(t: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        h = t.column("h").to_numpy()
        is_dup = np.zeros(len(h), bool)
        if len(dup):
            i = np.searchsorted(dup, h)
            i[i == len(dup)] = 0
            is_dup = dup[i] == h
        g = pa.table({key: t.column(key),
                      "n_chunks_p": pa.array(np.ones(len(h), np.int64)),
                      "n_dup_p": pa.array(is_dup.astype(np.int64)),
                      "dup_chars_p": pa.array(
                          np.where(is_dup, t.column("l").to_numpy(), 0))})
        return (g.group_by(key).aggregate(
            [("n_chunks_p", "sum"), ("n_dup_p", "sum"),
             ("dup_chars_p", "sum")])
            .rename_columns([key, "n_chunks_p", "n_dup_p", "dup_chars_p"]))

    return (occ.map_batches(per_doc, batch_format="pyarrow")
            .groupby(key)
            .aggregate(Sum("n_chunks_p", alias_name="n_chunks"),
                       Sum("n_dup_p", alias_name="n_dup_chunks"),
                       Sum("dup_chars_p", alias_name="dup_chars")))


def bloom_dedup_audit(docs_ds, *, m: int = 65536, kh: int = 2,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Streaming BLOOM-FILTER exact-dedup pre-filter audit (Bloom,
    CACM '70 — the in-memory membership gate every ingest pipeline
    puts in front of exact dedup; public heuristic, no counterpart in
    the reference repo).

    Semantics (check-then-insert in ``id_col`` order, made
    order-free): a doc's bit positions are the ``kh`` DISTINCT values
    ``md5_low64("bloom{i}-" + text) % m`` (≡ DuckDB
    ``md5_number_lower``); position p counts as "already set" for doc
    d iff the MINIMUM id of any doc hashing to p is < d.  Per doc:
    ``n_pos`` (distinct positions — < kh on self-collision),
    ``n_preset`` (positions already set), ``flagged`` = 1 iff every
    position was set — the docs a streaming Bloom gate would divert
    to the exact-compare path.  Exact duplicates are flagged by
    construction (no false negatives); flagged non-duplicates measure
    the false-positive rate at the corpus' fill factor.

    Shape: one fused hash+explode ``map_batches`` (per-doc md5 is
    inherently per-row; emitted rows are (id, p) int64 only) → a tiny
    ``groupby(p).min(id)`` exchange (≤ m groups, independent of
    corpus size) → the m-slot first-setter array broadcast via
    ``ray.put`` (m·8 bytes) → a per-batch preset-count PARTIAL + one
    ``groupby(id)`` sum (one doc's positions may split across
    re-batched blocks — the fused-explode gotcha, so the count stage
    never assumes completeness).  The lazy ``pos`` stage executes
    twice (setter pass + audit pass) — at scale recomputing two
    cheap hash passes beats materializing O(corpus·kh) rows.  Nothing
    driver-side exceeds the m-slot array; both exchanges carry int64
    pairs only.  Returns a Dataset (doc_id, n_pos, n_preset, flagged).
    """
    import ray
    from ray.data.aggregate import Min, Sum

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        out_id: list[int] = []
        out_p: list[int] = []
        for d, t in zip(ids, texts):
            for p in {md5_low64(f"bloom{i}-{t}") % m for i in range(kh)}:
                out_id.append(int(d))
                out_p.append(p)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "p": pa.array(out_p, pa.int64())})

    pos = docs_ds.map_batches(emit, batch_format="pyarrow")
    setter = pos.groupby("p").aggregate(Min(id_col, alias_name="first_id"))
    arr = np.full(m, np.iinfo(np.int64).max, np.int64)
    for b in setter.iter_batches(batch_size=65536, batch_format="pyarrow"):
        arr[b.column("p").to_numpy()] = b.column("first_id").to_numpy()
    ref = ray.put(arr)

    def preset_partial(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        ids = batch.column(id_col).to_numpy()
        ps = batch.column("p").to_numpy()
        return pa.table({
            id_col: pa.array(ids),
            "n_pos": pa.array(np.ones(len(ids), np.int64)),
            "n_preset": pa.array((s[ps] < ids).astype(np.int64)),
        })

    def finish(batch: pa.Table) -> pa.Table:
        npos = batch.column("n_pos").to_numpy()
        npre = batch.column("n_preset").to_numpy()
        return batch.append_column(
            "flagged", pa.array((npre == npos).astype(np.int64)))

    return (pos.map_batches(preset_partial, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(Sum("n_pos", alias_name="n_pos"),
                       Sum("n_preset", alias_name="n_preset"))
            .map_batches(finish, batch_format="pyarrow"))


def semantic_dedup(emb_ds, n: int, *, n_clusters: int = 4,
                   iters: int = 3, scale: int = 100_000,
                   threshold_e6: int = 400_000, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> pa.Table:
    """SEMANTIC DEDUP — the SemDeDup curation shape (Abbas et al.
    2023, arXiv:2303.09540): k-means the embedding space, then search
    for near-duplicates ONLY within each cluster, keeping the lowest
    id per duplicate group.  The cluster scoping is the whole point
    at scale: the candidate-pair space drops from O(n²) to
    Σ|cluster|², and the pair stage parallelizes per cluster with no
    global broadcast.

    Determinism contract (all oracle-replicable): centroids from the
    exact-integer Lloyd of :func:`~hedonic_ray.ops.similarity.
    kmeans_iterations` (floor-quantized grid, sign-split means);
    assignment by the −2⟨q,c⟩+|c|² integer objective, ties → lowest
    cluster; pair membership on the rounded ×1e6 float cosine (the
    sim_* convention); group label = min vec_id via
    :func:`duplicate_clusters` (driver union-find below the cap, the
    engine's distributed CC under force_scale).

    Returns (vec_id, cluster, grp, keep) sorted by vec_id."""
    import ray
    from ray.data.aggregate import Count

    from hedonic_ray.ops.similarity import (_batch_matrix, _normalize,
                                            kmeans_iterations)

    grid = kmeans_iterations(emb_ds, n_clusters=n_clusters, iters=iters,
                             scale=scale, id_col=id_col, vec_col=vec_col)
    dim = grid.num_rows // n_clusters
    cent = np.zeros((n_clusters, dim), np.int64)
    cent[grid.column("cluster").to_numpy(),
         grid.column("dim").to_numpy() - 1] = \
        grid.column("centroid_q").to_numpy()
    c2 = np.einsum("ij,ij->i", cent, cent)
    cref = ray.put((cent, c2))

    def assign(batch: pa.Table) -> pa.Table:
        c, csq = ray.get(cref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             vec_col: batch.column(vec_col)})
        m = _batch_matrix(batch, vec_col, dtype=np.float64)
        qm = np.floor(m * scale).astype(np.int64)
        obj = -2 * (qm @ c.T) + csq
        a = np.argmin(obj, axis=1).astype(np.int64)
        return pa.table({id_col: batch.column(id_col).cast(pa.int64()),
                         "cluster": pa.array(a),
                         vec_col: batch.column(vec_col)})

    asg = emb_ds.map_batches(assign,
                             batch_format="pyarrow").materialize()

    def group_pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy().astype(np.int64)
        m = _normalize(_batch_matrix(g, vec_col, np.float64))
        se6 = np.rint((m @ m.T) * 1e6).astype(np.int64)
        ii, jj = np.nonzero(np.triu(se6 >= threshold_e6, k=1))
        a, b = ids[ii], ids[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({"a": pa.array(a2, pa.int64()),
                         "b": pa.array(b2, pa.int64())})

    pairs = asg.groupby("cluster").map_groups(group_pairs,
                                              batch_format="pyarrow")
    comp = duplicate_clusters(pairs, n).astype(np.int64)

    cluster = np.zeros(n, np.int64)
    for b in asg.select_columns([id_col, "cluster"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        cluster[b.column(id_col).to_numpy()] = \
            b.column("cluster").to_numpy()
    vid = np.arange(n, dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(vid),
        "cluster": pa.array(cluster),
        "grp": pa.array(comp),
        "keep": pa.array((comp == vid).astype(np.int64))})
