"""Graph construction: pages → edges → hash-partitioned Arrow CSR blocks.

Pipeline shape (ONE all-to-all exchange end-to-end)::

    read_parquet(pages, columns=[url, html])     # prune at the read
      .map_batches(LinkExtract)                  # html → (src_url, dst_url); html dies here
      .map_batches(IdLookup)                     # url → dense uint64 vertex id (broadcast map)
      .map_batches(normalize)                    # self-loop drop, orient, per-batch pre-dedup
      task butterfly exchange                    # THE shuffle: route keys by src range
                                                 #   (object-store partials), exact dedup
                                                 #   + CSR assembly per partition
      .materialize()                             # CSR blocks pinned in the object store

Replaces the reference's whole-graph igraph object
(``/root/reference/hedonic/__init__.py:9-24``) and its SNAP edge-list
reader (``scripts/utils.py:88-103``).  Exact edge dedup happens inside
the CSR build because duplicate ``(src, dst)`` rows always hash to the
same ``part`` — no second shuffle needed.

Scale notes: vertex-id assignment broadcasts the sorted url vocabulary
(vertex tables scale with V, not with the 100 TB page payload); at the
10^12-document extreme the same pipeline swaps ``IdLookup`` for a
hash-partitioned ``Dataset.join`` on ``url`` and the CSR ``part`` count
grows so each Arrow block stays ≲256 MiB (see
``context.default_num_partitions``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from hedonic_ray.context import configure_context, default_num_partitions
from hedonic_ray.functions.extract import LinkExtract


# ---------------------------------------------------------------- url → id


def collect_sorted_urls(pages_ds) -> np.ndarray:
    """Sorted unique url vocabulary (the vertex set = the page set).

    Streams only the ``url`` column to the driver; V strings (the small
    side of every later lookup — broadcast once via ``ray.put``).
    """
    chunks = []
    for batch in pages_ds.select_columns(["url"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        chunks.append(batch.column("url").to_numpy(zero_copy_only=False))
    if not chunks:
        return np.empty(0, dtype="<U1")
    # fixed-width string array → vectorized C-level searchsorted lookups
    return np.unique(np.concatenate(chunks).astype(str))


def _id_lookup_batch(batch: pa.Table, urls_ref,
                     cols=("src_url", "dst_url"),
                     out=("src", "dst")) -> pa.Table:
    """Map url columns to dense vertex ids against the broadcast sorted
    vocabulary (zero-copy ``ray.get`` per task + vectorized
    ``np.searchsorted`` over a fixed-width string array — no per-actor
    dict build, so this runs as cheap stateless tasks).  Link targets
    not in the vocabulary (out-of-crawl urls) are dropped."""
    import ray

    vocab = ray.get(urls_ref)
    # vocab is a fixed-width numpy string array; casting a LONGER url to
    # that dtype silently truncates and could equality-match a prefix
    # vocabulary entry (spurious edge) — reject over-width values first
    width = vocab.dtype.itemsize // 4 if len(vocab) else 0
    arrays = []
    mask = None
    for c in cols:
        raw = batch.column(c).to_numpy(zero_copy_only=False).astype(str)
        fits = np.char.str_len(raw) <= width
        vals = raw.astype(vocab.dtype) if len(vocab) else raw
        pos = np.searchsorted(vocab, vals) if len(vocab) else np.zeros(len(vals), np.int64)
        pos = np.clip(pos, 0, max(0, len(vocab) - 1))
        ok = (fits & (vocab[pos] == vals)) if len(vocab) else np.zeros(len(vals), bool)
        mask = ok if mask is None else (mask & ok)
        arrays.append(pos.astype(np.int64))
    return pa.table({name: pa.array(a[mask], pa.int64())
                     for name, a in zip(out, arrays)})


def assign_vertex_ids(pages_ds):
    """Return (urls_ref, n): broadcastable sorted url vocabulary.

    Vertex id of a url = its rank in the sorted vocabulary —
    deterministic, dense 0..n-1 (analog of the reference's contiguous
    igraph vertex ids)."""
    import ray

    urls = collect_sorted_urls(pages_ds)
    return ray.put(urls), len(urls)


def url_id_map(pages_ds, num_partitions: int = 8):
    """Distributed url→dense-id map as a Dataset (url, vid) — the
    beyond-driver-memory alternative to the broadcast vocabulary.

    Dense ranks without driver materialization: distributed sort on
    ``url``, then per-sorted-block DENSE-rank assignment with
    driver-side offsets computed from per-block (distinct count, first
    url, last url) summaries only (3·P values).  Duplicate urls —
    including runs spanning block boundaries — collapse to one vid, so
    a pages table with repeated urls (re-crawls) cannot multiply edges.
    """
    import ray
    import ray.data as rd

    mat = pages_ds.select_columns(["url"]).sort("url").materialize()
    refs = [r for r in mat.to_arrow_refs()]

    @ray.remote
    def block_summary(t):
        if t.num_rows == 0 or "url" not in t.column_names:
            return 0, None, None
        u = t.column("url").to_numpy(zero_copy_only=False)
        distinct = 1 + int((u[1:] != u[:-1]).sum())
        return distinct, str(u[0]), str(u[-1])

    summaries = ray.get([block_summary.remote(r) for r in refs])
    # dense-rank offset per block: cumulative distinct counts, minus one
    # whenever a block's first url continues the previous block's run
    offsets, off, prev_last = [], 0, None
    for distinct, first, last in summaries:
        boundary_dup = first is not None and first == prev_last
        offsets.append(off - (1 if boundary_dup else 0))
        off = offsets[-1] + distinct
        if last is not None:
            prev_last = last
    n_total = off

    @ray.remote
    def assign(t, off: int, emit_first: bool) -> pa.Table:
        if t.num_rows == 0 or "url" not in t.column_names:
            return pa.table({"url": pa.array([], pa.string()),
                             "vid": pa.array([], pa.int64())})
        u = t.column("url").to_numpy(zero_copy_only=False)
        is_new = np.concatenate([[True], u[1:] != u[:-1]])
        ranks = off + np.cumsum(is_new) - 1
        # one output row per distinct url; the block-boundary duplicate
        # (first url == previous block's last) is emitted upstream
        keep = is_new.copy()
        if not emit_first:
            keep[0] = False
        return pa.table({"url": pa.array(u[keep].astype(object), pa.string()),
                         "vid": pa.array(ranks[keep], pa.int64())})

    out = []
    prev_last = None
    for r, (distinct, first, last), o in zip(refs, summaries, offsets):
        emit_first = not (first is not None and first == prev_last)
        out.append(assign.remote(r, int(o), emit_first))
        if last is not None:
            prev_last = last
    return rd.from_arrow_refs(out), int(n_total)


def edges_from_pages_join(pages_ds, *, num_partitions: int = 8):
    """pages → integer edge table via hash-partitioned ``Dataset.join``
    on url (both endpoints) — the scale path when the url vocabulary
    exceeds driver memory.  Semantically identical to the broadcast
    ``edges_from_pages`` (tested equal); inner joins drop out-of-crawl
    targets exactly like the broadcast lookup."""
    from hedonic_ray.context import drop_empty_blocks

    configure_context()
    urlmap, n = url_id_map(pages_ds, num_partitions)
    ds = pages_ds.select_columns(["url", "html"])
    extractor = LinkExtract()
    links = ds.map_batches(extractor, batch_format="pyarrow", batch_size=1024)
    # schema-less empty blocks break the hash-shuffle join — drop them
    links = drop_empty_blocks(
        links, pa.schema([("src_url", pa.string()), ("dst_url", pa.string())]))
    j1 = links.join(urlmap, "inner", num_partitions,
                    on=("src_url",), right_on=("url",))
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            ["src" if c == "vid" else c for c in t.column_names]),
        batch_format="pyarrow")
    j1 = drop_empty_blocks(
        j1, pa.schema([("dst_url", pa.string()), ("src", pa.int64())]))
    j2 = j1.join(urlmap, "inner", num_partitions,
                 on=("dst_url",), right_on=("url",),
                 left_suffix="_l", right_suffix="_r")
    out = j2.map_batches(
        lambda t: pa.table({
            "src": t.column("src"),
            "dst": t.column("vid") if "vid" in t.column_names
            else t.column("vid_r"),
        }),
        batch_format="pyarrow")
    return out, n


# ---------------------------------------------------------------- edge tables


def edges_from_pages(pages_ds, urls_ref) -> "ray.data.Dataset":
    """pages → directed integer edge table (src, dst); html consumed and
    dropped inside the extract stage."""
    configure_context()
    ds = pages_ds.select_columns(["url", "html"])
    extractor = LinkExtract()  # compiled once, shipped in the task closure
    links = ds.map_batches(extractor, batch_format="pyarrow", batch_size=1024)
    return links.map_batches(lambda b: _id_lookup_batch(b, urls_ref),
                             batch_format="pyarrow")


def _normalize_batch(batch: pa.Table, *, n: int, directed: bool,
                     symmetrize: bool, num_parts: int, span: int) -> pa.Table:
    src = batch.column("src").to_numpy().astype(np.int64)
    dst = batch.column("dst").to_numpy().astype(np.int64)
    keep = src != dst  # simple graphs: self-loops dropped (scripts/utils.py:102)
    src, dst = src[keep], dst[keep]
    if not directed:
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        if symmetrize:  # adjacency form: both arcs
            src = np.concatenate([lo, hi])
            dst = np.concatenate([hi, lo])
        else:  # canonical (min,max) form
            src, dst = lo, hi
    # per-batch pre-dedup (partial combine; exact dedup happens per part)
    key = src * np.int64(n) + dst
    uk = np.unique(key)
    src, dst = uk // n, uk % n
    return pa.table({"src": src, "dst": dst, "part": src // span})


def canonicalize_edges(edges_ds, n: int, *, directed: bool = True):
    """Standalone canonical edge table: self-loops dropped, exact dedup;
    undirected mode normalizes to (min, max).  Uses per-batch partial
    dedup then one groupby — the aggregation-at-scale pattern."""
    from ray.data.aggregate import Min

    span = max(1, -(-n // default_num_partitions()))
    ds = edges_ds.map_batches(
        lambda b: _normalize_batch(b, n=n, directed=directed, symmetrize=False,
                                   num_parts=0, span=span),
        batch_format="pyarrow")

    def _dedup(group: dict) -> dict:
        key = group["src"].astype(np.int64) * n + group["dst"].astype(np.int64)
        uk = np.unique(key)
        return {"src": uk // n, "dst": uk % n}

    return ds.groupby("part").map_groups(_dedup, batch_format="numpy")


def degree_table(edges_ds, *, col: str = "src"):
    """Degree per vertex from an edge table (groupby shuffle — partial
    per-block counts combine for free in Ray's hash aggregate)."""
    from ray.data.aggregate import Count

    return edges_ds.groupby(col).aggregate(Count(alias_name="degree"))


# ---------------------------------------------------------------- CSR blocks


@dataclass
class LinkGraph:
    """Hash-partitioned CSR adjacency in Arrow (the north-star layout).

    ``blocks`` is a materialized Dataset with one row per partition:
    ``part:int64, lo:int64, hi:int64, indptr:list<int64>, indices:list<int64>``
    where ``indptr`` spans local vertices ``lo..hi`` and ``indices``
    holds neighbor ids sorted per vertex.  Blocks live in the object
    store and are re-scanned (zero-copy) by every superstep's scatter.

    ``directed=False`` means ``indices`` is the symmetrized adjacency
    (each undirected edge appears as both arcs); ``m`` then counts arcs
    (2×undirected edges).
    """

    n: int
    m: int
    num_parts: int
    span: int
    directed: bool
    blocks: object  # MaterializedDataset
    out_degree: np.ndarray = field(repr=False)
    urls_ref: object | None = None

    _arrow_refs: list | None = None
    # (n_shards, span, actors) — lazily/pre-spawned sharded-apply base
    # (engine/shards.shard_base); cached so LP + hedonic on the same
    # graph reuse one actor set
    _shard_base: tuple | None = None
    # driver-resident block tables for the tiny-graph local superstep
    # loop (engine/superstep LOCAL_MAX_ARCS)
    _local_blocks: list | None = None

    def arrow_refs(self) -> list:
        """Object refs of the materialized CSR Arrow blocks (cached) —
        the task-based superstep exchange maps over these directly."""
        if self._arrow_refs is None:
            self._arrow_refs = self.blocks.to_arrow_refs()
        return self._arrow_refs

    @property
    def undirected_edge_count(self) -> int:
        return self.m if self.directed else self.m // 2

    def density(self) -> float:
        """Edge density of the simple undirected graph — the default
        hedonic resolution (hedonic/__init__.py:78)."""
        n = self.n
        return 0.0 if n < 2 else self.undirected_edge_count / (n * (n - 1) / 2)


def _list_column(values: np.ndarray) -> pa.ListArray:
    """One-row Arrow list column wrapping a numpy array (zero-copy)."""
    return pa.ListArray.from_arrays(
        pa.array([0, len(values)], pa.int32()), pa.array(values, pa.int64())
    )


def _split_edge_keys(table: pa.Table, n: int, span: int, num_parts: int):
    """Task: normalized edge batch → per-destination-partition key
    arrays (key = src*n + dst; routing key is SRC's partition)."""
    if table.num_rows == 0 or "src" not in table.column_names:
        # Ray Data may emit schema-less empty blocks
        out = tuple(np.empty(0, np.int64) for _ in range(num_parts))
        return out if num_parts > 1 else out[0]
    src = table.column("src").to_numpy().astype(np.int64)
    dst = table.column("dst").to_numpy().astype(np.int64)
    key = src * np.int64(n) + dst
    part = src // span
    order = np.argsort(part, kind="stable")
    k, p = key[order], part[order]
    bounds = np.searchsorted(p, np.arange(num_parts + 1))
    out = tuple(k[bounds[i]:bounds[i + 1]].copy() for i in range(num_parts))
    return out if num_parts > 1 else out[0]


def _assemble_csr_part(part: int, lo: int, hi: int, n: int, *key_arrays) -> pa.Table:
    """Task: merge a partition's key partials → exact dedup → CSR row."""
    keys = [k for k in key_arrays if len(k)]
    if keys:
        uk = np.unique(np.concatenate(keys))
        src, dst = uk // n, uk % n
    else:
        src = dst = np.empty(0, np.int64)
    indptr = np.zeros(hi - lo + 1, dtype=np.int64)
    np.add.at(indptr, src - lo + 1, 1)
    np.cumsum(indptr, out=indptr)
    return pa.table({
        "part": pa.array([part], pa.int64()),
        "lo": pa.array([lo], pa.int64()),
        "hi": pa.array([hi], pa.int64()),
        "indptr": _list_column(indptr),
        "indices": _list_column(dst),
    })


def build_link_graph(edges_ds, n: int, *, directed: bool, num_parts: int | None = None,
                     urls_ref=None) -> LinkGraph:
    """Edge table → LinkGraph (CSR blocks materialized in the object
    store).  Exact dedup and self-loop drop included; ``edges_ds`` may
    contain duplicates and self-loops.

    The one all-to-all exchange (route per-batch pre-deduped edge keys
    to their source partition, then assemble each partition's CSR row)
    runs as an explicit task butterfly through the object store — the
    same data movement a ``groupby(part)`` shuffle performs, without
    the sort-shuffle fixed costs (the keys arrive pre-partitioned and
    ``np.unique`` per partition is the whole aggregation).
    """
    import ray
    import ray.data as rd

    configure_context()
    if num_parts is None:
        num_parts = default_num_partitions(n_vertices=n)
    num_parts = max(1, min(num_parts, n))
    span = -(-n // num_parts)

    norm = edges_ds.map_batches(
        lambda b: _normalize_batch(b, n=n, directed=directed, symmetrize=True,
                                   num_parts=num_parts, span=span),
        batch_format="pyarrow").materialize()
    split = ray.remote(_split_edge_keys)
    assemble = ray.remote(_assemble_csr_part)
    per_batch = [
        split.options(num_returns=num_parts if num_parts > 1 else 1).remote(
            bref, n, span, num_parts)
        for bref in norm.to_arrow_refs()
    ]
    per_part = ([tuple(per_batch)] if num_parts == 1
                else list(zip(*per_batch)))
    row_refs = [
        assemble.remote(p, p * span, min(n, (p + 1) * span), n, *per_part[p])
        for p in range(num_parts)
    ]
    # one Ray block per CSR row — scatter parallelism = num_parts
    blocks = rd.from_arrow_refs(row_refs).materialize()

    # degree vector: one streaming pass over the P block rows
    out_degree = np.zeros(n, dtype=np.int64)
    m = 0
    for batch in blocks.iter_batches(batch_size=4, batch_format="pyarrow"):
        for r in range(batch.num_rows):
            lo = batch.column("lo")[r].as_py()
            hi = batch.column("hi")[r].as_py()
            indptr = np.asarray(batch.column("indptr")[r].values)
            out_degree[lo:hi] = np.diff(indptr)
            m += int(indptr[-1])
    g = LinkGraph(n=n, m=m, num_parts=num_parts, span=span, directed=directed,
                  blocks=blocks, out_degree=out_degree, urls_ref=urls_ref)
    if not directed and m >= 400_000:
        # pre-spawn the sharded-apply actor base in the BACKGROUND
        # (constructors load CSR slices while subsequent pipeline
        # stages run) — big undirected graphs are exactly the ones the
        # superstep algorithms take the shards backend for, and the
        # spawn + adjacency build was ~70% of the first algorithm's
        # wall time when paid lazily (ROADMAP 6)
        from hedonic_ray.engine.shards import shard_base

        shard_base(g)
    return g


BROADCAST_VOCAB_MAX = 50_000_000  # urls; ~a few GB of fixed-width strings


def graph_from_pages(pages_ds, *, directed: bool, num_parts: int | None = None,
                     id_assign: str = "auto") -> LinkGraph:
    """End-to-end: pages table → LinkGraph.

    ``id_assign``: ``"broadcast"`` ranks the url vocabulary on the
    driver and broadcasts it (fast while V·width fits memory);
    ``"join"`` uses the distributed sort + ``Dataset.join`` path (no
    V-sized driver state).  ``"auto"`` switches on the page count —
    both paths are tested edge-identical."""
    if id_assign == "auto":
        from hedonic_ray.context import force_scale

        id_assign = ("join" if force_scale()
                     else "broadcast"
                     if pages_ds.count() <= BROADCAST_VOCAB_MAX else "join")
    if id_assign == "join":
        edges, n = edges_from_pages_join(pages_ds)
        return build_link_graph(edges, n, directed=directed,
                                num_parts=num_parts)
    urls_ref, n = assign_vertex_ids(pages_ds)
    edges = edges_from_pages(pages_ds, urls_ref)
    return build_link_graph(edges, n, directed=directed, num_parts=num_parts,
                            urls_ref=urls_ref)


def edges_from_numpy(arr: np.ndarray):
    """Test/fixture helper: (m,2) int array → edge Dataset."""
    import ray.data as rd

    arr = np.asarray(arr, dtype=np.int64).reshape(-1, 2)
    return rd.from_arrow(pa.table({"src": arr[:, 0], "dst": arr[:, 1]}))
