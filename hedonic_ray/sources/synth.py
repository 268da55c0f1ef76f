"""Deterministic synthetic sources.

Two page generators (both pure functions of their seeds — byte-identical
output across runs/processes):

* :func:`generate_pages` — Common-Crawl-style ``pages`` table whose
  hyperlink structure is a planted SBM in url-space: k equal site
  blocks, intra-block probability ``p_in``, inter-block
  ``p_in * multiplier`` — the same block/probability semantics as the
  reference's SBM generator (``/root/reference/scripts/utils.py:162-177``),
  plus an optional Zipf hub overlay to exercise skew handling.

* :func:`pages_from_documents` — renders the driver-provided
  ``documents`` table into pages with an arithmetic planted link
  formula, so the whole extract→graph pipeline can run on
  ``/root/testdata`` and be SQL-oracle-checked (the oracle recomputes
  the formula, see ``__ray_entry__.oracle_sql``).

Membership fixtures (:func:`ground_truth_membership`,
:func:`noisy_membership`) mirror the reference's noise model
(``scripts/utils.py:179-227``): noise ≤ 1 permutes the labels of a
``noise`` fraction of nodes among themselves; noise > 1 yields the
singleton partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.context import actor_pool
from hedonic_ray.functions.extract import escape_html

GENERATOR_VERSION = 2  # bump when rendering/link-planting changes
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
LANGS = ["en", "de", "pt"]
_WORDS = (
    "graph link node edge rank walk page site crawl web block cluster "
    "community payoff coalition resolution alpha gather scatter shuffle "
    "partition vertex degree hub spoke path cycle triangle wedge label"
).split()

# planted-link formula constants for pages_from_documents (mirrored in SQL oracles)
LINK_A = 2654435761
LINK_B = 40503


# ---------------------------------------------------------------- SBM edges


def sbm_edges(n_blocks: int, block_size: int, p_in: float, multiplier: float,
              seed: int = 42) -> np.ndarray:
    """Undirected unique edges (u < v) of a planted-partition SBM.

    Exact per-pair Bernoulli for small n (reference semantics); for
    n > 4096 the per-block-pair edge count is drawn binomially and that
    many distinct pairs are sampled — identical marginal distribution,
    O(E) instead of O(n^2).  Deterministic in ``seed``.
    """
    n = n_blocks * block_size
    rng = np.random.default_rng(seed)
    p_out = p_in * multiplier
    out: list[np.ndarray] = []
    if n <= 4096:
        iu = np.triu_indices(n, k=1)
        u, v = iu
        p = np.where((u // block_size) == (v // block_size), p_in, p_out)
        mask = rng.random(u.shape[0]) < p
        return np.stack([u[mask], v[mask]], axis=1).astype(np.int64)
    for bi in range(n_blocks):
        for bj in range(bi, n_blocks):
            p = p_in if bi == bj else p_out
            if p <= 0:
                continue
            if bi == bj:
                npairs = block_size * (block_size - 1) // 2
            else:
                npairs = block_size * block_size
            cnt = rng.binomial(npairs, p)
            if cnt == 0:
                continue
            # sample distinct pair indices WITHOUT materializing
            # arange(npairs) (rng.choice(replace=False) permutes the full
            # range — seconds + GBs at web scale): oversample with
            # replacement, dedup, trim — deterministic in the seed
            idx = np.empty(0, dtype=np.int64)
            need = cnt
            while need > 0:
                cand = rng.integers(0, npairs, size=int(need * 1.05) + 8)
                idx = np.unique(np.concatenate([idx, cand]))
                need = cnt - len(idx)
            idx = idx[:cnt]
            if bi == bj:
                # decode upper-triangular index within the block
                i = (block_size - 2 - np.floor(
                    np.sqrt(-8 * idx + 4 * block_size * (block_size - 1) - 7) / 2 - 0.5
                )).astype(np.int64)
                j = (idx + i + 1 - block_size * (block_size - 1) // 2
                     + (block_size - i) * ((block_size - i) - 1) // 2).astype(np.int64)
            else:
                i, j = idx // block_size, idx % block_size
            u = i + bi * block_size
            v = j + bj * block_size
            out.append(np.stack([u, v], axis=1))
    if not out:
        return np.empty((0, 2), dtype=np.int64)
    e = np.concatenate(out).astype(np.int64)
    lo, hi = np.minimum(e[:, 0], e[:, 1]), np.maximum(e[:, 0], e[:, 1])
    key = lo * np.int64(n) + hi
    _, first = np.unique(key, return_index=True)
    return np.stack([lo[first], hi[first]], axis=1)


def zipf_hub_edges(n: int, n_extra: int, seed: int = 43, a: float = 1.5) -> np.ndarray:
    """Directed hub overlay: ``n_extra`` links whose targets follow a
    Zipf law over vertex ids — plants power-law in-degree hubs so skew
    handling (hot gather keys) is actually exercised at bench scale."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=n_extra)
    ranks = rng.zipf(a, size=n_extra)
    dst = (ranks - 1) % n
    keep = src != dst
    return np.stack([src[keep], dst[keep]], axis=1).astype(np.int64)


# ---------------------------------------------------------------- memberships


def ground_truth_membership(n_blocks: int, block_size: int) -> np.ndarray:
    """Block labels ``[0]*s + [1]*s + ...`` (scripts/utils.py:179-184)."""
    return np.repeat(np.arange(n_blocks, dtype=np.int64), block_size)


def noisy_membership(ground_truth: np.ndarray, noise: float, seed: int = 0) -> np.ndarray:
    """Reference noise model (scripts/utils.py:186-227): permute the
    labels of a ``noise`` fraction of positions among themselves;
    ``noise > 1`` → singleton partition (coalition := vertex)."""
    gt = np.asarray(ground_truth, dtype=np.int64)
    n = gt.shape[0]
    if noise > 1:
        return np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(seed)
    out = gt.copy()
    k = int(noise * n)
    if k > 0:
        idx = rng.choice(n, size=k, replace=False)
        perm = rng.permutation(k)
        out[idx] = out[idx][perm]
    return out


# ---------------------------------------------------------------- rendering


def _render_row(url: str, title: str, body: str, hrefs: list[str],
                anchor_texts: list[str]) -> tuple[bytes, str]:
    anchors = " ".join(
        f'<a href="{u}">{escape_html(t)}</a>' for u, t in zip(hrefs, anchor_texts)
    )
    html = (
        f"<html><head><title>{escape_html(title)}</title></head><body> "
        f'<p id="body">{escape_html(body)}</p> {anchors} </body></html>'
    ).encode("utf-8")
    text = " ".join(p for p in [title, body, *anchor_texts] if p)
    return html, text


def _body_words(i: int) -> str:
    k = 10 + i % 5
    return " ".join(_WORDS[(i * 7 + t) % len(_WORDS)] for t in range(k))


def page_url(i: int, block: int) -> str:
    return f"https://site{block:04d}.example/page/{i:06d}"


def _pages_table(idx: np.ndarray, n_blocks: int, block_size: int,
                 indptr: np.ndarray, indices: np.ndarray) -> pa.Table:
    """Render one batch of pages given the full adjacency (CSR over all
    n vertices; ``indices`` holds out-link targets)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in idx.tolist():
        b = i // block_size
        targets = indices[indptr[i]:indptr[i + 1]].tolist()
        hrefs, atexts = [], []
        for v in targets:
            h = page_url(v, v // block_size)
            a = f"to {v:06d}"
            hrefs.append(h)
            atexts.append(a)
            if (i + v) % 7 == 0:  # duplicate anchor — exercises edge dedup
                hrefs.append(h)
                atexts.append(a)
        if i % 13 == 0:  # self link — exercises self-loop drop
            hrefs.append(page_url(i, b))
            atexts.append(f"to {i:06d}")
        html, text = _render_row(
            page_url(i, b), f"Page {i:06d}", _body_words(i), hrefs, atexts
        )
        urls.append(page_url(i, b))
        tss.append(EPOCH_US + i * 1_000_000)
        htmls.append(html)
        texts.append(text)
        langs.append(LANGS[i % len(LANGS)])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def _out_csr(n: int, und_edges: np.ndarray, hub_edges: np.ndarray | None) -> tuple[np.ndarray, np.ndarray]:
    """Directed out-adjacency: each planted undirected edge yields links
    both ways; hub overlay edges are one-way."""
    if und_edges.size:
        src = np.concatenate([und_edges[:, 0], und_edges[:, 1]])
        dst = np.concatenate([und_edges[:, 1], und_edges[:, 0]])
    else:
        src = np.empty(0, np.int64)
        dst = np.empty(0, np.int64)
    if hub_edges is not None and hub_edges.size:
        src = np.concatenate([src, hub_edges[:, 0]])
        dst = np.concatenate([dst, hub_edges[:, 1]])
    # group by src only (stable) — within-page target order is then a
    # deterministic function of the edge construction order, which is
    # all the renderer needs; a full (src, dst) lexsort is a serial
    # driver cost that grows with E
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, dst


def _render_pages_batch(batch: dict, indptr_ref, indices_ref,
                        n_blocks: int, block_size: int) -> pa.Table:
    """Stateless render task: adjacency arrays come via ``ray.put`` refs
    (zero-copy object-store reads per task)."""
    import ray

    indptr = ray.get(indptr_ref)
    indices = ray.get(indices_ref)
    return _pages_table(batch["id"].astype(np.int64), n_blocks,
                        block_size, indptr, indices)


def generate_pages(n_blocks: int, block_size: int, p_in: float, multiplier: float,
                   seed: int = 42, hub_links: int = 0, *, distributed: bool | None = None):
    """Planted-SBM pages table.

    Returns a ``ray.data.Dataset`` with schema
    ``(url, warc_ts, html, text, lang)``.  The planted undirected edge
    list is available via :func:`sbm_edges` with the same arguments
    (golden fixture for extraction tests).
    """
    import ray
    import ray.data as rd

    n = n_blocks * block_size
    und = sbm_edges(n_blocks, block_size, p_in, multiplier, seed)
    hubs = zipf_hub_edges(n, hub_links, seed + 1) if hub_links else None
    indptr, indices = _out_csr(n, und, hubs)
    if distributed is None:
        distributed = n > 20_000
    if not distributed:
        return rd.from_arrow(_pages_table(np.arange(n), n_blocks, block_size, indptr, indices))
    ip_ref, ix_ref = ray.put(indptr), ray.put(indices)
    return rd.range(n).map_batches(
        lambda b: _render_pages_batch(b, ip_ref, ix_ref, n_blocks, block_size),
        batch_format="numpy",
        batch_size=2048,  # smaller tasks → better balance under hub skew
    )


# ------------------------------------------------- pages from documents table


def planted_doc_links(doc_id: np.ndarray, n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Arithmetic planted out-links for document ``i``:
    ``target_j = (i*LINK_A + j*LINK_B) % n`` for ``j in 0..(i % 4)``.
    Exactly reproducible in ANSI SQL (see oracle)."""
    i = np.asarray(doc_id, dtype=np.int64)
    ks = 1 + (i % 4)
    src = np.repeat(i, ks)
    j = np.concatenate([np.arange(k) for k in ks]) if len(i) else np.empty(0, np.int64)
    dst = (src * LINK_A + j * LINK_B) % n_docs
    return src, dst


def doc_url(doc_id: int) -> str:
    return f"https://docs.example/{doc_id:08d}"


class _RenderDocPages:
    """pages rows rendered from ``documents`` rows (deterministic)."""

    def __init__(self, n_docs: int):
        self.n_docs = n_docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        bodies = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        urls, tss, htmls, texts = [], [], [], []
        for i, body, _lang in zip(ids.tolist(), bodies, langs):
            src, dst = planted_doc_links(np.array([i]), self.n_docs)
            hrefs = [doc_url(v) for v in dst.tolist()]
            atexts = [f"to {v:08d}" for v in dst.tolist()]
            html, text = _render_row(doc_url(i), f"Doc {i}", body, hrefs, atexts)
            urls.append(doc_url(i))
            tss.append(EPOCH_US + i * 1_000_000)
            htmls.append(html)
            texts.append(text)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": batch.column("lang"),
            "doc_id": batch.column("doc_id"),
        })


def pages_from_documents(sf_dir: str):
    """Render ``{sf_dir}/documents.parquet`` into a deterministic pages
    table (keeps ``doc_id`` as a sidecar column so oracles can join)."""
    import ray.data as rd
    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    n_docs = pq.read_metadata(path).num_rows
    ds = rd.read_parquet(path, columns=["doc_id", "text", "lang"])
    render = _RenderDocPages(n_docs)
    return ds.map_batches(render, batch_format="pyarrow", batch_size=2048)
