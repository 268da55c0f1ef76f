"""HTML → links / text extraction kernels.

The reference repo has no HTML code (its inputs are SNAP edge lists,
``/root/reference/scripts/utils.py:88-103``); the web-page payload is
defined by this engine per ``BASELINE.json``'s input hint.  The
extractor here is the frozen contract: the fixture generator
(:mod:`hedonic_ray.sources.synth`) composes ``html`` and the expected
``text`` column independently, and tests assert the extraction is
**byte-identical per url** (the per-row invariant in BASELINE.md).

All kernels are pure and per-row; the batch stages that apply them
(`LinkExtract`, `TextExtract`) are actor-pool classes compiling the
regexes once per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# minimal, fixed entity set — escape/unescape are exact inverses for
# any input text (ampersand first on escape, last on unescape)
_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]

HREF_RE = re.compile(rb'<a\s+href="([^"]*)"\s*>')
ANCHOR_RE = re.compile(rb'<a\s+href="([^"]*)"\s*>([^<]*)</a>')
TAG_RE = re.compile(r"<[^>]+>")
BODY_RE = re.compile(rb'<p id="body">(.*?)</p>', re.S)
WS_RE = re.compile(r"\s+")


def escape_html(text: str) -> str:
    for raw, ent in _ESC:
        text = text.replace(raw, ent)
    return text


def unescape_html(text: str) -> str:
    for raw, ent in reversed(_ESC):
        text = text.replace(ent, raw)
    return text


def extract_links(html: bytes) -> list[str]:
    """All anchor targets, in document order, duplicates preserved
    (dedup is a separate pipeline stage — see canonicalize_edges)."""
    return [m.decode("utf-8") for m in HREF_RE.findall(html)]


def extract_text(html: bytes) -> str:
    """Full-page visible text: strip tags, unescape entities, collapse
    whitespace.  This is the byte-identity invariant vs the generator's
    ``text`` column."""
    s = TAG_RE.sub(" ", html.decode("utf-8"))
    s = WS_RE.sub(" ", s).strip()
    return unescape_html(s)


def extract_body(html: bytes) -> str:
    """Content of the ``<p id="body">`` element, unescaped, whitespace
    preserved — byte-identical to the source document text the page was
    rendered from (SQL-oracle-checkable)."""
    m = BODY_RE.search(html)
    if m is None:
        return ""
    return unescape_html(m.group(1).decode("utf-8"))


class LinkExtract:
    """Actor-pool stage: pages(url, html) → link pairs (src_url, dst_url).

    Compiles regexes once per actor (`__init__`), emits one row per
    anchor.  The wide ``html`` column is consumed here and never flows
    downstream (projection happens at the read: callers select only
    ``[url, html]``).
    """

    def __init__(self):
        self.href_re = HREF_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        src, dst = [], []
        for u, h in zip(urls, htmls):
            targets = self.href_re.findall(h)
            if targets:
                src.extend([u] * len(targets))
                dst.extend(t.decode("utf-8") for t in targets)
        return pa.table({"src_url": pa.array(src, pa.string()),
                         "dst_url": pa.array(dst, pa.string())})


class AnchorExtract:
    """Actor-pool stage: pages(doc_id, html) → anchor rows
    (doc_id, pos, dst, anchor) — one row per ``<a>`` tag in document
    order, duplicates/self-links preserved (the anchor-TEXT signal;
    dedup is downstream policy).  ``dst`` is the numeric doc id parsed
    from the href's final path segment (the fixture url scheme,
    `sources/synth.py:doc_url`); ``anchor`` is the tag body with HTML
    entities unescaped.  Regex compiled once per actor."""

    def __init__(self):
        self.anchor_re = ANCHOR_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        htmls = batch.column("html").to_pylist()
        doc, pos, dst, anchor = [], [], [], []
        for i, h in zip(ids, htmls):
            for p, (href, body) in enumerate(self.anchor_re.findall(h)):
                doc.append(i)
                pos.append(p)
                dst.append(int(href.rsplit(b"/", 1)[1]))
                anchor.append(unescape_html(body.decode("utf-8")))
        return pa.table({"doc_id": pa.array(doc, pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "dst": pa.array(dst, pa.int64()),
                         "anchor": pa.array(anchor, pa.string())})


class TextExtract:
    """Actor-pool stage: pages(url, html) → (url, text) re-extracted."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        texts = [extract_text(h) for h in htmls]
        return pa.table({"url": batch.column("url"),
                         "text": pa.array(texts, pa.string())})


class BodyExtract:
    """Actor-pool stage: pages(url, html) → (url, body) re-extracted."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        texts = [extract_body(h) for h in htmls]
        return pa.table({"url": batch.column("url"),
                         "text": pa.array(texts, pa.string())})
