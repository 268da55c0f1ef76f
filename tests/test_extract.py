import numpy as np
import pytest

from hedonic_ray.functions.extract import (
    escape_html,
    extract_body,
    extract_links,
    extract_text,
    unescape_html,
)
from hedonic_ray.graph.build import (
    assign_vertex_ids,
    canonicalize_edges,
    edges_from_pages,
)
from hedonic_ray.sources.synth import (
    generate_pages,
    pages_from_documents,
    planted_doc_links,
    sbm_edges,
)


def test_escape_roundtrip():
    for s in ["a < b & c > d", "&amp;lt;", "plain", "", "x&y<z>&lt;"]:
        assert unescape_html(escape_html(s)) == s


def test_extract_kernels():
    html = (b'<html><head><title>T &amp; t</title></head><body> '
            b'<p id="body">hello &lt;world&gt;</p> '
            b'<a href="https://x/1">to 1</a> <a href="https://x/2">to 2</a> '
            b"</body></html>")
    assert extract_links(html) == ["https://x/1", "https://x/2"]
    assert extract_body(html) == "hello <world>"
    assert extract_text(html) == "T & t hello <world> to 1 to 2"


def test_pages_text_byte_identity():
    """The per-url invariant: re-extracted text == generator text column."""
    ds = generate_pages(2, 30, p_in=0.3, multiplier=0.1, seed=42)
    rows = ds.take_all()
    assert len(rows) == 60
    for r in rows:
        assert extract_text(r["html"]) == r["text"], r["url"]
        assert r["lang"] in {"en", "de", "pt"}


def test_extracted_edges_match_planted_sbm():
    """pages → extract → canonicalize == golden planted edge list
    (dup anchors deduped, self links dropped)."""
    ds = generate_pages(2, 30, p_in=0.3, multiplier=0.1, seed=42)
    urls_ref, n = assign_vertex_ids(ds)
    assert n == 60
    edges = edges_from_pages(ds, urls_ref)
    canon = canonicalize_edges(edges, n, directed=False)
    got = sorted((r["src"], r["dst"]) for r in canon.take_all())
    golden = sbm_edges(2, 30, p_in=0.3, multiplier=0.1, seed=42)
    assert got == [tuple(e) for e in golden.tolist()]


def test_generate_pages_distributed_equals_local():
    a = generate_pages(2, 12, 0.3, 0.2, seed=1, distributed=False).take_all()
    b = generate_pages(2, 12, 0.3, 0.2, seed=1, distributed=True).take_all()
    a = sorted(a, key=lambda r: r["url"])
    b = sorted(b, key=lambda r: r["url"])
    assert a == b


def test_pages_from_documents_identity_and_links():
    sf = "/root/testdata/sf0.001"
    ds = pages_from_documents(sf)
    rows = ds.take_all()
    assert len(rows) == 500
    import pyarrow.parquet as pq

    docs = {r["doc_id"]: r["text"]
            for r in pq.read_table(f"{sf}/documents.parquet").to_pylist()}
    for r in rows[:50]:
        assert extract_body(r["html"]) == docs[r["doc_id"]]
        assert extract_text(r["html"]).startswith(f"Doc {r['doc_id']} ")
        links = extract_links(r["html"])
        src, dst = planted_doc_links(np.array([r["doc_id"]]), 500)
        assert links == [f"https://docs.example/{v:08d}" for v in dst.tolist()]


def test_anchor_extract_kernel():
    """AnchorExtract parses (href, body) pairs in document order with
    duplicates kept, numeric dst from the final path segment, and HTML
    entities unescaped in the anchor text."""
    import pyarrow as pa

    from hedonic_ray.functions.extract import AnchorExtract

    html = (b'<html><body>'
            b'<a href="https://docs.example/00000007">to &amp; fro</a> '
            b'<a href="https://docs.example/00000003">x &lt;y&gt;</a> '
            b'<a href="https://docs.example/00000007">again</a>'
            b'</body></html>')
    batch = pa.table({"doc_id": pa.array([3], pa.int64()),
                      "html": pa.array([html], pa.binary())})
    out = AnchorExtract()(batch)
    assert out.column("doc_id").to_pylist() == [3, 3, 3]
    assert out.column("pos").to_pylist() == [0, 1, 2]
    assert out.column("dst").to_pylist() == [7, 3, 7]
    assert out.column("anchor").to_pylist() == ["to & fro", "x <y>", "again"]
