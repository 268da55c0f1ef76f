"""GML graph I/O (reference-compat small-graph source/sink).

The reference round-trips igraph graphs through GML
(``/root/reference/scripts/gen_or_read.py:29,34`` —
``g.write_gml('test.gml')`` / ``Game.Read_GML``).  igraph is not in
this container, so this module implements the igraph GML dialect
directly (``graph [ node [ id N ... ] edge [ source A target B ] ]``)
with no third-party dependency.

Scale note: GML is a single sequential text format — a COMPATIBILITY
surface for small graphs (the reference uses it exactly that way: its
own benchmark shows pickle beating GML, and its pipelines are
edge-list/parquet).  The reader parses on the driver and hands the
edge table to Ray as Arrow; for anything large, use the Parquet /
edge-list sources (`sources/readers.py`).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TOKEN = re.compile(r'"[^"]*"|\[|\]|[^\s\[\]"]+')


def _parse_val(s: str):
    if s.startswith('"'):
        return s[1:-1]
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def _parse_block(toks: list[str], i: int):
    """Parse key/value pairs after a ``[`` until the matching ``]``.
    Values may themselves be ``[ ... ]`` blocks (networkx ``graphics``
    etc.) — kept as nested dicts.  Returns (attrs, index past ``]``);
    raises on an unterminated block instead of misparsing silently."""
    attrs: dict = {}
    while i < len(toks):
        tok = toks[i]
        if tok == "]":
            return attrs, i + 1
        key, i = tok, i + 1
        if i >= len(toks):
            break
        if toks[i] == "[":
            val, i = _parse_block(toks, i + 1)
        else:
            val, i = _parse_val(toks[i]), i + 1
        attrs[key] = val
    raise ValueError("GML: unterminated block")


def parse_gml(text: str):
    """→ (nodes: list[dict], edges: list[dict], directed: bool).

    Proper tokenizer (quoted strings may contain ``]``; nested
    sub-blocks like networkx's ``graphics [ ... ]`` parse as nested
    dicts) — a structural error raises rather than silently dropping
    attributes or edges."""
    toks = _TOKEN.findall(text)
    nodes: list[dict] = []
    edges: list[dict] = []
    directed = False
    i = 0
    while i < len(toks):
        if toks[i] == "graph" and i + 1 < len(toks) and toks[i + 1] == "[":
            i += 2
            while i < len(toks) and toks[i] != "]":
                key, i = toks[i], i + 1
                if i < len(toks) and toks[i] == "[":
                    block, i = _parse_block(toks, i + 1)
                    if key == "node":
                        nodes.append(block)
                    elif key == "edge":
                        edges.append(block)
                else:
                    val, i = _parse_val(toks[i]), i + 1
                    if key == "directed":
                        directed = bool(val)
            if i >= len(toks):
                raise ValueError("GML: unterminated graph block")
            i += 1
        else:
            i += 1
    return nodes, edges, directed


def read_gml(path: str):
    """Read a GML file → (edges Dataset (src, dst int64), nodes
    pa.Table (vertex int64 + any scalar node attributes), directed).

    Node ids are kept verbatim (igraph writes dense 0..n−1; arbitrary
    integer ids also work).  Edges reference node ids."""
    import ray.data as rd

    from hedonic_ray.context import configure_context

    with open(path) as f:
        nodes, edges, directed = parse_gml(f.read())
    if any("id" not in n for n in nodes):
        raise ValueError(f"{path}: node block without id")
    cols: dict[str, list] = {"vertex": [int(n["id"]) for n in nodes]}
    # scalar attributes only — nested sub-blocks (networkx graphics
    # etc.) parse fine but don't belong in a flat Arrow column
    attr_names = sorted({k for n in nodes for k, v in n.items()
                         if k != "id" and not isinstance(v, dict)})
    for a in attr_names:
        cols[a] = [n.get(a) for n in nodes]
    node_table = pa.table(
        {k: pa.array(v, pa.int64() if k == "vertex" else None)
         for k, v in cols.items()})
    src = np.array([int(e["source"]) for e in edges], dtype=np.int64)
    dst = np.array([int(e["target"]) for e in edges], dtype=np.int64)
    configure_context()
    edge_ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                      "dst": pa.array(dst)}))
    return edge_ds, node_table, directed


def write_gml(path: str, edges, *, n_vertices: int | None = None,
              membership=None, directed: bool = False):
    """Write an igraph-dialect GML file from an edge table
    (``pa.Table`` | Dataset with src/dst), optionally attaching a
    per-vertex ``community`` attribute from ``membership``.  Output
    parses back bit-equal through :func:`read_gml` (round-trip
    tested) and matches the block layout igraph emits."""
    if hasattr(edges, "to_arrow_refs") or hasattr(edges, "iter_batches"):
        batches = list(edges.iter_batches(batch_size=1 << 16,
                                          batch_format="pyarrow"))
        edges = (pa.concat_tables(batches) if batches
                 else pa.table({"src": pa.array([], pa.int64()),
                                "dst": pa.array([], pa.int64())}))
    src = edges.column("src").to_numpy()
    dst = edges.column("dst").to_numpy()
    if n_vertices is None:
        n_vertices = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
    lines = ["graph", "[", f"  directed {int(bool(directed))}"]
    for v in range(n_vertices):
        lines += ["  node", "  [", f"    id {v}"]
        if membership is not None:
            lines.append(f"    community {int(membership[v])}")
        lines.append("  ]")
    for s, d in zip(src, dst):
        lines += ["  edge", "  [", f"    source {int(s)}",
                  f"    target {int(d)}", "  ]"]
    lines.append("]")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
