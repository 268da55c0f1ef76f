"""Subgraph / cross-community / degree analytics.

Closes the remaining SURVEY §2 inventory entries:

* :func:`edges_between` — edge count between two coalitions (the
  reference's ``edges_between`` reads an attribute that is never
  written, ``/root/reference/hedonic/__init__.py:175-179`` — this is
  the working replacement, computed from the CSR blocks);
* :func:`induced_subgraph_edges` — community ∪ 1-hop-neighborhood
  induced subgraph (``scripts/example.py:33-40``) as a broadcast-set
  semi-join over the blocks;
* :func:`degree_histogram` — ``np.histogram`` of degrees
  (``scripts/reciprocity_clustering.py:7-13``);
* :func:`cluster_degree_distributions` — per-coalition internal-degree
  multiset, the reference's isomorphism-ish dedup key
  (``scripts/robustness/robust.py:48-76``);
* :func:`rescore_ari` — batch ARI re-scoring of a results table
  (``scripts/ari/ari.py:37-56``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.analytics.hedonic_stats import adjusted_rand_index
from hedonic_ray.engine.superstep import iter_block_views


def _edge_endpoints(g):
    """Stream (src, dst) arc arrays per block (driver-side iteration of
    the materialized CSR blocks — each yield is one partition)."""
    for batch in g.blocks.iter_batches(batch_size=4, batch_format="pyarrow"):
        for bv in iter_block_views(batch):
            yield bv.src_per_edge(), bv.indices


def edges_between(g, membership: np.ndarray, coalition_a: int,
                  coalition_b: int) -> int:
    """Number of undirected edges with one endpoint in each coalition."""
    mem = np.asarray(membership, dtype=np.int64)
    total = 0
    for src, dst in _edge_endpoints(g):
        ms, md = mem[src], mem[dst]
        total += int(((ms == coalition_a) & (md == coalition_b)).sum())
        if coalition_a != coalition_b:
            total += int(((ms == coalition_b) & (md == coalition_a)).sum())
    # symmetrized blocks count every undirected edge twice
    return total // 2 if not g.directed else total


def neighborhood_closure(g, vertices) -> np.ndarray:
    """community ∪ its 1-hop neighbors (scripts/example.py:33)."""
    inside = np.zeros(g.n, dtype=bool)
    inside[np.asarray(list(set(vertices)), dtype=np.int64)] = True
    out = inside.copy()
    for src, dst in _edge_endpoints(g):
        sel = inside[src]
        out[dst[sel]] = True
    return np.flatnonzero(out)


def induced_subgraph_edges(g, vertices) -> pa.Table:
    """Canonical (min,max) edge table of the subgraph induced by the
    vertex set (broadcast-set semi-join per block)."""
    keep = np.zeros(g.n, dtype=bool)
    keep[np.asarray(list(set(vertices)), dtype=np.int64)] = True
    lo_all, hi_all = [], []
    for src, dst in _edge_endpoints(g):
        sel = keep[src] & keep[dst]
        s, d = src[sel], dst[sel]
        lo_all.append(np.minimum(s, d))
        hi_all.append(np.maximum(s, d))
    if not lo_all:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    lo = np.concatenate(lo_all)
    hi = np.concatenate(hi_all)
    key = np.unique(lo * np.int64(g.n) + hi)
    return pa.table({"src": pa.array(key // g.n, pa.int64()),
                     "dst": pa.array(key % g.n, pa.int64())})


def degree_histogram(g, bins: int = 10) -> pa.Table:
    counts, edges = np.histogram(g.out_degree, bins=bins)
    return pa.table({"bin_lo": pa.array(edges[:-1], pa.float64()),
                     "bin_hi": pa.array(edges[1:], pa.float64()),
                     "count": pa.array(counts, pa.int64())})


def cluster_degree_distributions(g, membership: np.ndarray):
    """Per-coalition sorted multiset of internal degrees → canonical,
    order-insensitive key (robust.py:48-76 semantics: internal degree =
    neighbors in the same coalition)."""
    mem = np.asarray(membership, dtype=np.int64)
    internal = np.zeros(g.n, dtype=np.int64)
    for src, dst in _edge_endpoints(g):
        same = mem[src] == mem[dst]
        np.add.at(internal, src[same], 1)
    # symmetrized blocks count each endpoint once per arc → already per-vertex
    dists = []
    for c in np.unique(mem):
        degs = np.sort(internal[mem == c])
        vals, cnts = np.unique(degs, return_counts=True)
        dists.append(tuple(zip(vals.tolist(), cnts.tolist())))
    return tuple(sorted(dists))


def rescore_ari(results_ds, memberships: dict, truth: np.ndarray,
                key_col: str = "partition_seed"):
    """Add ``adjusted_rand`` to a results table given stored memberships
    keyed by ``key_col`` (scripts/ari/ari.py:37-56 as a map_batches)."""

    def f(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        ari = [adjusted_rand_index(memberships[k], truth) for k in keys]
        return t.append_column("adjusted_rand", pa.array(ari, pa.float64()))

    return results_ds.map_batches(f, batch_format="pyarrow")
