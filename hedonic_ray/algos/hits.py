"""HITS (hubs & authorities) over the directed CSR link graph.

Not present in the reference repo (its algorithms are community
games); HITS is the classic companion of PageRank on hyperlink graphs
(Kleinberg 1999) and extends the north-rule loop family.  One
iteration is

    auth' = A^T hub      (push: every arc u→v sends hub(u) to v)
    hub'  = A  auth'     (pull: every source sums auth' over out-nbrs)

expressed as two passes over the CSR blocks:

- the **push** is the PageRank scatter shape (`algos/pagerank.py:47`):
  per block a ``np.bincount`` over destinations builds a sparse
  (dst, partial) combiner table — only touched vertices travel, the
  driver (or, at scale, the kv-shuffle gather) merges partials;
- the **pull** is the shared weighted-neighbor-sum kernel
  (`algos/kcore.py:masked_neighbor_count`) against the broadcast
  ``auth`` vector (``ray.put`` once per pass, read per block).

Two modes:

- ``normalize=False`` (the gate query): EXACT int64 arithmetic from
  hub₀ = 1 — every score is a path count, reproducible in SQL as an
  unrolled join chain.  ``iters`` must stay small (scores grow like
  λ²ᵏ); an overflow guard asserts headroom each pass.
- ``normalize=True``: float64 power iteration with L1 normalization
  per half-step, converging to the principal singular vectors of the
  adjacency (pytest-checked against a dense NumPy oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.algos.kcore import masked_neighbor_count
from hedonic_ray.engine.superstep import iter_block_views

_I64_MAX = np.iinfo(np.int64).max


def _push_auth(g, hub: np.ndarray) -> np.ndarray:
    """auth = A^T hub — sparse per-block bincount combiner, merged on
    the driver (partials are (touched dsts × parts), never raw edges;
    the framework kv-shuffle gather is the >200k-vertex path, same
    switch as `PageRankStep.prefers_tasks`)."""
    import ray

    hub_ref = ray.put(hub)
    out_t = pa.float64() if hub.dtype.kind == "f" else pa.int64()

    def f(batch: pa.Table) -> pa.Table:
        h = ray.get(hub_ref)
        dst_out, val_out = [], []
        for bv in iter_block_views(batch):
            deg = np.diff(bv.indptr)
            per_edge = np.repeat(h[bv.lo:bv.hi], deg)
            if len(per_edge) == 0:
                continue
            s = np.bincount(bv.indices, weights=per_edge)
            nz = np.flatnonzero(s)
            dst_out.append(nz.astype(np.int64))
            val_out.append(s[nz])
        if not dst_out:
            return pa.table({"dst": pa.array([], pa.int64()),
                             "val": pa.array([], out_t)})
        vals = np.concatenate(val_out)
        if out_t == pa.int64():
            vals = vals.astype(np.int64)
        return pa.table({"dst": pa.array(np.concatenate(dst_out)),
                         "val": pa.array(vals, out_t)})

    acc = np.zeros(g.n, dtype=hub.dtype)
    for batch in g.blocks.map_batches(f, batch_format="pyarrow").iter_batches(
            batch_size=256, batch_format="pyarrow"):
        d = batch.column("dst").to_numpy()
        v = batch.column("val").to_numpy()
        np.add.at(acc, d, v.astype(acc.dtype))
    return acc


def hits(g, *, iters: int = 2, normalize: bool = False):
    """Run ``iters`` full HITS iterations; returns ``(hub, auth)``
    vectors.  ``g`` must be the DIRECTED CSR graph (arcs src→dst)."""
    dtype = np.float64 if normalize else np.int64
    hub = np.ones(g.n, dtype=dtype)
    auth = np.zeros(g.n, dtype=dtype)
    import ray

    for _ in range(iters):
        auth = _push_auth(g, hub)
        if normalize:
            s = auth.sum()
            if s > 0:
                auth = auth / s
        else:
            # next pull multiplies by ≤ max in-degree·n — assert headroom
            assert auth.max(initial=0) < _I64_MAX // max(g.n, 1), \
                "int64 HITS overflow: lower iters or use normalize=True"
        hub = masked_neighbor_count(g, ray.put(auth))
        if normalize:
            s = hub.sum()
            if s > 0:
                hub = hub / s
    return hub, auth
