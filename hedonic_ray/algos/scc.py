"""Strongly connected components of a directed LinkGraph.

The coloring algorithm (Orzan 2004; the FW-BW-MIN family Hong et al.
2013 showed practical on real graphs):

  repeat until every vertex is assigned:
    trim:   vertices with no unassigned in-arcs OR no unassigned
            out-arcs are singleton SCCs (removes the acyclic fringe —
            the standard mitigation for chain-shaped SCC DAGs);
    color:  min-label FORWARD propagation over unassigned vertices —
            color(v) = min unassigned ancestor id (≤ own id);
    mark:   BACKWARD propagation from each color's root r (the vertex
            whose id equals its color), restricted to same-color
            vertices: the marked set of color c is exactly SCC(r);
    assign: scc(marked) = color — which is the SCC's minimum member id
            (every member's color is c, and color(v) ≤ id(v)).

Two backends behind one loop (the components/hedonic ``local``
pattern, `engine/superstep.py`): below ``LOCAL_MAX_ARCS`` the arc
arrays are pulled to the driver ONCE and every round is a numpy
bincount/minimum.at pass (SCC needs O(SCC-DAG-depth) rounds, each a
full graph sweep — at toy scale the per-round Ray round-trip, not the
compute, dominates by 100×); above it each primitive runs as the same
scatter/partial-reduce block sweep `ComponentsStep` uses.  Backends
are bit-identity-tested against each other and against a brute-force
transitive-closure oracle.  Outer rounds are bounded by the SCC-DAG
depth after trimming; web-shaped graphs converge in a few rounds
(Hong et al.), degenerate SCC chains do not — documented, not hidden.

The emitted label equals the minimum vertex id of the SCC, which is
what the mutual-reachability SQL oracle computes — no relabeling step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import iter_block_views

_INF = np.float64(np.inf)
LOCAL_MAX_ARCS = 2_000_000


class _LocalPrims:
    """Driver-local primitives over the full (src, dst) arc arrays."""

    def __init__(self, n: int, src: np.ndarray, dst: np.ndarray):
        self.n, self.src, self.dst = n, src, dst

    def minprop(self, vals: np.ndarray) -> np.ndarray:
        inc = np.full(self.n, _INF)
        np.minimum.at(inc, self.dst, vals[self.src])
        return inc

    def live_degs(self, live: np.ndarray):
        ok = live[self.src] & live[self.dst]
        indeg = np.bincount(self.dst[ok], minlength=self.n)
        outdeg = np.bincount(self.src[ok], minlength=self.n)
        return indeg, outdeg

    def mark_hits(self, marked_color: np.ndarray,
                  color: np.ndarray) -> np.ndarray:
        """True where some arc v→w has marked w with color(w)==color(v)
        (computed on the ORIGINAL arcs; the distributed backend walks
        the reversed graph instead — same relation)."""
        ok = marked_color[self.dst] == color[self.src]
        hit = np.zeros(self.n, dtype=bool)
        hit[self.src[ok]] = True
        return hit


class _RayPrims:
    """The same three primitives as per-block scatter + driver combine
    (the `ComponentsStep` exchange shape)."""

    def __init__(self, g_fwd, g_bwd):
        self.g_fwd, self.g_bwd = g_fwd, g_bwd
        self.n = g_fwd.n

    @staticmethod
    def _reduce(g, fn, init, combine):
        def task(batch: pa.Table) -> pa.Table:
            acc = init()
            for bv in iter_block_views(batch):
                fn(bv, acc)
            return pa.table({"vec": pa.array([acc.astype(np.float64)],
                                             pa.list_(pa.float64()))})

        out = init()
        for b in (g.blocks.map_batches(task, batch_format="pyarrow",
                                       batch_size=4)
                  .iter_batches(batch_size=16, batch_format="pyarrow")):
            col = b.column("vec")
            for i in range(len(col)):
                combine(out, np.asarray(col[i].values))
        return out

    def minprop(self, vals: np.ndarray) -> np.ndarray:
        import ray

        ref = ray.put(vals)

        def scatter(bv, acc):
            v = ray.get(ref)
            np.minimum.at(acc, bv.indices, v[bv.src_per_edge()])

        return self._reduce(self.g_fwd, scatter,
                            lambda: np.full(self.n, _INF),
                            lambda a, b: np.minimum(a, b, out=a))

    def live_degs(self, live: np.ndarray):
        import ray

        ref = ray.put(live.astype(np.float64))

        def deg(bv, acc, rev=False):
            v = ray.get(ref)
            src = bv.src_per_edge()
            w = v[src] * v[bv.indices]
            np.add.at(acc, src if rev else bv.indices, w)

        indeg = self._reduce(self.g_fwd, lambda bv, a: deg(bv, a),
                             lambda: np.zeros(self.n),
                             lambda a, b: np.add(a, b, out=a))
        outdeg = self._reduce(self.g_fwd, lambda bv, a: deg(bv, a, rev=True),
                              lambda: np.zeros(self.n),
                              lambda a, b: np.add(a, b, out=a))
        return indeg, outdeg

    def mark_hits(self, marked_color: np.ndarray,
                  color: np.ndarray) -> np.ndarray:
        import ray

        mref = ray.put(marked_color)
        cref = ray.put(color)

        def mark(bv, acc):
            mcol = ray.get(mref)
            col = ray.get(cref)
            src = bv.src_per_edge()  # reversed arc w→v ≡ original v→w
            ok = mcol[src] == col[bv.indices]
            np.minimum.at(acc, bv.indices[ok], 0.0)

        hit = self._reduce(self.g_bwd, mark,
                           lambda: np.full(self.n, _INF),
                           lambda a, b: np.minimum(a, b, out=a))
        return hit == 0.0


def _collect_arcs(g) -> tuple[np.ndarray, np.ndarray]:
    srcs, dsts = [], []
    for batch in g.blocks.iter_batches(batch_size=8, batch_format="pyarrow"):
        for bv in iter_block_views(batch):
            srcs.append(bv.src_per_edge())
            dsts.append(bv.indices)
    if not srcs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(srcs), np.concatenate(dsts)


def _scc_loop(n: int, prims, max_rounds: int, max_iters: int) -> np.ndarray:
    ids = np.arange(n, dtype=np.int64)
    scc = np.full(n, -1, dtype=np.int64)

    for _ in range(max_rounds):
        live = scc < 0
        if not live.any():
            return scc

        # ---- trim the acyclic fringe (fixpoint of singleton removal)
        while True:
            indeg, outdeg = prims.live_degs(live)
            trim = live & ((indeg == 0) | (outdeg == 0))
            if not trim.any():
                break
            scc[trim] = ids[trim]
            live = scc < 0
            if not live.any():
                return scc

        # ---- forward coloring over the live subgraph
        color = np.where(live, ids.astype(np.float64), _INF)
        for _ in range(max_iters):
            inc = prims.minprop(color)
            new = np.where(live, np.minimum(color, inc), color)
            if (new == color).all():
                break
            color = new
        else:
            raise RuntimeError("SCC coloring did not converge within "
                               f"{max_iters} supersteps")

        # ---- backward same-color mark from the roots
        marked = live & (color == ids)
        for _ in range(max_iters):
            hits = prims.mark_hits(np.where(marked, color, _INF), color)
            new = marked | (live & np.isfinite(color) & hits)
            if (new == marked).all():
                break
            marked = new
        else:
            # an incomplete mark set would silently split one SCC
            # across two labels — fail loudly like the coloring loop
            raise RuntimeError("SCC backward mark did not converge "
                               f"within {max_iters} supersteps")

        scc[marked] = color[marked].astype(np.int64)

    if (scc < 0).any():
        raise RuntimeError(f"SCC did not finish within {max_rounds} rounds")
    return scc


def strongly_connected_components(g_fwd, g_bwd, *, backend: str = "auto",
                                  max_rounds: int = 10_000,
                                  max_iters: int = 10_000) -> np.ndarray:
    """SCC labels (min member id per component) of the directed graph.
    ``g_fwd`` / ``g_bwd`` are the LinkGraphs of the arcs and the
    reversed arcs (same vertex numbering)."""
    if not (g_fwd.directed and g_bwd.directed):
        raise ValueError("strongly_connected_components needs directed "
                         "forward and backward LinkGraphs")
    if backend == "auto":
        from hedonic_ray.context import force_scale

        small = g_fwd.m <= LOCAL_MAX_ARCS
        backend = "ray" if force_scale() else ("local" if small else "ray")
    if backend == "local":
        src, dst = _collect_arcs(g_fwd)
        prims = _LocalPrims(g_fwd.n, src, dst)
    elif backend == "ray":
        prims = _RayPrims(g_fwd, g_bwd)
    else:
        raise ValueError(f"unknown scc backend {backend!r}")
    return _scc_loop(g_fwd.n, prims, max_rounds, max_iters)
