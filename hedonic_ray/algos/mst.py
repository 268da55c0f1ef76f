"""Distributed BORŮVKA minimum spanning forest over the CSR link graph.

Classic log-round edge contraction: every round, each component picks
its minimum-weight outgoing edge under the STRICT total order
(w, a, b) — weights are a deterministic integer function of the
canonical endpoints, and the (a, b) tie-break makes every edge key
unique, so the forest is THE unique MSF and both the driver loop and
the SQL oracle converge to the identical edge set round for round.

Per round, ONE ``map_batches`` scatter over the CSR blocks computes
per-component PARTIAL argmins against the broadcast component vector
(`ray.put` once per round; per-block sort + run-boundary take, no
Python loop) — only (component, packed-key) pairs leave a task, so
the gather is O(components · blocks), shrinking geometrically (each
round at least halves the live components; rounds ≤ ⌈log₂ V⌉).  The
driver merges partials, decodes the chosen edges and min-relabels the
merged groups with a pointer-jumping loop over the pick forest —
O(picked) work on V-sized arrays, the same driver-state posture as
k-core / BFS / components.

The packed key (w·n + a)·n + b needs 98·n² < 2⁶³ (n ≤ 3·10⁸); above
that, switch the partial argmin to a structured (w, a, b) triple —
asserted, documented here for the 10¹²-vertex deployment.

The reference has no spanning-structure primitive (its trees are
community dendrograms); this extends the north-rule graph family with
the standard contraction skeleton (Borůvka is also the CC/clustering
workhorse: single-linkage = MSF + threshold cut).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import iter_block_views

_WMOD = 97


def edge_weight(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic integer weight of canonical edge (a < b):
    1 + (a·31 + b·17) mod 97 — a pure function of the endpoint ids
    (same idiom as `algos/sssp.py`), so the CSR blocks carry no
    weight column and the SQL oracle reproduces it arithmetically."""
    return 1 + (a * 31 + b * 17) % _WMOD


def minimum_spanning_forest(g, *, rounds: int = 16):
    """Run Borůvka to the fixed point (or ``rounds`` cap); returns
    int64 arrays ``(a, b, w, rnd)`` — the MSF edges with a < b, their
    weight, and the 1-based round that picked them."""
    import ray

    if g.directed:
        raise ValueError("minimum_spanning_forest needs an undirected graph")
    n = g.n
    assert (_WMOD + 1) * n * n < (1 << 63), \
        "packed argmin key overflows int64: use structured partials"
    comp = np.arange(n, dtype=np.int64)
    out_a, out_b, out_w, out_r = [], [], [], []

    for rnd in range(1, rounds + 1):
        comp_ref = ray.put(comp)

        def partial_min(batch: pa.Table) -> pa.Table:
            c = ray.get(comp_ref)
            grp_out, key_out = [], []
            for bv in iter_block_views(batch):
                src = bv.src_per_edge()
                tgt = bv.indices
                m = c[src] != c[tgt]
                if not m.any():
                    continue
                s, t = src[m], tgt[m]
                a = np.minimum(s, t)
                b = np.maximum(s, t)
                key = (edge_weight(a, b) * n + a) * n + b
                grp = c[s]
                order = np.lexsort((key, grp))
                grp, key = grp[order], key[order]
                first = np.empty(len(grp), dtype=bool)
                first[0] = True
                first[1:] = grp[1:] != grp[:-1]
                grp_out.append(grp[first])
                key_out.append(key[first])
            if not grp_out:
                return pa.table({"comp": pa.array([], pa.int64()),
                                 "key": pa.array([], pa.int64())})
            return pa.table({"comp": pa.array(np.concatenate(grp_out)),
                             "key": pa.array(np.concatenate(key_out))})

        grps, keys = [], []
        for b_ in g.blocks.map_batches(
                partial_min, batch_format="pyarrow").iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            if b_.num_rows:
                grps.append(b_.column("comp").to_numpy())
                keys.append(b_.column("key").to_numpy())
        if not grps:
            break
        grp = np.concatenate(grps)
        key = np.concatenate(keys)
        order = np.lexsort((key, grp))
        grp, key = grp[order], key[order]
        first = np.empty(len(grp), dtype=bool)
        first[0] = True
        first[1:] = grp[1:] != grp[:-1]
        picked = np.unique(key[first])
        eb = picked % n
        ea = (picked // n) % n
        ew = picked // (n * n)
        out_a.append(ea)
        out_b.append(eb)
        out_w.append(ew)
        out_r.append(np.full(len(ea), rnd, np.int64))
        # min-relabel the merged groups: pointer jumping over the
        # pick forest (comp labels stay = min member id throughout)
        cu, cv = comp[ea], comp[eb]
        p = np.arange(n, dtype=np.int64)
        for _ in range(64):
            before = p.copy()
            np.minimum.at(p, cu, p[cv])
            np.minimum.at(p, cv, p[cu])
            p = np.minimum(p, p[p])
            if np.array_equal(p, before):
                break
        else:
            raise RuntimeError("MSF relabel did not converge")
        comp = p[comp]

    if not out_a:
        z = np.empty(0, np.int64)
        return z, z, z, z
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_w), np.concatenate(out_r))
