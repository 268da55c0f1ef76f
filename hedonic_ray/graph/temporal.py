"""Temporal (time-respecting) reachability over the click graph.

Arcs of the navigation graph carry the ARRIVAL TIMESTAMP of the click
that created them; a temporal path must traverse arcs in nondecreasing
time.  The earliest-arrival relaxation is the temporal analogue of
Bellman-Ford (Wu et al., "Path problems in temporal graphs", VLDB'14):

    EA_k(v) = min( EA_{k-1}(v),
                   min{ t : arc (u→v) at t, t ≥ EA_{k-1}(u) } )

from the seed (lowest node id) at virtual start time 0 — every
quantity is an int64 epoch-microsecond, so the SQL oracle unrolls the
same synchronous relaxation CTE-by-CTE with zero float risk.

The reference has no temporal machinery (its graphs are static SNAP
edge lists, ``/root/reference/scripts/utils.py:88-103``); this extends
the click-graph family (`graph/nav.py`) with the streaming-log-native
traversal a web corpus needs (crawl-frontier freshness, session
reachability).

Scale shape: the timestamped arc table is built once per session by
the nav per-user ``groupby(user).map_groups`` exchange (distinct
(src, dst, t) triples; per-group dedup is a combiner, one global
distinct groupby above it) and cached like `nav_arcs`; each relaxation
round is one ``map_batches`` over the arc Dataset against the
broadcast EA vector — only improved (dst, t) pairs leave a batch, the
driver min-merges V-sized state (V = distinct nodes ≪ arcs)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

INF = np.int64(1) << np.int64(62)
UNREACHED = -1


def _temporal_pairs(group: pa.Table) -> pa.Table:
    """One user's history → its distinct non-loop consecutive arcs
    WITH the arrival (destination-event) timestamp in epoch µs."""
    ts = group.column("ts").to_numpy().astype(
        "datetime64[us]").astype(np.int64)
    eid = group.column("event_id").to_numpy()
    node = group.column("node").to_numpy()
    order = np.lexsort((eid, ts))
    nd, tt = node[order], ts[order]
    src, dst, at = nd[:-1], nd[1:], tt[1:]
    keep = src != dst
    src, dst, at = src[keep], dst[keep], at[keep]
    if src.size:
        uniq = np.unique(np.stack([src, dst, at], axis=1), axis=0)
        src, dst, at = uniq[:, 0], uniq[:, 1], uniq[:, 2]
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64()),
                     "t": pa.array(at, pa.int64())})


def nav_temporal_arcs(sf_dir: str):
    """Distinct timestamped arcs (src, dst, t) of the click graph,
    cached per session alongside the other nav arc tables."""
    from ray.data.aggregate import Count

    from hedonic_ray.context import session_scoped
    from hedonic_ray.graph.nav import _NAV_CACHE, nav_events

    session_scoped(_NAV_CACHE)
    key = (sf_dir, "temporal_arcs")
    if key not in _NAV_CACHE:
        pairs = (nav_events(sf_dir)
                 .groupby("user_id")
                 .map_groups(_temporal_pairs, batch_format="pyarrow"))
        _NAV_CACHE[key] = (pairs.groupby(["src", "dst", "t"])
                           .aggregate(Count(alias_name="_c"))
                           .drop_columns(["_c"]).materialize())
    return _NAV_CACHE[key]


def earliest_arrival(arcs, nodes: np.ndarray, seed: int,
                     *, rounds: int = 4) -> np.ndarray:
    """Synchronous earliest-arrival relaxation over the timestamped
    arc Dataset; returns the EA vector aligned with the sorted
    ``nodes`` id array (UNREACHED beyond the round cap).  EA(seed) = 0
    (a virtual start before any event)."""
    import ray

    nodes = np.sort(np.asarray(nodes, dtype=np.int64))
    ea = np.full(len(nodes), INF, dtype=np.int64)
    ea[np.searchsorted(nodes, seed)] = 0
    nodes_ref = ray.put(nodes)

    def relax(batch: pa.Table) -> pa.Table:
        nd = ray.get(nodes_ref)
        e = ray.get(ea_ref)
        src = batch.column("src").to_numpy()
        dst = batch.column("dst").to_numpy()
        t = batch.column("t").to_numpy()
        es = e[np.searchsorted(nd, src)]
        di = np.searchsorted(nd, dst)
        live = (es <= t) & (t < e[di])
        if not live.any():
            return pa.table({"i": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        di, t = di[live], t[live]
        u = np.unique(di)
        best = np.full(len(u), INF, dtype=np.int64)
        np.minimum.at(best, np.searchsorted(u, di), t)
        return pa.table({"i": pa.array(u, pa.int64()),
                         "t": pa.array(best, pa.int64())})

    for _ in range(rounds):
        ea_ref = ray.put(ea)
        nxt = ea.copy()
        for b in arcs.map_batches(relax, batch_format="pyarrow").iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            if b.num_rows:
                np.minimum.at(nxt, b.column("i").to_numpy(),
                              b.column("t").to_numpy())
        if np.array_equal(nxt, ea):
            break
        ea = nxt
    out = ea.copy()
    out[out == INF] = UNREACHED
    return out


def nav_earliest_arrival(sf_dir: str, *, rounds: int = 4) -> pa.Table:
    """(node, ea_us) from the lowest node id at virtual start 0 —
    the driver-gate entry (`graph_earliest_arrival`)."""
    arcs = nav_temporal_arcs(sf_dir)
    cols = []
    for b in arcs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows:
            cols.append(np.unique(np.concatenate(
                [b.column("src").to_numpy(), b.column("dst").to_numpy()])))
    if not cols:
        return pa.table({"node": pa.array([], pa.int64()),
                         "ea_us": pa.array([], pa.int64())})
    nodes = np.unique(np.concatenate(cols))
    ea = earliest_arrival(arcs, nodes, int(nodes.min()), rounds=rounds)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "ea_us": pa.array(ea, pa.int64())})
