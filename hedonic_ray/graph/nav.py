"""Navigation click-graph from the events stream, with reciprocity.

A second graph SOURCE for the engine: nodes are the page ids riding in
the event ``props`` JSON (``k``), arcs connect consecutive events of
the same user in (ts, event_id) order — the standard construction of a
site-navigation graph from a click log.  On top of it, per-node
reciprocity (reciprocated out-arcs / out-arcs) — the metric the
reference's reciprocity clustering is built around but never computes
correctly (``scripts/reciprocity_clustering.py:33,39`` — its
``'=' or '<' in x`` guard is always truthy, verified round 1); here it
is well-defined, exact-integer, and SQL-oracled.

Scale shape, stage by stage:

1. field extraction is one vectorized ``pc.extract_regex`` per batch
   (no per-row JSON parse);
2. per-user ordering runs inside ``groupby(user).map_groups`` — a
   hash-partitioned exchange; the one partitioning assumption is that
   a single user's history fits a worker (standard for
   sessionization), and each group emits its arcs ALREADY deduped, so
   the next exchange carries distinct (user-local) arcs only;
3. global arc distinct + reciprocity detection share ONE
   ``groupby(a, b)``: every arc posts its forward pair tagged
   ``is_arc`` and its reversed pair tagged ``is_rev`` — a group
   holding both tags is an arc whose reverse is also an arc;
4. the per-node rollup is a second (node-sized) groupby.

No driver-side state anywhere; every exchange is keyed and the
heaviest one carries O(distinct arcs) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hedonic_ray.context import configure_context

_K_PATTERN = r'"k":\s*(?P<node>-?\d+)'

# per-process arc-table cache: the three nav gate queries share one
# extraction + user-groupby instead of rebuilding the click graph each
_NAV_CACHE: dict = {}


def nav_events(sf_dir: str):
    """(user_id, ts, event_id, node) — the click log with the page id
    extracted from the props JSON (columns pruned at the read)."""
    import ray.data as rd

    configure_context()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "props"])

    def ext(t: pa.Table) -> pa.Table:
        s = pc.extract_regex(t.column("props"), pattern=_K_PATTERN)
        return pa.table({"user_id": t.column("user_id"),
                         "ts": t.column("ts"),
                         "event_id": t.column("event_id"),
                         "node": pc.cast(pc.struct_field(s, "node"),
                                         pa.int64())})

    return ds.map_batches(ext, batch_format="pyarrow")


def _consecutive_pairs(group: pa.Table) -> pa.Table:
    """One user's history → its distinct non-loop consecutive arcs."""
    ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
    eid = group.column("event_id").to_numpy()
    node = group.column("node").to_numpy()
    order = np.lexsort((eid, ts))
    nd = node[order]
    src, dst = nd[:-1], nd[1:]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if src.size:
        uniq = np.unique(np.stack([src, dst], axis=1), axis=0)
        src, dst = uniq[:, 0], uniq[:, 1]
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64())})


def nav_arcs(sf_dir: str):
    """Distinct directed arcs of the navigation graph (self-loops
    dropped).  Distinctness is global: the per-user dedup in
    ``_consecutive_pairs`` is only a combiner."""
    from ray.data.aggregate import Count

    from hedonic_ray.context import session_scoped

    session_scoped(_NAV_CACHE)
    key = (sf_dir, "arcs")
    if key not in _NAV_CACHE:
        pairs = (nav_events(sf_dir)
                 .groupby("user_id")
                 .map_groups(_consecutive_pairs, batch_format="pyarrow"))
        _NAV_CACHE[key] = (pairs.groupby(["src", "dst"])
                           .aggregate(Count(alias_name="_c"))
                           .drop_columns(["_c"]).materialize())
    return _NAV_CACHE[key]


def nav_reciprocity(sf_dir: str):
    """Per-node reciprocity of the navigation graph:
    (node, out_deg, recip_deg, ratio_e9) for nodes with out-arcs,
    ratio_e9 = floor(recip·1e9 / out) exact-integer."""
    from ray.data.aggregate import Sum

    arcs = nav_arcs(sf_dir)

    def tag(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        return pa.table({
            "a": pa.array(np.concatenate([src, dst]), pa.int64()),
            "b": pa.array(np.concatenate([dst, src]), pa.int64()),
            "is_arc": pa.array(np.repeat([1, 0], len(src)), pa.int64()),
            "is_rev": pa.array(np.repeat([0, 1], len(src)), pa.int64()),
        })

    flags = (arcs.map_batches(tag, batch_format="pyarrow")
             .groupby(["a", "b"])
             .aggregate(Sum("is_arc", alias_name="is_arc"),
                        Sum("is_rev", alias_name="is_rev")))

    def per_node(t: pa.Table) -> pa.Table:
        is_arc = t.column("is_arc").to_numpy()
        is_rev = t.column("is_rev").to_numpy()
        keep = is_arc == 1  # rows that are real arcs (rev-only rows drop)
        return pa.table({
            "node": t.column("a").filter(pa.array(keep)),
            "out1": pa.array(np.ones(int(keep.sum()), np.int64)),
            "rec1": pa.array((is_rev[keep] == 1).astype(np.int64)),
        })

    deg = (flags.map_batches(per_node, batch_format="pyarrow")
           .groupby("node")
           .aggregate(Sum("out1", alias_name="out_deg"),
                      Sum("rec1", alias_name="recip_deg")))

    def finalize(t: pa.Table) -> pa.Table:
        out = t.column("out_deg").to_numpy()
        rec = t.column("recip_deg").to_numpy()
        return pa.table({"node": t.column("node"),
                         "out_deg": pa.array(out.astype(np.int64)),
                         "recip_deg": pa.array(rec.astype(np.int64)),
                         "ratio_e9": pa.array(
                             rec * np.int64(1_000_000_000) // out)})

    return deg.map_batches(finalize, batch_format="pyarrow")


def _consecutive_multi(group: pa.Table) -> pa.Table:
    """One user's history → (src, dst, n) WEIGHTED consecutive
    transitions (self-loops dropped, no dedup — the weight is the
    click count)."""
    ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
    eid = group.column("event_id").to_numpy()
    node = group.column("node").to_numpy()
    order = np.lexsort((eid, ts))
    nd = node[order]
    src, dst = nd[:-1], nd[1:]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if src.size:
        uniq, cnt = np.unique(np.stack([src, dst], axis=1), axis=0,
                              return_counts=True)
        return pa.table({"src": pa.array(uniq[:, 0], pa.int64()),
                         "dst": pa.array(uniq[:, 1], pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})
    return pa.table({"src": pa.array([], pa.int64()),
                     "dst": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())})


def nav_top_transitions(sf_dir: str, k: int = 20):
    """Top-k WEIGHTED transitions of the navigation click graph:
    ``(src, dst, n)`` by click count, deterministic ties
    (n desc, src, dst).  The per-user fold is the combiner (one
    grouped exchange on user), the (src, dst) groupby carries the
    distinct arc grid, and the top-k is a sort + limit over that
    small grid."""
    from ray.data.aggregate import Sum

    pairs = (nav_events(sf_dir)
             .groupby("user_id")
             .map_groups(_consecutive_multi, batch_format="pyarrow"))
    counts = pairs.groupby(["src", "dst"]).aggregate(
        Sum("n", alias_name="n"))
    return counts.sort(["n", "src", "dst"],
                       descending=[True, False, False]).limit(k)


def nav_weighted_arcs(sf_dir: str):
    """(src, dst, w) weighted transition arcs (w = click count)."""
    from ray.data.aggregate import Sum

    from hedonic_ray.context import session_scoped

    session_scoped(_NAV_CACHE)
    key = (sf_dir, "warcs")
    if key not in _NAV_CACHE:
        pairs = (nav_events(sf_dir)
                 .groupby("user_id")
                 .map_groups(_consecutive_multi, batch_format="pyarrow"))
        _NAV_CACHE[key] = (pairs.groupby(["src", "dst"])
                           .aggregate(Sum("n", alias_name="w"))
                           .materialize())
    return _NAV_CACHE[key]


def nav_weighted_pagerank(sf_dir: str, *, iters: int = 3,
                          damping: float = 0.85) -> pa.Table:
    """WEIGHTED PageRank over the click graph: each arc contributes
    ``r(u)·w(u,v)/W(u)`` (W = out-click weight), dangling mass spread
    uniformly — the engine's first weighted-graph operator.  Fixed
    iteration count (the SQL oracle unrolls it); ×1e9 half-up ints.

    Shape: the weighted arc table is the distributed operand — every
    iteration is one ``map_batches`` over the arcs (vectorized lookup
    of the broadcast node-indexed rank/out-weight vectors + per-batch
    Arrow pre-combine) and one ``groupby(dst).sum`` exchange; the
    driver holds only node-sized vectors (the PageRank posture)."""
    import ray
    from ray.data.aggregate import Sum

    arcs = nav_weighted_arcs(sf_dir).materialize()

    # node domain = every page seen in the click log (dangling incl.)
    nodes = np.unique(np.concatenate(
        [b.column("node").to_numpy() for b in
         nav_events(sf_dir).select_columns(["node"])
         .iter_batches(batch_size=65536, batch_format="pyarrow")]
        or [np.empty(0, np.int64)])).astype(np.int64)
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank_e9": pa.array([], pa.int64())})

    # out-weight per node (0 = dangling), node-indexed via searchsorted
    outw = np.zeros(n, dtype=np.float64)
    for b in arcs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        s = np.searchsorted(nodes, b.column("src").to_numpy())
        np.add.at(outw, s, b.column("w").to_numpy().astype(np.float64))

    d = damping
    # node-sized vectors broadcast ONCE (ray.put), not re-pickled into
    # every task via closure capture; only the rank vector changes per
    # iteration
    static_ref = ray.put((nodes, outw))
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(iters):
        ref = ray.put(rank)

        def contrib(t: pa.Table, _ref=ref) -> pa.Table:
            r = ray.get(_ref)
            nds, ow = ray.get(static_ref)
            s = np.searchsorted(nds, t.column("src").to_numpy())
            dst = t.column("dst").to_numpy()
            w = t.column("w").to_numpy().astype(np.float64)
            c = r[s] * w / ow[s]
            g = pa.table({"dst": pa.array(dst), "c": pa.array(c)})
            return g.group_by(["dst"]).aggregate(
                [("c", "sum")]).rename_columns(["dst", "c"])

        # vectorized fill: collect the ≤ n aggregate rows as columns,
        # ONE searchsorted (not one call per row)
        agg = np.zeros(n, dtype=np.float64)
        dst_parts, c_parts = [], []
        for b in (arcs.map_batches(contrib, batch_format="pyarrow")
                  .groupby("dst").aggregate(Sum("c", alias_name="c"))
                  .iter_batches(batch_size=65536, batch_format="pyarrow")):
            dst_parts.append(b.column("dst").to_numpy())
            c_parts.append(b.column("c").to_numpy().astype(np.float64))
        if dst_parts:
            dsts = np.concatenate(dst_parts)
            agg[np.searchsorted(nodes, dsts)] = np.concatenate(c_parts)
        dangling = rank[outw == 0].sum()
        rank = (1.0 - d) / n + d * (agg + dangling / n)

    rank_e9 = np.floor(rank * 1e9 + 0.5).astype(np.int64)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank_e9": pa.array(rank_e9, pa.int64())})


def nav_weighted_labelprop(sf_dir: str, *, iters: int = 2) -> pa.Table:
    """WEIGHTED LABEL PROPAGATION over the click graph: per round,
    every node adopts the label with the largest INCOMING CLICK-WEIGHT
    sum (ties → lowest label; nodes with no in-arcs keep their label)
    — synchronous plurality LP on the weighted transition arcs, init
    label = node id.  Fixed ``iters`` so the SQL oracle unrolls it.

    Shape: the weighted arc table stays the distributed operand —
    per round one ``map_batches`` over the arcs (vectorized broadcast
    label lookup + per-batch Arrow (dst, lab, w) pre-combine) and one
    ``groupby(dst, lab).sum`` exchange; the driver holds the
    node-sized label vector and the O(active-grid) argmax (the
    `nav_weighted_pagerank` posture).  Columns: node, label."""
    import ray
    from ray.data.aggregate import Sum

    arcs = nav_weighted_arcs(sf_dir).materialize()
    nodes = np.unique(np.concatenate(
        [b.column("node").to_numpy() for b in
         nav_events(sf_dir).select_columns(["node"])
         .iter_batches(batch_size=65536, batch_format="pyarrow")]
        or [np.empty(0, np.int64)])).astype(np.int64)
    lab = nodes.copy()

    for _ in range(iters):
        lab_ref = ray.put(lab)

        def tally(t: pa.Table) -> pa.Table:
            lv = ray.get(lab_ref)
            src = t.column("src").to_numpy()
            li = lv[np.searchsorted(nodes, src)]
            g = pa.table({"dst": t.column("dst"),
                          "lab": pa.array(li),
                          "w": t.column("w")})
            return (g.group_by(["dst", "lab"]).aggregate([("w", "sum")])
                    .rename_columns(["dst", "lab", "w"]))

        grid = (arcs.map_batches(tally, batch_format="pyarrow")
                .groupby(["dst", "lab"]).aggregate(Sum("w", alias_name="w"))
                .take_all())
        if not grid:
            break
        d = np.array([r["dst"] for r in grid], np.int64)
        gl = np.array([r["lab"] for r in grid], np.int64)
        w = np.array([r["w"] for r in grid], np.int64)
        order = np.lexsort((gl, -w, d))
        d, gl = d[order], gl[order]
        first = np.empty(len(d), bool)
        first[0] = True
        first[1:] = d[1:] != d[:-1]
        new = lab.copy()
        new[np.searchsorted(nodes, d[first])] = gl[first]
        lab = new
    return pa.table({"node": pa.array(nodes), "label": pa.array(lab)})


def nav_entry_exit(sf_dir: str, *, gap_minutes: int = 30) -> "object":
    """Session ENTRY/EXIT/BOUNCE page analytics over the click log:
    per node, how many 30-min-gap sessions START there (the landing
    page), END there (the exit page), and consist of ONLY that event
    (bounce).  The session segmentation is `rel_sessionize`'s exact
    rule ((ts, event_id) order, gap > 30 min); one groupby(user)
    exchange produces per-group (node, entries, exits, bounces)
    partials (np.unique pre-combine) and one small groupby(node)
    finishes.  Columns: node, entries, exits, bounces sorted by
    node."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    gap_us = np.int64(gap_minutes) * 60_000_000

    def partial(group: pa.Table) -> pa.Table:
        ts = (group.column("ts").to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        eid = group.column("event_id").to_numpy()
        node = group.column("node").to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts))
        ts, node = ts[order], node[order]
        new = np.ones(len(ts), bool)
        new[1:] = np.diff(ts) > gap_us
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ts)) - 1
        entry_n = node[starts]
        exit_n = node[ends]
        bounce_n = node[starts[starts == ends]]
        nodes = np.unique(np.concatenate([entry_n, exit_n, bounce_n]))

        def cnt(vals):
            out = np.zeros(len(nodes), np.int64)
            u, c = np.unique(vals, return_counts=True)
            out[np.searchsorted(nodes, u)] = c
            return out

        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "e": pa.array(cnt(entry_n)),
                         "x": pa.array(cnt(exit_n)),
                         "b": pa.array(cnt(bounce_n))})

    return (nav_events(sf_dir).groupby("user_id")
            .map_groups(partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("e", alias_name="entries"),
                       Sum("x", alias_name="exits"),
                       Sum("b", alias_name="bounces"))
            .sort("node"))


def nav_attribution(sf_dir: str, *, window_days: int = 7) -> "object":
    """LAST-TOUCH ATTRIBUTION over the click log: each 'purchase'
    event's value (exact cents) is credited to the page of the most
    recent PRECEDING non-purchase event by the same user within
    ``window_days`` ((ts, event_id) order; purchases with no
    qualifying touch are dropped).  The marketing-analytics join every
    event pipeline runs; same one-exchange groupby(user) shape as
    sessionize, with per-group vectorized searchsorted attribution and
    a small groupby(node) finish.  Columns: node, n_conversions,
    revenue_cents sorted by node."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from hedonic_ray.context import configure_context

    configure_context()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type", "value", "props"])

    def ext(t: pa.Table) -> pa.Table:
        s = pc.extract_regex(t.column("props"), pattern=_K_PATTERN)
        return pa.table({
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "cents": pa.array(np.rint(
                t.column("value").to_numpy() * 100.0).astype(np.int64)),
            "node": pc.cast(pc.struct_field(s, "node"), pa.int64())})

    win_us = np.int64(window_days) * 86_400_000_000

    def partial(group: pa.Table) -> pa.Table:
        ts = (group.column("ts").to_numpy()
              .astype("datetime64[us]").astype(np.int64))
        eid = group.column("event_id").to_numpy()
        order = np.lexsort((eid, ts))
        ts = ts[order]
        node = group.column("node").to_numpy().astype(np.int64)[order]
        cents = group.column("cents").to_numpy().astype(np.int64)[order]
        is_p = (group.column("event_type").to_numpy(zero_copy_only=False)
                .astype(str) == "purchase")[order]
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        touch_idx = np.flatnonzero(~is_p)
        conv_idx = np.flatnonzero(is_p)
        if len(touch_idx) == 0 or len(conv_idx) == 0:
            return empty
        # index of the last touch STRICTLY before each conversion
        pos = np.searchsorted(touch_idx, conv_idx) - 1
        ok = pos >= 0
        conv_idx, pos = conv_idx[ok], pos[ok]
        t_idx = touch_idx[pos]
        ok = ts[conv_idx] - ts[t_idx] <= win_us
        conv_idx, t_idx = conv_idx[ok], t_idx[ok]
        if len(conv_idx) == 0:
            return empty
        nodes, inv = np.unique(node[t_idx], return_inverse=True)
        n = np.bincount(inv, minlength=len(nodes)).astype(np.int64)
        rev = np.zeros(len(nodes), np.int64)
        np.add.at(rev, inv, cents[conv_idx])
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "n": pa.array(n),
                         "cents": pa.array(rev, pa.int64())})

    return (ds.map_batches(ext, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("n", alias_name="n_conversions"),
                       Sum("cents", alias_name="revenue_cents"))
            .sort("node"))


def nav_rich_club(sf_dir: str) -> pa.Table:
    """RICH-CLUB coefficient profile of the undirected navigation
    graph (Zhou & Mondragón 2004; Colizza et al. 2006 normalization
    left to the caller): for every degree threshold ``k`` below the
    max degree, φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph
    induced by nodes of degree > k, as the exact floor integer
    ``phi_e6``.  Rows with N_k < 2 (φ undefined) are dropped.

    Closed-form from TWO histograms — no per-k subgraph pass: N_k is
    a suffix sum of the degree histogram, and E_k is a suffix sum of
    the histogram of per-edge MIN endpoint degree (an edge survives
    the induction at threshold k iff min(deg_a, deg_b) > k).  One
    distinct-edge groupby, one degree groupby, one broadcast
    deg-lookup pass over the edges; the driver only ever holds the
    two histograms."""
    import ray
    from ray.data.aggregate import Count, Sum

    arcs = nav_arcs(sf_dir)

    def undir(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy().astype(np.int64)
        dst = t.column("dst").to_numpy().astype(np.int64)
        return pa.table({"a": pa.array(np.minimum(src, dst)),
                         "b": pa.array(np.maximum(src, dst))})

    und = (arcs.map_batches(undir, batch_format="pyarrow")
           .groupby(["a", "b"])
           .aggregate(Count(alias_name="_c"))
           .drop_columns(["_c"]).materialize())

    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"v": pa.array(np.concatenate(
            [t.column("a").to_numpy(), t.column("b").to_numpy()]),
            pa.int64())})

    vs, ds_ = [], []
    for b in (und.map_batches(ends, batch_format="pyarrow")
              .groupby("v").aggregate(Count(alias_name="d"))
              .iter_batches(batch_size=65536, batch_format="pyarrow")):
        vs.append(b.column("v").to_numpy())
        ds_.append(b.column("d").to_numpy())
    v = np.concatenate(vs) if vs else np.empty(0, np.int64)
    d = np.concatenate(ds_) if ds_ else np.empty(0, np.int64)
    order = np.argsort(v)
    dref = ray.put((v[order], d[order].astype(np.int64)))

    def min_deg_partial(t: pa.Table) -> pa.Table:
        keys, dd = ray.get(dref)
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        md = np.minimum(dd[np.searchsorted(keys, a)],
                        dd[np.searchsorted(keys, b)])
        u, c = np.unique(md, return_counts=True)
        return pa.table({"md": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64))})

    mh = (und.map_batches(min_deg_partial, batch_format="pyarrow")
          .groupby("md").aggregate(Sum("cnt", alias_name="n"))
          .take_all())
    maxd = int(d.max()) if len(d) else 0
    dh = np.bincount(d, minlength=maxd + 1)
    eh = np.zeros(maxd + 1, np.int64)
    for r in mh:
        eh[int(r["md"])] = int(r["n"])
    # suffix sums: N_k = #nodes deg > k, E_k = #edges min-deg > k
    nk = np.cumsum(dh[::-1])[::-1]
    ek = np.cumsum(eh[::-1])[::-1]
    ks = np.arange(maxd, dtype=np.int64)
    n_rich = np.append(nk, 0)[ks + 1]
    e_rich = np.append(ek, 0)[ks + 1]
    keep = n_rich >= 2
    ks, n_rich, e_rich = ks[keep], n_rich[keep], e_rich[keep]
    phi = (2_000_000 * e_rich) // (n_rich * (n_rich - 1))
    return pa.table({"k": pa.array(ks, pa.int64()),
                     "n_rich": pa.array(n_rich.astype(np.int64)),
                     "e_rich": pa.array(e_rich.astype(np.int64)),
                     "phi_e6": pa.array(phi.astype(np.int64))})
