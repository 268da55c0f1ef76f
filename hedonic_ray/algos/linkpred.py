"""Link-prediction / graph-shape primitives over the undirected CSR
LinkGraph: degree assortativity and common-neighbor candidate scoring.

Not in the reference repo (its similarity notions are community-level,
``hedonic/__init__.py:300-340``); these are the standard hyperlink-
graph structure signals (Newman 2002 assortativity; common-neighbors
link prediction, Liben-Nowell & Kleinberg 2003).

Shapes:

- ``degree_assortativity``: a pure REDUCTION — each CSR block emits one
  int64 sufficient-stats row (m2, Σx, Σx², Σxy over its arcs, degrees
  read from a broadcast array), the driver sums ≤ num_parts rows with
  arbitrary-precision Python ints and applies the exact rational
  ``r = (m2·Σxy − Σx²ᵖᵃᶦʳ) / (m2·Σx² − (Σx)²)``.  No shuffle at all.
- ``common_neighbors_topk``: full wedge enumeration per block (every
  center vertex's neighbor pairs — O(Σ deg²) wedge rows, pre-combined
  per task with ``np.unique``), ONE ``groupby(pair_key)`` exchange,
  then a vectorized non-adjacency filter against the broadcast
  canonical edge set and a per-batch local top-k combiner; the driver
  merges ≤ k rows per block.  Hub vertices make Σ deg² the scale
  hazard — ``max_degree`` skips centers above the cap (documented
  UNDER-approximation, default None/exact; the gate corpus is
  hub-free by construction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import iter_block_views

_PAIR_CHUNK = 8_000_000


def degree_assortativity(g) -> pa.Table:
    """One-row exact integer degree-assortativity statistics of an
    undirected LinkGraph: over the 2m (symmetric) arcs, with
    x = deg(src), y = deg(dst):

        m2, sx = Σx, sxx = Σx², sxy = Σxy          (int64 exact)
        r_e6 = trunc(10⁶ · (m2·sxy − sx²) / (m2·sxx − sx²))

    Symmetry makes sy ≡ sx and syy ≡ sxx, so the Pearson r of the
    degree pairs is the single rational above — no float anywhere
    (truncation toward zero matches SQL ``//``).  r_e6 = 0 when the
    variance vanishes (regular graph)."""
    import ray

    if g.directed:
        raise ValueError("degree_assortativity needs an undirected graph")
    deg_ref = ray.put(g.out_degree.astype(np.int64))

    def stats(batch: pa.Table) -> pa.Table:
        deg = ray.get(deg_ref)
        m2 = sx = sxx = sxy = 0
        for bv in iter_block_views(batch):
            x = deg[bv.src_per_edge()]
            y = deg[bv.indices]
            m2 += len(x)
            sx += int(x.sum())
            sxx += int((x * x).sum())
            sxy += int((x * y).sum())
        return pa.table({"m2": pa.array([m2], pa.int64()),
                         "sx": pa.array([sx], pa.int64()),
                         "sxx": pa.array([sxx], pa.int64()),
                         "sxy": pa.array([sxy], pa.int64())})

    rows = g.blocks.map_batches(stats, batch_format="pyarrow",
                                batch_size=4).take_all()
    m2 = sum(int(r["m2"]) for r in rows)
    sx = sum(int(r["sx"]) for r in rows)
    sxx = sum(int(r["sxx"]) for r in rows)
    sxy = sum(int(r["sxy"]) for r in rows)
    num = m2 * sxy - sx * sx          # Python ints: no overflow at any scale
    den = m2 * sxx - sx * sx
    r_e6 = 0
    if den > 0:
        a = abs(num) * 1_000_000 // den
        r_e6 = a if num >= 0 else -a
    return pa.table({"m2": pa.array([m2], pa.int64()),
                     "sx": pa.array([sx], pa.int64()),
                     "sxx": pa.array([sxx], pa.int64()),
                     "sxy": pa.array([sxy], pa.int64()),
                     "r_e6": pa.array([r_e6], pa.int64())})


def _full_segments(bv):
    """A block's FULL adjacency (no orientation filter), neighbor-id
    sorted per source — every wedge through every local center."""
    src = bv.src_per_edge()
    order = np.lexsort((bv.indices, src))
    return bv.indptr.astype(np.int64), bv.indices[order]


def _center_pairs_batch(batch: pa.Table, n_: int, max_degree,
                        weight: str | None = None) -> pa.Table:
    """Wedge rows per block.  ``weight=None`` scores each wedge 1
    (common-neighbor counting); ``weight="ra"`` scores it
    ``10⁹ // deg(center)`` (resource-allocation index);
    ``weight="aa"`` scores it ``10¹² // floor(10⁶·ln(deg(center)))``
    (Adamic–Adar, exact-integer quantized: a wedge center always has
    degree ≥ 2, so the quantized log is ≥ 693147 and the division is
    safe; ln of a small-int degree lands far from floor boundaries,
    so libm-vs-DuckDB last-ulp drift cannot flip it).  The center's
    degree is its full segment length, local to the block, so no
    broadcast is needed."""
    from hedonic_ray.algos.triangles import _ordered_pairs

    n = np.int64(n_)
    parts: list[np.ndarray] = []
    wparts: list[np.ndarray] = []
    for bv in iter_block_views(batch):
        indptr, srt = _full_segments(bv)
        nv = bv.hi - bv.lo
        cnt = np.diff(indptr)
        if max_degree is not None:
            # drop capped hubs' segments wholesale (documented
            # under-approximation) by zeroing them out of the decode
            hot = np.flatnonzero(cnt > max_degree)
            if len(hot):
                keep = np.ones(len(srt), dtype=bool)
                for h in hot:
                    keep[indptr[h]:indptr[h + 1]] = False
                srt = srt[keep]
                cnt = np.where(cnt > max_degree, 0, cnt)
                indptr = np.zeros(nv + 1, dtype=np.int64)
                np.cumsum(cnt, out=indptr[1:])
        wvec = None
        if weight == "ra":
            wvec = np.floor_divide(np.int64(1_000_000_000),
                                   np.maximum(cnt, 1))
        elif weight == "aa":
            lnq = np.floor(1e6 * np.log(np.maximum(cnt, 2))) \
                .astype(np.int64)
            wvec = np.floor_divide(np.int64(1_000_000_000_000), lnq)
        lo_u = 0
        while lo_u < nv:
            hi_u = lo_u
            pairs = 0
            while hi_u < nv and (pairs == 0 or pairs < _PAIR_CHUNK):
                pairs += int(cnt[hi_u] * (cnt[hi_u] - 1) // 2)
                hi_u += 1
            u, a, b = _ordered_pairs(indptr, srt, lo_u, hi_u)
            if len(a):
                parts.append(a * n + b)
                if wvec is not None:
                    wparts.append(wvec[u])
            lo_u = hi_u
    if not parts:
        return pa.table({"key": pa.array([], pa.int64()),
                         "val": pa.array([], pa.int64())})
    keys = np.concatenate(parts)
    uk, inv = np.unique(keys, return_inverse=True)
    if weight is not None:
        uc = np.zeros(len(uk), np.int64)
        np.add.at(uc, inv, np.concatenate(wparts))
    else:
        uc = np.bincount(inv, minlength=len(uk)).astype(np.int64)
    return pa.table({"key": pa.array(uk, pa.int64()),
                     "val": pa.array(uc, pa.int64())})


def common_neighbors_topk(g, k: int = 20, max_degree=None) -> pa.Table:
    """Top-k NON-adjacent vertex pairs by common-neighbor count
    (the classic link-prediction ranking): ``(a, b, common)`` sorted by
    (common desc, a, b) — integer-exact, deterministic ties.

    Adjacent pairs are excluded (predicting existing edges is vacuous)
    via a vectorized ``searchsorted`` against the broadcast canonical
    edge keys; top-k runs as a per-batch combiner before the ≤
    k·blocks driver merge."""
    return _pair_score_topk(g, k, max_degree, weight=None,
                            score_col="common")


def resource_allocation_topk(g, k: int = 20, max_degree=None) -> pa.Table:
    """Top-k non-adjacent pairs by the RESOURCE-ALLOCATION index (Zhou,
    Lü & Zhang 2009) — each common neighbor z contributes 1/deg(z),
    scored as the exact integer ``Σ 10⁹ // deg(z)`` so the ranking is
    float-free and SQL-mirrorable: ``(a, b, ra_e9)`` sorted by
    (ra_e9 desc, a, b).  Same single-exchange wedge pipeline as
    :func:`common_neighbors_topk`; the weight is block-local (the
    center's own segment length), so the weighted variant broadcasts
    nothing extra."""
    return _pair_score_topk(g, k, max_degree, weight="ra",
                            score_col="ra_e9")


def adamic_adar_topk(g, k: int = 20, max_degree=None) -> pa.Table:
    """Top-k non-adjacent pairs by the ADAMIC–ADAR index (Adamic &
    Adar 2003) — each common neighbor z contributes ``1/ln(deg(z))``,
    scored as the exact integer ``Σ 10¹² // floor(10⁶·ln(deg(z)))``
    so the ranking is float-free and SQL-mirrorable: ``(a, b, aa_e6)``
    sorted by (aa_e6 desc, a, b).  The log-damped companion of
    :func:`resource_allocation_topk` (RA damps hubs harder); same
    single-exchange wedge pipeline, block-local weights."""
    return _pair_score_topk(g, k, max_degree, weight="aa",
                            score_col="aa_e6")


def _pair_score_topk(g, k: int, max_degree, weight: str | None,
                     score_col: str) -> pa.Table:
    import ray

    if g.directed:
        raise ValueError("pair-score top-k needs an undirected graph")
    n = g.n
    assert n < (1 << 31), "pair keys pack two ids into int64"

    canon_chunks: list[np.ndarray] = []
    for batch in g.blocks.iter_batches(batch_size=4, batch_format="pyarrow"):
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            keep = src < bv.indices  # each undirected edge once
            canon_chunks.append(src[keep] * np.int64(n) + bv.indices[keep])
    canon = np.sort(np.concatenate(canon_chunks)) if canon_chunks \
        else np.empty(0, np.int64)
    canon_ref = ray.put(canon)

    from ray.data.aggregate import Sum

    msgs = g.blocks.map_batches(
        lambda t: _center_pairs_batch(t, n, max_degree, weight),
        batch_format="pyarrow", batch_size=1)
    counts = msgs.groupby("key").aggregate(Sum("val", alias_name=score_col))

    def local_topk(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          score_col: pa.array([], pa.int64())})
        if t.num_rows == 0 or "key" not in t.column_names:
            return empty
        key = t.column("key").to_numpy().astype(np.int64)
        score = t.column(score_col).to_numpy().astype(np.int64)
        edges = ray.get(canon_ref)
        if len(edges):
            pos = np.searchsorted(edges, key)
            adj = ((pos < len(edges))
                   & (edges[np.minimum(pos, len(edges) - 1)] == key))
            key, score = key[~adj], score[~adj]
        order = np.lexsort((key, -score))[:k]
        return pa.table({"key": pa.array(key[order], pa.int64()),
                         score_col: pa.array(score[order], pa.int64())})

    rows = counts.map_batches(local_topk, batch_format="pyarrow").take_all()
    key = np.array([r["key"] for r in rows], dtype=np.int64)
    score = np.array([r[score_col] for r in rows], dtype=np.int64)
    order = np.lexsort((key, -score))[:k]
    key, score = key[order], score[order]
    return pa.table({"a": pa.array(key // n, pa.int64()),
                     "b": pa.array(key % n, pa.int64()),
                     score_col: pa.array(score, pa.int64())})


def two_hop_counts(g) -> pa.Table:
    """|N≤2(v)| for every vertex of an undirected LinkGraph: the
    number of DISTINCT other vertices within two hops (the classic
    neighborhood-growth / supernode-risk signal for web graphs).

    Shape: the wedge decode already enumerates every distance-2 pair
    through each center (same kernel as common-neighbors), so the
    2-hop closure is wedge pairs ∪ direct edges — one distinct
    exchange on the packed pair key, then each surviving pair votes
    +1 for both endpoints into a vertex-keyed count.  Σ deg² wedge
    rows bound the exchange exactly as in
    :func:`common_neighbors_topk` (same ``max_degree`` hazard note).
    """
    from ray.data.aggregate import Count, Sum

    if g.directed:
        raise ValueError("two_hop_counts needs an undirected graph")
    n = g.n
    assert n < (1 << 31), "pair keys pack two ids into int64"

    wedge_keys = g.blocks.map_batches(
        lambda t: _center_pairs_batch(t, n, None).select(["key"]),
        batch_format="pyarrow", batch_size=1)

    def edge_keys(batch: pa.Table) -> pa.Table:
        parts = []
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            keep = src < bv.indices
            parts.append(src[keep] * np.int64(n) + bv.indices[keep])
        k = np.concatenate(parts) if parts else np.empty(0, np.int64)
        return pa.table({"key": pa.array(np.unique(k), pa.int64())})

    closure = wedge_keys.union(
        g.blocks.map_batches(edge_keys, batch_format="pyarrow",
                             batch_size=4))
    distinct = closure.groupby("key").aggregate(Count(alias_name="_c"))

    def endpoints(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy().astype(np.int64)
        v = np.concatenate([key // n, key % n])
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64))})

    rows = (distinct.map_batches(endpoints, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("c", alias_name="n_2hop"))
            .take_all())
    out = np.zeros(n, dtype=np.int64)
    for r in rows:
        out[int(r["v"])] = int(r["n_2hop"])
    return pa.table({"vertex": pa.array(np.arange(n, dtype=np.int64)),
                     "n_2hop": pa.array(out)})


def avg_neighbor_degree(g) -> pa.Table:
    """Average neighbor degree per vertex (the local form of the
    assortativity signal — hub-adjacency profile): ``(vertex, degree,
    sum_nbr_deg, avg_nbr_deg_e9)`` with the average as the exact
    ``Σdeg(nbr)·10⁹ // deg`` integer, 0 for isolated vertices.  One
    scatter over the CSR blocks against the broadcast degree array —
    partial sums per block, driver combine of ≤ blocks vectors
    (the triangles dense-gather posture)."""
    import ray

    if g.directed:
        raise ValueError("avg_neighbor_degree needs an undirected graph")
    deg = g.out_degree.astype(np.int64)
    deg_ref = ray.put(deg)
    n = g.n

    def partial(batch: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        acc = np.zeros(n, np.int64)
        for bv in iter_block_views(batch):
            np.add.at(acc, bv.src_per_edge(), d[bv.indices])
        return pa.table({"s": pa.array([acc])})  # one dense-vector row

    parts = g.blocks.map_batches(partial, batch_format="pyarrow",
                                 batch_size=4).take_all()
    s = np.zeros(n, np.int64)
    for r in parts:
        s += np.asarray(r["s"], dtype=np.int64)
    avg = np.zeros(n, np.int64)
    np.floor_divide(s * np.int64(1_000_000_000), deg, out=avg,
                    where=deg > 0)
    return pa.table({"vertex": pa.array(np.arange(n, dtype=np.int64)),
                     "degree": pa.array(deg),
                     "sum_nbr_deg": pa.array(s),
                     "avg_nbr_deg_e9": pa.array(avg)})


def deterministic_walks(g, *, stride: int = 101, steps: int = 5) -> pa.Table:
    """DETERMINISTIC RANDOM WALKS (the DeepWalk/node2vec sampling
    stage, made oracle-checkable): from every seed vertex (id % stride
    == 0), walk ``steps`` hops where the next vertex is the
    ``md5_low64(f"{v}-{step}") % deg(v)``-th neighbor in ascending-id
    order — a cross-engine-reproducible hash choice instead of an
    RNG.  Walks stop at isolated vertices.  Returns (seed, step,
    vertex) incl. step 0, sorted.

    Shape: the walker frontier is tiny (seeds), so each hop is ONE
    ``map_batches`` over the CSR blocks with the walker set broadcast
    — a block advances exactly the walkers whose current vertex it
    owns; the driver carries only the walker array between hops."""
    import ray
    from hedonic_ray.ops.dedup import md5_low64

    if g.directed:
        raise ValueError("deterministic_walks needs an undirected graph")
    n = g.n
    seeds = np.arange(0, n, stride, dtype=np.int64)
    cur = seeds.copy()
    alive = np.ones(len(seeds), bool)
    out_seed = [seeds.copy()]
    out_step = [np.zeros(len(seeds), np.int64)]
    out_vert = [seeds.copy()]

    for step in range(steps):
        walkers = np.flatnonzero(alive)
        if not len(walkers):
            break
        wv = cur[walkers]
        # the md5 pick depends only on (current vertex, step) — hash
        # the O(walkers) frontier ONCE on the driver and broadcast, so
        # the block tasks are pure numpy
        hashes = np.fromiter((md5_low64(f"{int(v)}-{step}") for v in wv),
                             dtype=np.uint64, count=len(wv))
        w_ref = ray.put((walkers, wv, hashes))

        def advance(batch: pa.Table) -> pa.Table:
            widx, wvert, wh = ray.get(w_ref)
            outs_w, outs_next = [], []
            for bv in iter_block_views(batch):
                sel = np.flatnonzero((wvert >= bv.lo) & (wvert < bv.hi))
                if not len(sel):
                    continue
                indptr = bv.indptr.astype(np.int64)
                l = indptr[wvert[sel] - bv.lo]
                r = indptr[wvert[sel] - bv.lo + 1]
                deg = r - l
                live = deg > 0
                sel, l, deg = sel[live], l[live], deg[live]
                if not len(sel):
                    continue
                # gather all walker segments, sort within segment with
                # ONE lexsort, pick via the broadcast hashes — no
                # per-walker Python
                total = int(deg.sum())
                starts = np.cumsum(deg) - deg
                pos = np.arange(total, dtype=np.int64) - np.repeat(starts,
                                                                   deg)
                vals = bv.indices[np.repeat(l, deg) + pos]
                seg_of = np.repeat(np.arange(len(sel)), deg)
                order = np.lexsort((vals, seg_of))
                picked = vals[order][starts + (wh[sel] % deg.astype(
                    np.uint64)).astype(np.int64)]
                outs_w.append(widx[sel].astype(np.int64))
                outs_next.append(picked.astype(np.int64))
            if not outs_w:
                return pa.table({"w": pa.array([], pa.int64()),
                                 "nxt": pa.array([], pa.int64())})
            return pa.table({"w": pa.array(np.concatenate(outs_w)),
                             "nxt": pa.array(np.concatenate(outs_next))})

        rows = g.blocks.map_batches(advance, batch_format="pyarrow",
                                    batch_size=4).take_all()
        moved = np.zeros(len(seeds), bool)
        for r in rows:
            cur[int(r["w"])] = int(r["nxt"])
            moved[int(r["w"])] = True
        alive &= moved
        live = np.flatnonzero(alive)
        out_seed.append(seeds[live])
        out_step.append(np.full(len(live), step + 1, np.int64))
        out_vert.append(cur[live])

    t = pa.table({"seed": pa.array(np.concatenate(out_seed)),
                  "step": pa.array(np.concatenate(out_step)),
                  "vertex": pa.array(np.concatenate(out_vert))})
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("seed", "ascending"),
                                                ("step", "ascending")]))


def directed_wedge_topk(g, k: int = 20, max_degree=None,
                        score_col: str = "cnt") -> pa.Table:
    """Top-k vertex pairs by shared-center count over a DIRECTED
    graph's out-segments: on the forward graph this is CO-CITATION
    (Small 1973 — # pages that link to both a and b); on the
    transposed graph it is BIBLIOGRAPHIC COUPLING (Kessler 1963 —
    # pages both a and b link to).  The directed twin of
    :func:`common_neighbors_topk`: same single-exchange wedge pipeline
    (`_center_pairs_batch` over each center's out-neighbors), but NO
    adjacency exclusion — co-citation of linked pages is meaningful —
    and pairs keep their natural (a < b) id order.  ``(a, b, cnt)``
    sorted by (cnt desc, a, b); ties deterministic."""
    from ray.data.aggregate import Sum

    if not g.directed:
        raise ValueError("directed_wedge_topk needs a directed graph")
    n = g.n
    assert n < (1 << 31), "pair keys pack two ids into int64"

    msgs = g.blocks.map_batches(
        lambda t: _center_pairs_batch(t, n, max_degree, None),
        batch_format="pyarrow", batch_size=1)
    counts = msgs.groupby("key").aggregate(Sum("val",
                                               alias_name=score_col))

    def local_topk(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          score_col: pa.array([], pa.int64())})
        if t.num_rows == 0 or "key" not in t.column_names:
            return empty
        key = t.column("key").to_numpy().astype(np.int64)
        score = t.column(score_col).to_numpy().astype(np.int64)
        order = np.lexsort((key, -score))[:k]
        return pa.table({"key": pa.array(key[order], pa.int64()),
                         score_col: pa.array(score[order], pa.int64())})

    rows = counts.map_batches(local_topk, batch_format="pyarrow").take_all()
    key = np.array([r["key"] for r in rows], dtype=np.int64)
    score = np.array([r[score_col] for r in rows], dtype=np.int64)
    order = np.lexsort((key, -score))[:k]
    key, score = key[order], score[order]
    return pa.table({"a": pa.array(key // n, pa.int64()),
                     "b": pa.array(key % n, pa.int64()),
                     score_col: pa.array(score, pa.int64())})


def graphlet_orbits(g) -> pa.Table:
    """3-node GRAPHLET ORBIT counts per vertex (the degree / path-end
    / path-center / triangle-corner profile — the feature row graphlet
    kernels and GNN positional features start from; Pržulj 2007
    orbits 0–3).  Induced closed forms from two existing kernels:

        o0 = deg(v)
        o1 (path end)    = Σ_{u∈N(v)} (deg(u)−1) − 2·tri(v)
        o2 (path center) = C(deg(v), 2) − tri(v)
        o3 (triangle corner) = tri(v)

    — one neighbor-degree scatter (`avg_neighbor_degree`'s partial)
    plus the oriented-wedge triangle count; everything exact int64."""
    import ray

    from hedonic_ray.algos.triangles import triangle_count

    if g.directed:
        raise ValueError("graphlet_orbits needs an undirected graph")
    deg = g.out_degree.astype(np.int64)
    deg_ref = ray.put(deg)
    n = g.n

    def partial(batch: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        acc = np.zeros(n, np.int64)
        for bv in iter_block_views(batch):
            np.add.at(acc, bv.src_per_edge(), d[bv.indices])
        return pa.table({"s": pa.array([acc])})

    parts = g.blocks.map_batches(partial, batch_format="pyarrow",
                                 batch_size=4).take_all()
    s = np.zeros(n, np.int64)
    for r in parts:
        s += np.asarray(r["s"], dtype=np.int64)
    tri = np.asarray(triangle_count(g).per_vertex, dtype=np.int64)
    o1 = s - deg - 2 * tri
    o2 = deg * (deg - 1) // 2 - tri
    return pa.table({
        "vertex": pa.array(np.arange(n, dtype=np.int64)),
        "deg": pa.array(deg),
        "path_end": pa.array(o1),
        "path_center": pa.array(o2),
        "tri_corner": pa.array(tri)})
