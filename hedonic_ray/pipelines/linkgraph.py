"""End-to-end link-graph pipelines over the driver testdata.

``pages_from_documents`` renders ``documents.parquet`` into
Common-Crawl-style pages with a planted arithmetic link formula; these
pipelines run the full extract → graph → superstep stack on them and
power ``__ray_entry__`` (entry / queries / oracle_sql).

Vertex ids: urls are zero-padded doc ids, so the sorted-url dense rank
equals ``doc_id`` — the SQL oracles join directly on doc_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.algos.components import connected_components
from hedonic_ray.algos.hedonic import hedonic_communities
from hedonic_ray.algos.labelprop import label_propagation, onepass_improvement
from hedonic_ray.algos.pagerank import pagerank
from hedonic_ray.algos.triangles import triangle_count
from hedonic_ray.context import configure_context
from hedonic_ray.graph.build import (
    assign_vertex_ids,
    build_link_graph,
    canonicalize_edges,
    edges_from_numpy,
    edges_from_pages,
)
from hedonic_ray.sources.synth import pages_from_documents

_GRAPH_CACHE: dict = {}


def doc_pages(sf_dir: str):
    configure_context()
    return pages_from_documents(sf_dir)


def doc_graph(sf_dir: str, *, directed: bool):
    """pages → extract → CSR-block LinkGraph (cached per sf_dir within
    the RAY SESSION; extraction runs ONCE, the materialized edge table
    feeds both the directed and undirected builds; a ray re-init
    clears the cache — dead ObjectRefs must not survive it)."""
    from hedonic_ray.context import session_scoped

    session_scoped(_GRAPH_CACHE)
    key = (sf_dir, directed)
    if key not in _GRAPH_CACHE:
        ekey = (sf_dir, "edges")
        if ekey not in _GRAPH_CACHE:
            pages = doc_pages(sf_dir)
            urls_ref, n = assign_vertex_ids(pages)
            _GRAPH_CACHE[ekey] = (
                edges_from_pages(pages, urls_ref).materialize(), urls_ref, n)
        edges, urls_ref, n = _GRAPH_CACHE[ekey]
        _GRAPH_CACHE[key] = build_link_graph(edges, n, directed=directed,
                                             urls_ref=urls_ref)
    return _GRAPH_CACHE[key]


def doc_edges_cached(sf_dir: str):
    """The materialized canonical edge Dataset (the accessor that OWNS
    the (sf_dir, "edges") cache entry — callers must not reach into
    _GRAPH_CACHE directly)."""
    doc_graph(sf_dir, directed=True)   # populates the edges entry
    edges, _urls, _n = _GRAPH_CACHE[(sf_dir, "edges")]
    return edges


def doc_edges_table(sf_dir: str) -> pa.Table:
    """Canonical directed deduped edge table of the planted doc-link
    graph (self-loops dropped), sorted."""
    pages = doc_pages(sf_dir)
    urls_ref, n = assign_vertex_ids(pages)
    edges = edges_from_pages(pages, urls_ref)
    canon = canonicalize_edges(edges, n, directed=True)
    batches = [b.select(["src", "dst"])
               for b in canon.sort(["src", "dst"]).iter_batches(
                   batch_size=65536, batch_format="pyarrow")
               if b.num_rows]
    if not batches:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    return pa.concat_tables(batches).combine_chunks()


def extracted_text_table(sf_dir: str):
    """(doc_id, text) re-extracted from html — byte-identical to
    documents.text (the per-url invariant, SQL-checked)."""
    from hedonic_ray.functions.extract import BodyExtract
    from hedonic_ray.context import actor_pool

    pages = doc_pages(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        ex = BodyExtract()
        out = ex(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": out.column("text")})

    return pages.map_batches(f, batch_format="pyarrow", batch_size=2048)


def doc_degree_table(sf_dir: str) -> pa.Table:
    """Undirected degree per vertex of the doc-link graph (vertices with
    degree 0 omitted, matching the SQL oracle's groupby)."""
    g = doc_graph(sf_dir, directed=False)
    deg = g.out_degree  # symmetrized adjacency degree
    nz = np.flatnonzero(deg)
    return pa.table({"vertex": pa.array(nz, pa.int64()),
                     "degree": pa.array(deg[nz], pa.int64())})


def doc_pagerank_table(sf_dir: str, *, max_iters: int = 1) -> pa.Table:
    """Rank as scaled BIGINT (×1e9): cross-engine summation-order noise is ~1e-19, far below the e9 grid."""
    g = doc_graph(sf_dir, directed=True)
    res = pagerank(g, max_iters=max_iters, tol=0.0 if max_iters == 1 else 1e-12)
    rank = np.round(res.state["rank"] * 1e9).astype(np.int64)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "rank_e9": pa.array(rank, pa.int64())})


def doc_pagerank_full(sf_dir: str, *, iters: int = 5) -> pa.Table:
    """PageRank at a FIXED iteration count, rank × 1e9 as BIGINT — a
    bounded power iteration is exactly reproducible as a chained-CTE
    SQL oracle, where run-to-convergence is not (the convergence test
    itself is float-order-sensitive)."""
    g = doc_graph(sf_dir, directed=True)
    res = pagerank(g, max_iters=iters, tol=0.0)
    rank = np.round(res.state["rank"] * 1e9).astype(np.int64)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "rank_e9": pa.array(rank, pa.int64())})


def doc_components_table(sf_dir: str) -> pa.Table:
    g = doc_graph(sf_dir, directed=False)
    res = connected_components(g)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "component": pa.array(res.state["component"], pa.int64())})


def hedonic_converged(sf_dir: str):
    """Run-to-convergence hedonic game on the doc graph, cached per
    sf_dir (the certificate, spectrum and flagship all analyze the same
    converged state — one 200-iteration run per process, not three)."""
    key = (sf_dir, "hedonic200")
    if key not in _GRAPH_CACHE:
        g = doc_graph(sf_dir, directed=False)
        _GRAPH_CACHE[key] = hedonic_communities(g, max_iters=200)
    return _GRAPH_CACHE[key]


def doc_hedonic_table(sf_dir: str) -> pa.Table:
    """Converged hedonic run + independently recomputed Nash
    certificate (vertex, degree, satisfied).

    Coalition ids are trajectory-dependent (no SQL form), but the
    *property* the run must deliver is not: at α = m/C(n,2) every
    hedonic value comparison is exact integer arithmetic
    (`friends·(den−num) − strangers·num`), so ``satisfied`` — no
    own-or-neighbor coalition strictly better, the sense in which the
    dynamics converge (hedonic/__init__.py:89-94, 230-259) — is
    recomputed from scratch via the analytics gather and must be 1 for
    every vertex.  ``degree`` ties the certificate to the actual built
    graph (the SQL oracle recomputes it from the planted links).  The
    raw partition remains exposed via :func:`flagship` and the pytest
    equilibrium oracles."""
    from hedonic_ray.analytics.hedonic_stats import nash_flags_exact

    g = doc_graph(sf_dir, directed=False)
    res = hedonic_converged(sf_dir)
    n = g.n
    num, den = g.undirected_edge_count, n * (n - 1) // 2
    sat = nash_flags_exact(g, res.state["coalition"], num, den,
                           candidates="adjacent")
    return pa.table({"vertex": pa.array(np.arange(n), pa.int64()),
                     "degree": pa.array(g.out_degree, pa.int64()),
                     "satisfied": pa.array(sat.astype(np.int64), pa.int64())})


def hedonic_strict_converged(sf_dir: str):
    """Run-to-ALL-coalition-equilibrium hedonic game on the doc graph
    (``candidates="all"`` — ROADMAP 7's stricter notion), cached per
    sf_dir."""
    key = (sf_dir, "hedonic_strict")
    if key not in _GRAPH_CACHE:
        g = doc_graph(sf_dir, directed=False)
        _GRAPH_CACHE[key] = hedonic_communities(g, max_iters=200,
                                                candidates="all")
    return _GRAPH_CACHE[key]


def doc_hedonic_strict_table(sf_dir: str) -> pa.Table:
    """STRICT (all-coalition) hedonic equilibrium certificate
    (vertex, degree, satisfied) — the `graph_hedonic` shape with the
    stronger property: ``satisfied`` is recomputed from scratch with
    exact integers over EVERY existing coalition (the reference's
    ``is_in_equilibrium`` sense, hedonic/__init__.py:560-659), not
    just the own + neighbor move set the dynamics converge in, and
    must be 1 for every vertex.  This closes the measured 0.996
    all-coalition fraction gap of the adjacent-candidate run."""
    from hedonic_ray.analytics.hedonic_stats import nash_flags_exact

    g = doc_graph(sf_dir, directed=False)
    res = hedonic_strict_converged(sf_dir)
    n = g.n
    num, den = g.undirected_edge_count, n * (n - 1) // 2
    sat = nash_flags_exact(g, res.state["coalition"], num, den,
                           candidates="all")
    return pa.table({"vertex": pa.array(np.arange(n), pa.int64()),
                     "degree": pa.array(g.out_degree, pa.int64()),
                     "satisfied": pa.array(sat.astype(np.int64), pa.int64())})


def doc_reciprocity(sf_dir: str) -> pa.Table:
    """RECIPROCAL-INVITATION pairs of the reference's reciprocity
    clustering, with the published rule table's always-truthy
    conditionals corrected (`algos/reciprocity.py` — the intended
    semantics of reciprocity_clustering.py:28-43, implemented as the
    2-hop wedge join + per-vertex dominance tournament).  One round
    from the singleton membership; (a, b) with a < b, sorted."""
    from hedonic_ray.algos.reciprocity import reciprocal_pairs

    return reciprocal_pairs(doc_graph(sf_dir, directed=False))


def doc_hedonic_2pass_table(sf_dir: str) -> pa.Table:
    """Two synchronous hedonic best-response passes at resolution 0
    from the singleton partition (``community_onepass_improvement_hedonic``
    iterated, hedonic/__init__.py:282-292).  At α = 0 every hedonic
    value is the INTEGER friend count, so strict-improvement and
    lowest-id tie-breaks are exactly reproducible in SQL — the
    flagship's value arithmetic gets a driver-gate oracle (the
    α = density convergence run stays pytest-verified: float game
    values make cross-engine strict comparisons ill-defined)."""
    mem = hedonic_2pass_membership(sf_dir)
    return pa.table({"vertex": pa.array(np.arange(len(mem)), pa.int64()),
                     "coalition": pa.array(mem, pa.int64())})


def hedonic_2pass_membership(sf_dir: str) -> np.ndarray:
    """Membership after two synchronous α=0 best-response passes —
    the SQL-reproducible partition the exact-integer analytics queries
    are evaluated on (cached per sf_dir)."""
    key = (sf_dir, "hedonic2pass")
    if key not in _GRAPH_CACHE:
        from hedonic_ray.algos.hedonic import HedonicStep
        from hedonic_ray.engine.superstep import run_supersteps

        g = doc_graph(sf_dir, directed=False)
        algo = HedonicStep(resolution=0.0, serial_tail=False)
        res = run_supersteps(g, algo, max_iters=2)
        _GRAPH_CACHE[key] = res.state["coalition"]
    return _GRAPH_CACHE[key]


def doc_labelprop_table(sf_dir: str, *, iters: int = 2) -> pa.Table:
    """Synchronous plurality LP for a FIXED number of rounds (ties →
    lowest label, init label = vertex id) — each round is a pure
    relational transform, so the 2-round result has an exact
    chained-CTE SQL oracle.  Run-to-convergence LP stays available via
    :func:`hedonic_ray.algos.labelprop.label_propagation`."""
    g = doc_graph(sf_dir, directed=False)
    res = label_propagation(g, max_iters=iters)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "label": pa.array(res.state["label"], pa.int64())})


def doc_triangles_table(sf_dir: str) -> pa.Table:
    g = doc_graph(sf_dir, directed=False)
    res = triangle_count(g)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "triangles": pa.array(res.per_vertex, pa.int64())})


def doc_kcore_table(sf_dir: str, k: int = 5, rounds: int = 6) -> pa.Table:
    """Fixed-round k-core membership of the doc-link graph (the query
    semantic is the ``rounds``-round peel, which the SQL oracle
    unrolls; k = 5 splits the gate corpus 100/500 and the peel
    converges in 4 rounds there, so the 6-round unroll equals the
    true k-core with headroom)."""
    from hedonic_ray.algos.kcore import kcore_membership

    g = doc_graph(sf_dir, directed=False)
    alive = kcore_membership(g, k, rounds=rounds)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "in_core": pa.array(alive.astype(np.int64))})


def doc_global_clustering(sf_dir: str) -> pa.Table:
    """GLOBAL clustering coefficient (transitivity) of the undirected
    doc-link graph: one row ``(n_triangles, n_wedges, gcc_e9)`` with
    ``gcc_e9 = 3·T·10⁹ // W`` — exact integers (wedges from the CSR
    degrees, triangles from the distributed wedge probe)."""
    g = doc_graph(sf_dir, directed=False)
    t = int(triangle_count(g).total)
    deg = g.out_degree.astype(object)  # Python ints: no overflow at scale
    w = int(sum(d * (d - 1) // 2 for d in deg.tolist()))
    gcc = (3 * t * 1_000_000_000 // w) if w else 0
    return pa.table({"n_triangles": pa.array([t], pa.int64()),
                     "n_wedges": pa.array([w], pa.int64()),
                     "gcc_e9": pa.array([gcc], pa.int64())})


def doc_clustering_table(sf_dir: str) -> pa.Table:
    """Local clustering coefficient per vertex of the doc-link graph:
    ``2·triangles / (d·(d−1))`` as a floored ×1e9 integer (0 when
    d < 2).  Composes the triangle probe and the CSR degree — both
    integer, so the quotient floors identically in SQL."""
    g = doc_graph(sf_dir, directed=False)
    res = triangle_count(g)
    tri = np.asarray(res.per_vertex, dtype=np.int64)
    deg = g.out_degree.astype(np.int64)
    denom = deg * (deg - 1)
    cc = np.zeros(g.n, dtype=np.int64)
    np.floor_divide(2 * tri * np.int64(1_000_000_000), denom, out=cc,
                    where=denom > 0)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "lcc_e9": pa.array(cc)})


def doc_bfs_table(sf_dir: str, *, rounds: int = 6, stride: int = 101) -> pa.Table:
    """Multi-source BFS hop distance on the doc-link graph from the
    deterministic seed set ``{v : v ≡ 0 (mod stride)}`` (≈ n/stride
    seeds), capped at ``rounds`` hops (−1 beyond).  The fixed-round
    semantic is what the SQL oracle unrolls; the gate graph saturates
    within the unrolled depth, so fixed-round ≡ converged there."""
    from hedonic_ray.algos.bfs import bfs_distances

    g = doc_graph(sf_dir, directed=False)
    seeds = np.arange(0, g.n, stride, dtype=np.int64)
    dist = bfs_distances(g, seeds, rounds=rounds)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "dist": pa.array(dist, pa.int64())})


def doc_harmonic(sf_dir: str, *, seeds=(0, 1, 2),
                 rounds: int = 6) -> pa.Table:
    """RADIUS-CAPPED HARMONIC CENTRALITY of deterministic seed
    vertices, as exact integers: h = Σ_{0 < d(v) ≤ rounds} 1/d(v) is
    reported as the exact rational (h_num, h_den) with
    h_den = lcm(1..rounds), so every per-vertex term h_den // d(v)
    divides exactly — no float, no tie risk (the same all-integer
    posture as the hedonic certificate).  One BFS per seed over the
    shared CSR blocks (`algos/bfs.py`); the truncation at ``rounds``
    is the standard radius-R harmonic variant and exactly what the
    SQL oracle unrolls."""
    from math import lcm

    from hedonic_ray.algos.bfs import bfs_distances

    g = doc_graph(sf_dir, directed=False)
    den = lcm(*range(1, rounds + 1))
    out_s, out_n, out_h = [], [], []
    for s in seeds:
        dist = bfs_distances(g, np.array([s], dtype=np.int64),
                             rounds=rounds)
        reach = dist > 0
        out_s.append(int(s))
        out_n.append(int(reach.sum()))
        out_h.append(int((den // dist[reach]).sum()))
    return pa.table({"seed": pa.array(out_s, pa.int64()),
                     "n_reached": pa.array(out_n, pa.int64()),
                     "h_num": pa.array(out_h, pa.int64()),
                     "h_den": pa.array([den] * len(seeds), pa.int64())})


def doc_hits_table(sf_dir: str, *, iters: int = 2) -> pa.Table:
    """HITS hub/authority scores of the DIRECTED doc-link graph after
    ``iters`` full iterations in exact unnormalized int64 arithmetic
    (hub₀ = 1; every score is a directed-path count, so the SQL oracle
    is an unrolled join chain with no float rounding)."""
    from hedonic_ray.algos.hits import hits

    g = doc_graph(sf_dir, directed=True)
    hub, auth = hits(g, iters=iters, normalize=False)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "hub": pa.array(hub, pa.int64()),
                     "auth": pa.array(auth, pa.int64())})


def doc_edge_jaccard_table(sf_dir: str) -> pa.Table:
    """Per-edge neighborhood Jaccard of the undirected doc-link graph
    (link-prediction signal): (a, b, common, jacc_e9) for each
    canonical edge — exact integers end to end."""
    from hedonic_ray.algos.edgesim import edge_jaccard

    return edge_jaccard(doc_graph(sf_dir, directed=False))


def doc_ppr_table(sf_dir: str, *, iters: int = 5,
                  stride: int = 101) -> pa.Table:
    """Personalized PageRank on the DIRECTED doc-link graph from the
    deterministic seed set ``{v : v ≡ 0 (mod stride)}`` after exactly
    ``iters`` iterations (the fixed-iteration semantic the SQL oracle
    unrolls), ×1e9 rounded."""
    from hedonic_ray.algos.pagerank import personalized_pagerank

    g = doc_graph(sf_dir, directed=True)
    seeds = np.arange(0, g.n, stride, dtype=np.int64)
    res = personalized_pagerank(g, seeds, max_iters=iters, tol=0.0)
    # half-UP (floor(x+0.5)), not rint: the seed distribution produces
    # short binary fractions whose ×1e9 value lands exactly on .5, where
    # np.rint (half-even) and SQL ROUND (half-away) disagree
    rank_e9 = np.floor(res.state["rank"] * 1e9 + 0.5).astype(np.int64)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "rank_e9": pa.array(rank_e9, pa.int64())})


def doc_pagerank_refresh(sf_dir: str, *, iters: int = 5, extra: int = 2,
                         stride: int = 31) -> pa.Table:
    """INCREMENTAL PageRank refresh — the crawl-update analytics twin
    of `dedup_incremental`: rank the base graph (``iters`` fixed
    iterations), apply a deterministic edge delta (every ``stride``-th
    doc gains the link ``d → (17d+3) mod n``), then WARM-START from
    the prior ranks and run only ``extra`` iterations on the updated
    graph — the production refresh pattern that skips re-converging
    from uniform after each crawl.  The warm start ships the prior
    vector once (inside the shard spec at scale); per-round traffic
    stays scalar.  Columns: vertex, prior_e9, rank_e9, delta_e9
    (signed ×1e9 half-up-rounded; delta is the difference of the two
    ROUNDED columns, so it is exact int arithmetic)."""
    from hedonic_ray.algos.pagerank import pagerank

    g = doc_graph(sf_dir, directed=True)
    n = g.n
    pr = pagerank(g, max_iters=iters, tol=0.0).state["rank"]

    src = np.arange(0, n, stride, dtype=np.int64)
    dst = (src * 17 + 3) % n
    keep = src != dst
    delta_ds = edges_from_numpy(
        np.stack([src[keep], dst[keep]], axis=1))
    # raw cached edges keep dups/self-loops; build_link_graph dedups
    g2 = build_link_graph(doc_edges_cached(sf_dir).union(delta_ds),
                          n, directed=True)
    pr2 = pagerank(g2, max_iters=extra, tol=0.0,
                   rank0=pr).state["rank"]
    prior_e9 = np.floor(pr * 1e9 + 0.5).astype(np.int64)
    rank_e9 = np.floor(pr2 * 1e9 + 0.5).astype(np.int64)
    return pa.table({"vertex": pa.array(np.arange(n), pa.int64()),
                     "prior_e9": pa.array(prior_e9, pa.int64()),
                     "rank_e9": pa.array(rank_e9, pa.int64()),
                     "delta_e9": pa.array(rank_e9 - prior_e9, pa.int64())})


def doc_components_refresh(sf_dir: str, *, stride: int = 31) -> pa.Table:
    """INCREMENTAL connected-components refresh — the second member of
    the crawl-update family (next to `doc_pagerank_refresh`): labels
    on the base undirected graph, then the deterministic edge delta
    merges components WITHOUT re-running CC on the full graph: the
    delta edges project to OLD-LABEL pairs (≤ |delta| of them), the
    tiny label graph clusters through the existing dup-cluster CC
    machinery, and the final label is one broadcast-array gather —
    O(delta) work against an O(V+E) recompute, exactly how a crawl
    pipeline folds in a day's new links.  Columns: vertex, prior_comp,
    component, changed (0/1)."""
    import ray.data as rd

    from hedonic_ray.algos.components import connected_components
    from hedonic_ray.ops.dedup import duplicate_clusters

    g = doc_graph(sf_dir, directed=False)
    n = g.n
    prior = connected_components(g).state["component"].astype(np.int64)

    src = np.arange(0, n, stride, dtype=np.int64)
    dst = (src * 17 + 3) % n
    keep = src != dst
    la, lb = prior[src[keep]], prior[dst[keep]]
    pairs = rd.from_arrow(pa.table({
        "a": pa.array(np.minimum(la, lb), pa.int64()),
        "b": pa.array(np.maximum(la, lb), pa.int64())}))
    root = duplicate_clusters(pairs, n)  # over the label id space
    comp = root[prior]
    return pa.table({
        "vertex": pa.array(np.arange(n), pa.int64()),
        "prior_comp": pa.array(prior, pa.int64()),
        "component": pa.array(comp, pa.int64()),
        "changed": pa.array((comp != prior).astype(np.int64), pa.int64())})


def doc_multilevel(sf_dir: str, *, lp_iters: int = 2) -> pa.Table:
    """TWO-LEVEL community detection (the Louvain/Leiden multi-level
    loop, one coarsening): level 1 = the 2-pass hedonic partition;
    contract to the weighted super-graph (`doc_contract`'s pair
    pipeline); level 2 = ``lp_iters`` rounds of weighted label
    propagation ON THE SUPER-GRAPH (max incoming weight, ties → lowest
    label, no in-arcs → keep); project back.  Columns: vertex,
    level1, level2.

    The super-graph is orders of magnitude smaller than the graph
    (that is the point of contraction), so the level-2 LP runs on the
    driver over community-bounded arrays — the same justification as
    every post-aggregation collect; the contraction itself is the
    distributed pair-grid exchange."""
    mem = hedonic_2pass_membership(sf_dir).astype(np.int64)
    sup = doc_contract(sf_dir)
    ca = sup.column("ca").to_numpy().astype(np.int64)
    cb = sup.column("cb").to_numpy().astype(np.int64)
    w = sup.column("weight").to_numpy().astype(np.int64)
    m = ca != cb
    src = np.concatenate([ca[m], cb[m]])
    dst = np.concatenate([cb[m], ca[m]])
    aw = np.concatenate([w[m], w[m]])
    comms = np.unique(mem)
    lab = comms.copy()
    si = np.searchsorted(comms, src)
    di = np.searchsorted(comms, dst)
    for _ in range(lp_iters):
        # incoming-weight grid over (dst, label(src)) — C-bounded
        key = di * np.int64(len(comms) + 1) + \
            np.searchsorted(comms, lab[si])
        uk, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(uk), np.int64)
        np.add.at(acc, inv, aw)
        gd = uk // (len(comms) + 1)
        gl = comms[(uk % (len(comms) + 1)).astype(np.int64)]
        order = np.lexsort((gl, -acc, gd))
        first = np.empty(len(gd), bool)
        if len(gd):
            first[0] = True
            first[1:] = gd[order][1:] != gd[order][:-1]
            new = lab.copy()
            new[gd[order][first]] = gl[order][first]
            lab = new
    level2 = lab[np.searchsorted(comms, mem)]
    return pa.table({
        "vertex": pa.array(np.arange(len(mem)), pa.int64()),
        "level1": pa.array(mem, pa.int64()),
        "level2": pa.array(level2, pa.int64())})


def doc_trustrank(sf_dir: str, *, iters: int = 5,
                  stride: int = 97) -> pa.Table:
    """TrustRank + spam mass (Gyöngyi, Garcia-Molina & Pedersen, VLDB
    2004) on the directed doc graph: trust = personalized PageRank
    from the deterministic trusted-seed set ``{v : v ≡ 0 (mod 97)}``,
    and ``spam_mass_e6 = (pr_e9 − tr_e9)·10⁶ ÷ pr_e9`` (division
    truncating toward zero on the ALREADY-ROUNDED ×1e9 integers, so
    the ratio is exact int-of-ints — no float division anywhere near
    the gate hash).  High spam mass = rank earned without trusted
    endorsement, the classic link-spam demotion signal.  Both power
    iterations are the existing fixed-iteration kernels; the seed
    stride differs from `doc_ppr_table` (101) so the two queries
    exercise different seed sets."""
    from hedonic_ray.algos.pagerank import pagerank, personalized_pagerank

    g = doc_graph(sf_dir, directed=True)
    seeds = np.arange(0, g.n, stride, dtype=np.int64)
    tr = personalized_pagerank(g, seeds, max_iters=iters,
                               tol=0.0).state["rank"]
    pr = pagerank(g, max_iters=iters, tol=0.0).state["rank"]
    tr_e9 = np.floor(tr * 1e9 + 0.5).astype(np.int64)
    pr_e9 = np.floor(pr * 1e9 + 0.5).astype(np.int64)
    d = pr_e9 - tr_e9
    spam = np.sign(d) * ((np.abs(d) * np.int64(1_000_000))
                         // np.maximum(pr_e9, 1))
    spam[pr_e9 <= 0] = 0
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "tr_e9": pa.array(tr_e9, pa.int64()),
                     "pr_e9": pa.array(pr_e9, pa.int64()),
                     "spam_mass_e6": pa.array(spam, pa.int64())})


def doc_scc_table(sf_dir: str) -> pa.Table:
    """Strongly connected components of the DIRECTED doc-link graph
    (label = min member id; the SQL oracle computes the same label via
    mutual reachability).  The reversed graph is built from the same
    cached edge table with src/dst swapped."""
    from hedonic_ray.algos.scc import strongly_connected_components

    g_fwd = doc_graph(sf_dir, directed=True)
    g_bwd = doc_graph_reversed(sf_dir)
    scc = strongly_connected_components(g_fwd, g_bwd)
    return pa.table({"vertex": pa.array(np.arange(g_fwd.n), pa.int64()),
                     "scc": pa.array(scc, pa.int64())})


def doc_component_stats(sf_dir: str) -> pa.Table:
    """Per-component structure stats of the undirected doc-link graph:
    (component, n_vertices, n_edges, density_e9) with
    ``density_e9 = 2·m·10⁹ // (n·(n−1))`` — exact integers.  Edge
    counts are a distributed per-block reduction against the broadcast
    membership (each canonical edge lies in exactly one component);
    vertex counts are a bincount over the converged labels."""
    import ray
    from ray.data.aggregate import Sum
    from hedonic_ray.engine.superstep import iter_block_views

    g = doc_graph(sf_dir, directed=False)
    comp = connected_components(g).state["component"].astype(np.int64)
    comp_ref = ray.put(comp)

    def edge_partials(batch: pa.Table) -> pa.Table:
        c = ray.get(comp_ref)
        keys: list[np.ndarray] = []
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            keep = src < bv.indices  # canonical: each edge once
            keys.append(c[src[keep]])
        if not keys:
            return pa.table({"component": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64())})
        uk, cnt = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table({"component": pa.array(uk, pa.int64()),
                         "m": pa.array(cnt.astype(np.int64))})

    rows = (g.blocks.map_batches(edge_partials, batch_format="pyarrow",
                                 batch_size=4)
            .groupby("component").aggregate(Sum("m", alias_name="m"))
            .take_all())
    m_by_comp = {int(r["component"]): int(r["m"]) for r in rows}
    comps, n_v = np.unique(comp, return_counts=True)
    m = np.array([m_by_comp.get(int(c), 0) for c in comps], dtype=np.int64)
    den = n_v.astype(np.int64) * (n_v.astype(np.int64) - 1)
    dens = np.zeros(len(comps), dtype=np.int64)
    np.floor_divide(2 * m * np.int64(1_000_000_000), den, out=dens,
                    where=den > 0)
    return pa.table({"component": pa.array(comps, pa.int64()),
                     "n_vertices": pa.array(n_v.astype(np.int64)),
                     "n_edges": pa.array(m),
                     "density_e9": pa.array(dens)})


def doc_assortativity_table(sf_dir: str) -> pa.Table:
    """Degree-assortativity sufficient stats + truncated ×1e6 Pearson r
    of the undirected doc-link graph (one row, all integers)."""
    from hedonic_ray.algos.linkpred import degree_assortativity

    return degree_assortativity(doc_graph(sf_dir, directed=False))


def doc_common_neighbors_table(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k non-adjacent pairs by common-neighbor count
    (link-prediction ranking) on the undirected doc-link graph."""
    from hedonic_ray.algos.linkpred import common_neighbors_topk

    return common_neighbors_topk(doc_graph(sf_dir, directed=False), k=k)


def doc_resource_alloc_table(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k non-adjacent pairs by the exact-integer resource-
    allocation index Σ 10⁹//deg(z) over common neighbors z
    (degree-discounted link prediction — hubs contribute less than in
    :func:`doc_common_neighbors_table`)."""
    from hedonic_ray.algos.linkpred import resource_allocation_topk

    return resource_allocation_topk(doc_graph(sf_dir, directed=False), k=k)


def doc_adamic_adar_table(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k non-adjacent pairs by the exact-integer Adamic–Adar index
    Σ 10¹²//floor(10⁶·ln deg(z)) over common neighbors z (the
    log-damped link-prediction companion of
    :func:`doc_resource_alloc_table`)."""
    from hedonic_ray.algos.linkpred import adamic_adar_topk

    return adamic_adar_topk(doc_graph(sf_dir, directed=False), k=k)


def doc_spectrum_table(sf_dir: str) -> pa.Table:
    """Resolution spectrum (hedonic/__init__.py:432-449) with EXACT
    integer satisfaction tests over the grid α = i/10, evaluated on the
    SQL-reproducible 2-pass α=0 partition: per grid point, the count of
    satisfied vertices (always-satisfied + re-evaluated relatives) plus
    the resolution-free robustness count.  The spectrum *operator* is
    what's verified; the converged-run spectrum (float, np.isclose,
    reference semantics) stays on :func:`hedonic_ray.analytics.
    hedonic_stats.resolution_spectrum` with pytest oracles."""
    from hedonic_ray.analytics.hedonic_stats import spectrum_exact_tenths

    g = doc_graph(sf_dir, directed=False)
    mem = hedonic_2pass_membership(sf_dir)
    tenths, eq_counts, robust = spectrum_exact_tenths(g, mem)
    return pa.table({
        "resolution_tenths": pa.array(tenths, pa.int64()),
        "eq_count": pa.array(eq_counts, pa.int64()),
        "robust_count": pa.array(
            np.full(len(tenths), robust, dtype=np.int64), pa.int64()),
    })


def doc_analytics_table(sf_dir: str) -> pa.Table:
    """Partition-quality metrics as EXACT integers (metric, value):
    CPM potential scaled by den = C(n,2), all-coalition equilibrium and
    robustness counts at α = m/C(n,2), ARI vs 2-round label propagation
    as a num/den pair — all evaluated on the SQL-reproducible 2-pass
    α=0 partition so every row has a DuckDB oracle — plus
    ``nash_converged``: 1 iff the independent exact-integer certificate
    of the run-to-convergence game holds for every vertex (the SQL side
    asserts the constant; the honest recomputation is Ray-side)."""
    from hedonic_ray.analytics.hedonic_stats import (
        metrics_exact,
        nash_flags_exact,
    )

    g = doc_graph(sf_dir, directed=False)
    mem = hedonic_2pass_membership(sf_dir)
    lp = label_propagation(g, max_iters=2).state["label"]
    met = metrics_exact(g, mem, lp)
    hed = hedonic_converged(sf_dir)
    num, den = g.undirected_edge_count, g.n * (g.n - 1) // 2
    cert = nash_flags_exact(g, hed.state["coalition"], num, den,
                            candidates="adjacent")
    met["nash_converged"] = int(bool(cert.all() and hed.converged))
    names = sorted(met)
    return pa.table({
        "metric": pa.array(names, pa.string()),
        "value": pa.array([int(met[k]) for k in names], pa.int64()),
    })


# ---------------------------------------------------- tiny dimension graphs


def nation_region_components(sf_dir: str) -> pa.Table:
    """CC on the nation–region star forest: vertices = regions
    (id = r_regionkey) ∪ nations (id = 5 + n_nationkey)."""
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    edges = np.stack([5 + nat.column("n_nationkey").to_numpy().astype(np.int64),
                      nat.column("n_regionkey").to_numpy().astype(np.int64)],
                     axis=1)
    n = 5 + int(nat.column("n_nationkey").to_numpy().max()) + 1
    g = build_link_graph(edges_from_numpy(edges), n, directed=False, num_parts=2)
    res = connected_components(g)
    return pa.table({"vertex": pa.array(np.arange(n), pa.int64()),
                     "component": pa.array(res.state["component"], pa.int64())})


def _supplier_conation_edges(sf_dir: str):
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup.column("s_suppkey").to_numpy().astype(np.int64)
    nk = sup.column("s_nationkey").to_numpy().astype(np.int64)
    edges = []
    for nation in np.unique(nk):
        members = np.sort(sk[nk == nation])
        if len(members) > 1:
            iu = np.triu_indices(len(members), k=1)
            edges.append(np.stack([members[iu[0]], members[iu[1]]], axis=1))
    e = np.concatenate(edges) if edges else np.empty((0, 2), np.int64)
    n = int(sk.max()) + 1
    return e, n


def supplier_triangles(sf_dir: str) -> pa.Table:
    """Per-supplier triangle counts on the co-nation clique graph
    (vertices with 0 triangles omitted, matching the SQL oracle)."""
    e, n = _supplier_conation_edges(sf_dir)
    g = build_link_graph(edges_from_numpy(e), n, directed=False, num_parts=4)
    res = triangle_count(g)
    nz = np.flatnonzero(res.per_vertex)
    return pa.table({"s_suppkey": pa.array(nz, pa.int64()),
                     "triangles": pa.array(res.per_vertex[nz], pa.int64())})


def supplier_lp_onepass(sf_dir: str) -> pa.Table:
    """One synchronous plurality LP pass on the supplier co-nation
    graph, init label = vertex id (suppliers only in output)."""
    e, n = _supplier_conation_edges(sf_dir)
    g = build_link_graph(edges_from_numpy(e), n, directed=False, num_parts=4)
    labels = onepass_improvement(g, np.arange(n, dtype=np.int64))
    present = np.unique(e) if len(e) else np.empty(0, np.int64)
    return pa.table({"s_suppkey": pa.array(present, pa.int64()),
                     "label": pa.array(labels[present], pa.int64())})


# ---------------------------------------------------------------- flagship


def flagship(sf_dir: str) -> pa.Table:
    """The headline pipeline: pages → extract (byte-identity asserted on
    a sample) → link graph → PageRank + CC + hedonic communities →
    one vertex table."""
    g_dir = doc_graph(sf_dir, directed=True)
    g_und = doc_graph(sf_dir, directed=False)
    pr = pagerank(g_dir, max_iters=50, tol=1e-10)
    cc = connected_components(g_und)
    hed = hedonic_converged(sf_dir)
    n = g_dir.n
    return pa.table({
        "vertex": pa.array(np.arange(n), pa.int64()),
        "out_degree": pa.array(g_dir.out_degree, pa.int64()),
        "rank": pa.array(pr.state["rank"], pa.float64()),
        "component": pa.array(cc.state["component"], pa.int64()),
        "coalition": pa.array(hed.state["coalition"], pa.int64()),
    })


def doc_two_hop_table(sf_dir: str) -> pa.Table:
    """Distinct ≤2-hop neighborhood size per document vertex."""
    from hedonic_ray.algos.linkpred import two_hop_counts

    return two_hop_counts(doc_graph(sf_dir, directed=False))


def doc_graph_reversed(sf_dir: str):
    """The TRANSPOSED directed doc graph (session-cached like
    :func:`doc_graph`): reuses the materialized edge table, swaps the
    endpoint columns in one map, rebuilds CSR — the in-adjacency view
    that bibliographic coupling (and any pull-style kernel) needs."""
    from hedonic_ray.context import session_scoped

    session_scoped(_GRAPH_CACHE)
    key = (sf_dir, "bwd")
    if key not in _GRAPH_CACHE:
        edges = doc_edges_cached(sf_dir)
        _e, _urls, n = _GRAPH_CACHE[(sf_dir, "edges")]

        def swap(t: pa.Table) -> pa.Table:
            return pa.table({"src": t.column("dst"),
                             "dst": t.column("src")})

        rev = edges.map_batches(swap, batch_format="pyarrow")
        _GRAPH_CACHE[key] = build_link_graph(rev, n, directed=True)
    return _GRAPH_CACHE[key]


def doc_cocitation(sf_dir: str, k: int = 20) -> pa.Table:
    """Co-citation AND bibliographic coupling top-k on the directed doc
    graph: rows ``(kind, a, b, cnt)`` — kind='cocite' pairs ranked by
    the number of pages linking to both, kind='couple' pairs ranked by
    the number of pages both link to (the transpose wedge; Small 1973
    / Kessler 1963 — the classic citation-graph relatedness signals a
    web-scale link engine serves).  Each side is the single-exchange
    directed wedge pipeline (`algos/linkpred.py:directed_wedge_topk`);
    the coupling side runs on the cached transposed CSR."""
    from hedonic_ray.algos.linkpred import directed_wedge_topk

    co = directed_wedge_topk(doc_graph(sf_dir, directed=True), k=k)
    cp = directed_wedge_topk(doc_graph_reversed(sf_dir), k=k)
    kind = pa.array(["cocite"] * co.num_rows + ["couple"] * cp.num_rows,
                    pa.string())
    both = pa.concat_tables([co, cp])
    return pa.table({"kind": kind, "a": both.column("a"),
                     "b": both.column("b"), "cnt": both.column("cnt")})


def doc_truss_table(sf_dir: str, k: int = 3, rounds: int = 6) -> pa.Table:
    """k-truss membership flag per canonical edge of the doc graph."""
    from hedonic_ray.algos.truss import ktruss_edges

    return ktruss_edges(doc_graph(sf_dir, directed=False), k=k,
                        rounds=rounds)


def doc_scc_dag(sf_dir: str, scc: pa.Table | None = None) -> pa.Table:
    """SCC CONDENSATION DAG of the directed doc graph: the distinct
    (src_scc, dst_scc) arcs between different components — the
    quotient graph every reachability/ordering analysis runs on.
    Labels broadcast once; per-batch map + distinct combiner; one
    grouped distinct exchange.  Pass a precomputed ``scc`` table to
    reuse one SCC superstep run across consumers (doc_critical_path)."""
    import ray
    from ray.data.aggregate import Count

    if scc is None:
        scc = doc_scc_table(sf_dir)
    labels_ref = ray.put(scc.column("scc").to_numpy().astype(np.int64))
    edges = doc_edges_cached(sf_dir)

    def remap(t: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        s = lab[t.column("src").to_numpy()]
        d = lab[t.column("dst").to_numpy()]
        m = s != d
        g = pa.table({"src_scc": pa.array(s[m]), "dst_scc": pa.array(d[m])})
        return g.group_by(["src_scc", "dst_scc"]).aggregate([])

    return (edges.map_batches(remap, batch_format="pyarrow")
            .groupby(["src_scc", "dst_scc"])
            .aggregate(Count(alias_name="_c")).drop_columns(["_c"])
            .sort(["src_scc", "dst_scc"]))


def doc_bowtie(sf_dir: str) -> pa.Table:
    """BOW-TIE decomposition of the directed doc-link graph (Broder
    et al. 2000, "Graph structure in the web" — THE macroscopic
    web-graph analysis): every vertex classifies against the GIANT
    strongly connected component (largest; ties → lowest label) as
    ``core`` (inside it), ``in`` (reaches it), ``out`` (reachable
    from it), ``other`` (tendrils/tubes/disconnected).

    Shape: one SCC superstep run (shared with graph_scc via the
    pipeline), then two frontier reachability closures — per round ONE
    `masked_neighbor_count` pull over the forward / reversed CSR
    blocks against the broadcast frontier (the BFS posture: O(rounds·m)
    distributed work, V-sized driver vectors).  Both closures run to
    the empty-frontier FIXED POINT, which the recursive-CTE oracle
    shares by construction — no round-cap pairing to keep in sync
    (the graph_mst lesson).  Forward reachability pulls over the
    REVERSED rows (v joins when a forward in-neighbor is reached) and
    dually for backward.  Columns: vertex, cls."""
    import ray

    from hedonic_ray.algos.kcore import masked_neighbor_count

    scc_t = doc_scc_table(sf_dir)   # also builds + caches g_fwd / g_bwd
    scc = scc_t.column("scc").to_numpy().astype(np.int64)
    g_fwd = doc_graph(sf_dir, directed=True)
    g_bwd = _GRAPH_CACHE[(sf_dir, "bwd")]
    labs, cnts = np.unique(scc, return_counts=True)
    giant = int(labs[np.lexsort((labs, -cnts))[0]])
    core = scc == giant

    def closure(g, seeds: np.ndarray) -> np.ndarray:
        reached = seeds.copy()
        frontier = seeds.copy()
        while frontier.any():
            cnt = masked_neighbor_count(g, ray.put(frontier))
            frontier = (cnt > 0) & ~reached
            reached |= frontier
        return reached

    out_r = closure(g_bwd, core)    # reachable FROM the core
    in_r = closure(g_fwd, core)     # reaches the core
    cls = np.where(core, "core",
                   np.where(in_r, "in",
                            np.where(out_r, "out", "other")))
    return pa.table({"vertex": pa.array(np.arange(g_fwd.n), pa.int64()),
                     "cls": pa.array(cls.astype(object), pa.string())})


def doc_critical_path(sf_dir: str, rounds: int = 6) -> pa.Table:
    """TOPOLOGICAL DEPTH (radius-capped longest incoming path) per
    SCC of the doc graph's condensation DAG — the schedule level every
    critical-path / dependency analysis computes on a quotient graph.
    Pipeline: `doc_scc_dag` arcs (SCC labels are min member ids, so
    they index the SAME n-slot vertex space — no dense remap needed) →
    directed CSR build → `algos/critical_path.py:longest_path_depths`
    max-plus supersteps → rows for the SCC roots only."""
    from hedonic_ray.algos.critical_path import longest_path_depths
    from hedonic_ray.graph.build import build_link_graph

    g = doc_graph(sf_dir, directed=True)
    scc = doc_scc_table(sf_dir)           # ONE SCC superstep run,
    arcs = doc_scc_dag(sf_dir, scc=scc).map_batches(  # shared by both
        lambda t: t.rename_columns(["src", "dst"]), batch_format="pyarrow")
    cg = build_link_graph(arcs, g.n, directed=True)
    depth = longest_path_depths(cg, rounds=rounds)
    roots = np.unique(scc.column("scc").to_numpy())
    return pa.table({"scc": pa.array(roots.astype(np.int64)),
                     "depth": pa.array(depth[roots])})


def doc_degree_hist(sf_dir: str) -> pa.Table:
    """DEGREE DISTRIBUTION of the undirected doc graph — the first
    statistic of any web-graph audit: (degree, n_vertices) including
    the isolated-vertex bucket, sorted by degree.  The degree vector
    is engine state (one bincount); nothing leaves the driver but the
    histogram."""
    g = doc_graph(sf_dir, directed=False)
    deg = g.out_degree.astype(np.int64)
    cnt = np.bincount(deg)
    nz = np.flatnonzero(cnt)
    return pa.table({"degree": pa.array(nz, pa.int64()),
                     "n_vertices": pa.array(cnt[nz], pa.int64())})


def doc_neighbor_degree(sf_dir: str) -> pa.Table:
    """Average neighbor degree per doc vertex (local assortativity)."""
    from hedonic_ray.algos.linkpred import avg_neighbor_degree

    return avg_neighbor_degree(doc_graph(sf_dir, directed=False))


def doc_orbits(sf_dir: str) -> pa.Table:
    """Per-vertex 3-node graphlet orbit profile
    (`algos/linkpred.py:graphlet_orbits`)."""
    from hedonic_ray.algos.linkpred import graphlet_orbits

    return graphlet_orbits(doc_graph(sf_dir, directed=False))


def doc_walks_table(sf_dir: str, stride: int = 101,
                    steps: int = 5) -> pa.Table:
    """Deterministic random walks from the stride seeds (the
    DeepWalk/node2vec sampling stage with a reproducible hash
    choice)."""
    from hedonic_ray.algos.linkpred import deterministic_walks

    return deterministic_walks(doc_graph(sf_dir, directed=False),
                               stride=stride, steps=steps)


def doc_modularity(sf_dir: str) -> pa.Table:
    """NEWMAN MODULARITY of the SQL-reproducible 2-pass hedonic
    partition, as one exact rational:

        Q = (4m·Σ_c m_c − Σ_c d_c²) / (4m²)

    (m_c intra-community edges, d_c community degree sum) — reported
    as ``q_e9 = trunc(10⁹·Q)`` plus the integer terms, so the gate
    checks the COMMUNITY-QUALITY METRIC itself, not just the
    partition.  Intra-edge counting is one scatter over the CSR
    blocks against the broadcast membership; d_c is a driver bincount
    over engine state."""
    import ray

    from hedonic_ray.engine.superstep import iter_block_views

    g = doc_graph(sf_dir, directed=False)
    mem = hedonic_2pass_membership(sf_dir)
    m = int(g.undirected_edge_count)
    deg = g.out_degree.astype(np.int64)
    mem_ref = ray.put(mem)

    def intra(batch: pa.Table) -> pa.Table:
        mm = ray.get(mem_ref)
        c = 0
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            keep = src < bv.indices
            c += int((mm[src[keep]] == mm[bv.indices[keep]]).sum())
        return pa.table({"c": pa.array([c], pa.int64())})

    rows = g.blocks.map_batches(intra, batch_format="pyarrow",
                                batch_size=4).take_all()
    intra_edges = sum(int(r["c"]) for r in rows)
    # int64 accumulator, not bincount(weights=) — the float64 path
    # loses exactness once a community degree sum exceeds 2^53
    dsum = np.zeros(int(mem.max()) + 1 if len(mem) else 1, np.int64)
    np.add.at(dsum, mem, deg)
    sum_dc2 = int(sum(int(x) * int(x) for x in dsum))
    num = 4 * m * intra_edges - sum_dc2
    den = 4 * m * m
    q = (abs(num) * 1_000_000_000 // den) * (1 if num >= 0 else -1)
    return pa.table({
        "m": pa.array([m], pa.int64()),
        "n_communities": pa.array([int(len(np.unique(mem)))], pa.int64()),
        "intra_edges": pa.array([intra_edges], pa.int64()),
        "sum_dc2": pa.array([sum_dc2], pa.int64()),
        "q_e9": pa.array([q], pa.int64()),
    })


def doc_katz(sf_dir: str, *, iters: int = 4, beta_inv: int = 4) -> pa.Table:
    """Radius-capped KATZ CENTRALITY of every doc vertex as an exact
    integer rational: katz_num(v) = Σ_{k≤K} beta_inv^(K−k)·walks_k(v)
    over katz_den = beta_inv^K (β = 1/beta_inv).  Each superstep is
    the HITS push (A^T x) over the shared CSR blocks; the SQL oracle
    unrolls the same walk-count chain with integer weights — no float
    anywhere (`algos/katz.py`)."""
    from hedonic_ray.algos.katz import katz_centrality

    g = doc_graph(sf_dir, directed=True)
    num, den = katz_centrality(g, iters=iters, beta_inv=beta_inv)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "katz_num": pa.array(num, pa.int64()),
                     "katz_den": pa.array(np.full(g.n, den), pa.int64())})


def doc_salsa(sf_dir: str) -> pa.Table:
    """STATIONARY SALSA hub/authority scores (Lempel & Moran 2000) of
    the directed doc graph, closed form in exact integers: the SALSA
    walk's stationary authority weight is

        a(v) = (|A_j| / |A|) · (indeg(v) / Σ_{u ∈ A_j} indeg(u))

    where A_j is v's component of the CO-CITATION graph (hub side
    symmetric with outdeg / bibliographic-coupling components) —
    reported as the truncating integer
    score_e9 = (1e9·|A_j|·deg(v)) // (|A|·S_j).

    Both component structures come from ONE distributed CC over the
    BIPARTITE INCIDENCE graph (targets 0..n−1, sources n..2n−1, one
    undirected edge per arc): co-citation components are the
    bipartite components restricted to targets, coupling components
    restricted to sources — no quadratic wedge pair set is ever
    materialized (the scale posture SALSA needs; the co-citation
    TOP-K query materializes pairs, this one must not).  Degrees are
    the cached forward/transposed CSR degree vectors.  Columns:
    side, vertex, deg, comp, score_e9 (comp = min same-side member)."""
    from hedonic_ray.algos.components import connected_components
    from hedonic_ray.graph.build import build_link_graph

    g_fwd = doc_graph(sf_dir, directed=True)
    g_bwd = doc_graph_reversed(sf_dir)
    n = g_fwd.n
    outdeg = g_fwd.out_degree.astype(np.int64)
    indeg = g_bwd.out_degree.astype(np.int64)

    edges = doc_edges_cached(sf_dir)

    def bip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # the cached raw edge table keeps self-links (the anchors
        # query needs them); SALSA's arc set is the canonical one
        t = t.filter(pc.invert(pc.equal(t.column("src"),
                                        t.column("dst"))))
        return pa.table({
            "src": t.column("dst").cast(pa.int64()),
            "dst": pc.add(t.column("src").cast(pa.int64()),
                          pa.scalar(n, pa.int64()))})

    g_bip = build_link_graph(edges.map_batches(bip, batch_format="pyarrow"),
                             2 * n, directed=False)
    labels = connected_components(g_bip).state["component"]
    # min SOURCE id per bipartite component (hub-side component label)
    minsrc = np.full(2 * n, 2 * n, np.int64)
    src_ids = np.arange(n, 2 * n, dtype=np.int64)
    np.minimum.at(minsrc, labels[n:], src_ids)

    def side(deg: np.ndarray, comp: np.ndarray, name: str) -> pa.Table:
        keep = np.flatnonzero(deg > 0)
        c, d = comp[keep], deg[keep]
        total = len(keep)
        uc, inv = np.unique(c, return_inverse=True)
        csize = np.bincount(inv).astype(np.int64)
        csum = np.zeros(len(uc), np.int64)
        np.add.at(csum, inv, d)
        assert int(csize.max(initial=0)) * int(d.max(initial=0)) \
            * 1_000_000_000 < 2**63
        score = (1_000_000_000 * csize[inv] * d) // (total * csum[inv])
        return pa.table({
            "side": pa.array([name] * total, pa.string()),
            "vertex": pa.array(keep.astype(np.int64)),
            "deg": pa.array(d),
            "comp": pa.array(c),
            "score_e9": pa.array(score)})

    auth = side(indeg, labels[:n], "auth")
    hub = side(outdeg, minsrc[labels[n:]] - n, "hub")
    return pa.concat_tables([auth, hub])


def doc_neighborhood_function(sf_dir: str, *, rounds: int = 32) -> pa.Table:
    """Exact neighborhood function N(h) of the undirected doc-link
    graph (`algos/anf.py`): per hop h, the cumulative ordered-pair
    count within distance h and its share of all reachable pairs as
    the truncating integer pct_e6 = 1e6·N(h) // N(max) — the curve
    whose 90% crossing is the effective diameter.  Round cap 32
    equals the SQL recursion cap (fixed-round parity rule).
    Columns: h, n_pairs, pct_e6."""
    from hedonic_ray.algos.anf import neighborhood_function

    g = doc_graph(sf_dir, directed=False)
    counts = neighborhood_function(g, rounds=rounds)
    total = int(counts[-1])
    h = np.arange(len(counts), dtype=np.int64)
    pct = (1_000_000 * counts) // total  # nonneg: // == trunc
    return pa.table({"h": pa.array(h),
                     "n_pairs": pa.array(counts),
                     "pct_e6": pa.array(pct.astype(np.int64))})


def doc_eccentricity(sf_dir: str, *, rounds: int = 32) -> pa.Table:
    """Per-vertex ECCENTRICITY of the undirected doc graph (max
    distance to any reachable vertex, radius-capped at ``rounds``) —
    free from the neighborhood-function bitset run
    (`algos/anf.py:neighborhood_function(return_ecc=True)`: a
    vertex's eccentricity is the last round its reachability bitset
    changed).  Isolated vertices report 0, matching the SQL's
    self-pair MAX.  Columns: vertex, ecc."""
    from hedonic_ray.algos.anf import neighborhood_function

    g = doc_graph(sf_dir, directed=False)
    _counts, ecc = neighborhood_function(g, rounds=rounds,
                                         return_ecc=True)
    return pa.table({"vertex": pa.array(np.arange(g.n, dtype=np.int64)),
                     "ecc": pa.array(ecc)})


def doc_diameter(sf_dir: str, *, rounds: int = 6) -> pa.Table:
    """DOUBLE-SWEEP DIAMETER lower bound, radius-``rounds``-capped
    fixed-round semantics (the standard 2-sweep heuristic: BFS from
    vertex 0, re-BFS from the farthest vertex found; ``ecc2`` lower-
    bounds the true diameter of 0's component when the cap exceeds
    the true eccentricities).  Ties at max distance break to the
    LOWEST vertex id on both sweeps — deterministic cross-engine.
    One row: (seed, far1, ecc1, far2, ecc2)."""
    from hedonic_ray.algos.bfs import bfs_distances

    g = doc_graph(sf_dir, directed=False)

    def sweep(seed: int):
        dist = bfs_distances(g, np.array([seed], dtype=np.int64),
                             rounds=rounds)
        reach = np.flatnonzero(dist > 0)
        if len(reach) == 0:
            return seed, 0
        ecc = int(dist[reach].max())
        far = int(reach[dist[reach] == ecc].min())
        return far, ecc

    far1, ecc1 = sweep(0)
    far2, ecc2 = sweep(far1)
    return pa.table({"seed": pa.array([0], pa.int64()),
                     "far1": pa.array([far1], pa.int64()),
                     "ecc1": pa.array([ecc1], pa.int64()),
                     "far2": pa.array([far2], pa.int64()),
                     "ecc2": pa.array([ecc2], pa.int64())})


def doc_anchor_text(sf_dir: str) -> pa.Table:
    """ANCHOR-TEXT table of the rendered pages: one row per <a> tag in
    document order — (doc_id, pos, dst, anchor) — the classic web-
    corpus ranking/training signal (anchor text describes the TARGET
    page).  Extraction is a real HTML parse of the binary ``html``
    column (actor-pool regex stage, `functions/extract.py`); the SQL
    oracle reconstructs the same rows from the planted-link formula,
    so the gate checks byte-level parse ↔ arithmetic parity with
    duplicates, self-links and in-page order preserved (unlike
    `graph_extract_edges`, which checks the DEDUPED canonical edge
    set)."""
    from hedonic_ray.functions.extract import AnchorExtract

    pages = doc_pages(sf_dir)
    extractor = AnchorExtract()  # compiled once, shipped in the task closure
    out = pages.map_batches(extractor, batch_format="pyarrow",
                            batch_size=2048)
    batches = [b for b in out.sort(["doc_id", "pos"]).iter_batches(
        batch_size=65536, batch_format="pyarrow") if b.num_rows]
    if not batches:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "anchor": pa.array([], pa.string())})
    return pa.concat_tables(batches).combine_chunks()


def doc_anchor_profile(sf_dir: str) -> pa.Table:
    """PER-TARGET anchor profile — the aggregation a web-scale anchor
    index runs over a parsed crawl (anchor text / inlink counts are
    the classic target-page ranking + LLM-pretraining signal): for
    every link TARGET, (n_anchors incl. duplicates, n_src_docs
    distinct sources, n_self self-links, first_src = min source id),
    computed from the REAL HTML byte parse (the `doc_anchor_text`
    extractor), while the SQL oracle reconstructs the same aggregates
    from the planted-link arithmetic.

    Shape: actor-pool parse → per-batch (dst, src) partial combine →
    ONE groupby(dst, src) exchange (dedups sources while keeping the
    duplicate count) → per-batch dst partial → one small groupby(dst)
    exchange.  Columns: dst, n_anchors, n_src_docs, n_self,
    first_src, sorted by dst."""
    from ray.data.aggregate import Min, Sum

    from hedonic_ray.functions.extract import AnchorExtract

    pages = doc_pages(sf_dir)
    anchors = pages.map_batches(AnchorExtract(), batch_format="pyarrow",
                                batch_size=2048)

    def pair_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"dst": t.column("dst"), "src": t.column("doc_id")})
        return (g.group_by(["dst", "src"]).aggregate([("src", "count")])
                .rename_columns(["dst", "src", "cnt"]))

    pairs = (anchors.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["dst", "src"]).aggregate(Sum("cnt", alias_name="cnt")))

    def dst_partial(t: pa.Table) -> pa.Table:
        dst = t.column("dst").to_numpy().astype(np.int64)
        src = t.column("src").to_numpy().astype(np.int64)
        cnt = t.column("cnt").to_numpy().astype(np.int64)
        order = np.argsort(dst, kind="stable")
        d, s, c = dst[order], src[order], cnt[order]
        starts = np.flatnonzero(
            np.concatenate([[True], d[1:] != d[:-1]]))
        return pa.table({
            "dst": pa.array(d[starts], pa.int64()),
            "n_anchors": pa.array(np.add.reduceat(c, starts), pa.int64()),
            "n_src_docs": pa.array(
                np.add.reduceat(np.ones(len(d), np.int64), starts),
                pa.int64()),
            "n_self": pa.array(
                np.add.reduceat(np.where(s == d, c, 0), starts),
                pa.int64()),
            "first_src": pa.array(np.minimum.reduceat(s, starts),
                                  pa.int64())})

    agg = (pairs.map_batches(dst_partial, batch_format="pyarrow")
           .groupby("dst")
           .aggregate(Sum("n_anchors", alias_name="n_anchors"),
                      Sum("n_src_docs", alias_name="n_src_docs"),
                      Sum("n_self", alias_name="n_self"),
                      Min("first_src", alias_name="first_src")))
    rows = agg.sort("dst").take_all()
    return pa.table({
        "dst": pa.array([int(r["dst"]) for r in rows], pa.int64()),
        "n_anchors": pa.array([int(r["n_anchors"]) for r in rows],
                              pa.int64()),
        "n_src_docs": pa.array([int(r["n_src_docs"]) for r in rows],
                               pa.int64()),
        "n_self": pa.array([int(r["n_self"]) for r in rows], pa.int64()),
        "first_src": pa.array([int(r["first_src"]) for r in rows],
                              pa.int64())})


def doc_sssp(sf_dir: str, *, seed: int = 1, rounds: int = 6) -> pa.Table:
    """WEIGHTED SINGLE-SOURCE SHORTEST PATHS over the directed doc
    graph (Bellman-Ford supersteps, `algos/sssp.py`): exact integer
    arc weights 1 + (src·31 + dst·17) % 9 — a pure function of the
    endpoint ids, so the CSR blocks carry no weight column and the SQL
    oracle reproduces the weights arithmetically.  Fixed ``rounds``
    caps path length (−1 beyond), matching the unrolled min-CTE
    chain.  Seed 1, not 0: doc 0's only planted link is a dropped
    self-loop, so a seed-0 run is vacuous.
    """
    from hedonic_ray.algos.sssp import sssp_distances

    g = doc_graph(sf_dir, directed=True)
    dist = sssp_distances(g, seed, rounds=rounds)
    return pa.table({"vertex": pa.array(np.arange(g.n), pa.int64()),
                     "dist": pa.array(dist, pa.int64())})


def doc_path_counts(sf_dir: str, *, seeds=(0, 1, 2),
                    rounds: int = 6) -> pa.Table:
    """SHORTEST-PATH COUNTS σ_s(v) from deterministic seeds (the
    Brandes betweenness forward pass) — exact int64 counts along the
    radius-capped BFS DAG (`algos/bfs.py:bfs_path_counts`); one row
    per (seed, reached vertex incl. the seed itself)."""
    from hedonic_ray.algos.bfs import bfs_path_counts

    g = doc_graph(sf_dir, directed=False)
    out_s, out_v, out_d, out_c = [], [], [], []
    for s in seeds:
        dist, cnt = bfs_path_counts(g, int(s), rounds=rounds)
        reach = np.flatnonzero(dist >= 0)
        out_s.append(np.full(len(reach), s, np.int64))
        out_v.append(reach.astype(np.int64))
        out_d.append(dist[reach])
        out_c.append(cnt[reach])
    return pa.table({"seed": pa.array(np.concatenate(out_s)),
                     "vertex": pa.array(np.concatenate(out_v)),
                     "dist": pa.array(np.concatenate(out_d)),
                     "n_paths": pa.array(np.concatenate(out_c))})


def doc_stress(sf_dir: str, *, seeds=(0, 1, 2), rounds: int = 6) -> pa.Table:
    """INTEGER STRESS (through-traffic) CENTRALITY from deterministic
    seeds over the undirected doc graph: for each reached vertex v,
    ``n_through = σ(v) · ρ(v)`` is the EXACT number of (target,
    shortest-path) pairs from the seed whose path continues through v
    — Brandes' two-pass betweenness scheme with the float dependency
    accumulation replaced by raw integer path counts (Shimbel's stress
    centrality restricted to one source), radius-capped at ``rounds``
    to match the unrolled SQL pyramid.  Forward pass =
    `algos/bfs.py:bfs_path_counts` (one scatter per level); backward
    pass = `algos/bfs.py:bfs_downstream_paths` (one broadcast pull per
    level).  Columns: seed, vertex, dist, n_paths (σ), n_cont (ρ),
    n_through (σ·ρ)."""
    from hedonic_ray.algos.bfs import bfs_downstream_paths, bfs_path_counts

    g = doc_graph(sf_dir, directed=False)
    out = {k: [] for k in ("seed", "vertex", "dist", "n_paths",
                           "n_cont", "n_through")}
    for s in seeds:
        dist, cnt = bfs_path_counts(g, int(s), rounds=rounds)
        rho = bfs_downstream_paths(g, dist)
        reach = np.flatnonzero(dist >= 0)
        sig, rh = cnt[reach], rho[reach]
        assert int(sig.max(initial=0)) * max(int(rh.max(initial=0)), 1) \
            < (1 << 62), "stress overflow: lower rounds"
        out["seed"].append(np.full(len(reach), s, np.int64))
        out["vertex"].append(reach.astype(np.int64))
        out["dist"].append(dist[reach])
        out["n_paths"].append(sig)
        out["n_cont"].append(rh)
        out["n_through"].append(sig * rh)
    return pa.table({k: pa.array(np.concatenate(v)) for k, v in out.items()})


def doc_squares(sf_dir: str) -> pa.Table:
    """EXACT 4-CYCLE (square) COUNT of the undirected doc graph via
    wedge aggregation: every vertex emits its neighbor PAIRS (the
    wedges it centers — one scatter over the CSR blocks, ≤ C(Δ,2)
    pairs per vertex), the packed-pair exchange counts common
    neighbors w(u,v), and squares = Σ C(w,2) / 2 (each square is
    counted once per diagonal).  The square census complements the
    triangle count in motif analysis (bipartite-ish link farms are
    square-heavy, triangle-poor).  One row: n_wedges, n_squares."""
    import ray
    from hedonic_ray.engine.superstep import iter_block_views
    from hedonic_ray.ops.dedup import _packed_pair_counts

    import ray.data as rd

    g = doc_graph(sf_dir, directed=False)
    n = g.n

    def wedges(batch: pa.Table) -> pa.Table:
        a_out, b_out = [], []
        for bv in iter_block_views(batch):
            deg = np.diff(bv.indptr)
            # vectorized per DEGREE CLASS: one gather + one triu
            # index per distinct degree (no per-row Python)
            for d in np.unique(deg):
                if d < 2:
                    continue
                starts = bv.indptr[:-1][deg == d]
                nb = bv.indices[starts[:, None]
                                + np.arange(d)[None, :]]  # (R, d)
                iu0, iu1 = np.triu_indices(int(d), k=1)
                a_out.append(nb[:, iu0].ravel())
                b_out.append(nb[:, iu1].ravel())
        if not a_out:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(a_out)),
                         "b": pa.array(np.concatenate(b_out))})

    counts = _packed_pair_counts(
        g.blocks.map_batches(wedges, batch_format="pyarrow"))
    n_wedges = 0
    s = 0
    for b in counts.iter_batches(batch_size=65536,
                                 batch_format="pyarrow"):
        c = b.column("i").to_numpy()
        n_wedges += int(c.sum())
        s += int((c * (c - 1) // 2).sum())
    assert s % 2 == 0
    return pa.table({"n_wedges": pa.array([n_wedges], pa.int64()),
                     "n_squares": pa.array([s // 2], pa.int64())})


def _lang_codes(sf_dir: str):
    """(per-vertex lang-index vector, sorted distinct langs) from the
    documents table — broadcast attribute lookup for the mixing
    queries."""
    import ray.data as rd

    configure_context()
    rows = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"]).take_all()
    langs = sorted({r["lang"] for r in rows})
    idx = {la: i for i, la in enumerate(langs)}
    code = np.zeros(len(rows), np.int64)
    for r in rows:
        code[int(r["doc_id"])] = idx[r["lang"]]
    return code, langs


def doc_lang_mixing(sf_dir: str) -> pa.Table:
    """ATTRIBUTE MIXING MATRIX of the doc graph by language — the
    homophily audit (Newman, PRE 67:026126 §II): directed arc counts
    e_ij per (lang(src), lang(dst)) over both orientations (so the
    matrix is symmetric and sums to 2m).  ONE scatter over the CSR
    blocks against the broadcast per-vertex lang codes (bincount on
    the packed pair index).  Columns: lang_src, lang_dst, n_arcs."""
    import ray

    from hedonic_ray.engine.superstep import iter_block_views

    g = doc_graph(sf_dir, directed=False)
    code, langs = _lang_codes(sf_dir)
    nl = len(langs)
    code_ref = ray.put(code)

    def scan(batch: pa.Table) -> pa.Table:
        cc = ray.get(code_ref)
        acc = np.zeros(nl * nl, np.int64)
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            tgt = bv.indices
            acc += np.bincount(cc[src] * nl + cc[tgt],
                               minlength=nl * nl)
        return pa.table({"k": pa.array(np.arange(nl * nl,
                                                 dtype=np.int64)),
                         "n": pa.array(acc)})

    acc = np.zeros(nl * nl, np.int64)
    for b in g.blocks.map_batches(scan, batch_format="pyarrow") \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows:
            np.add.at(acc, b.column("k").to_numpy(),
                      b.column("n").to_numpy())
    nz = np.flatnonzero(acc)
    return pa.table({
        "lang_src": pa.array([langs[k // nl] for k in nz], pa.string()),
        "lang_dst": pa.array([langs[k % nl] for k in nz], pa.string()),
        "n_arcs": pa.array(acc[nz])})


def doc_lang_assortativity(sf_dir: str) -> pa.Table:
    """EXACT-INTEGER attribute assortativity coefficient by language:
    r = (E·Σeᵢᵢ − Σaᵢ²) / (E² − Σaᵢ²) with E = 2m and
    aᵢ = Σⱼ eᵢⱼ — reported as the exact (num, den) pair (the
    all-integer posture of the hedonic certificate).  Derived from
    the `doc_lang_mixing` scan."""
    mix = doc_lang_mixing(sf_dir)
    langs = sorted(set(mix.column("lang_src").to_pylist())
                   | set(mix.column("lang_dst").to_pylist()))
    idx = {la: i for i, la in enumerate(langs)}
    nl = len(langs)
    e = np.zeros((nl, nl), dtype=object)
    for ls, ld, n in zip(mix.column("lang_src").to_pylist(),
                         mix.column("lang_dst").to_pylist(),
                         mix.column("n_arcs").to_pylist()):
        e[idx[ls], idx[ld]] = int(n)
    big_e = int(sum(int(x) for x in e.reshape(-1)))
    tr = int(sum(int(e[i, i]) for i in range(nl)))
    a2 = int(sum(int(sum(int(x) for x in e[i, :])) ** 2
                 for i in range(nl)))
    num = big_e * tr - a2
    den = big_e * big_e - a2
    return pa.table({"r_num": pa.array([num], pa.int64()),
                     "r_den": pa.array([den], pa.int64())})


def doc_core_number(sf_dir: str, *, k_max: int = 6,
                    rounds: int = 6) -> pa.Table:
    """CORE NUMBER (degeneracy layer) per vertex: the largest k whose
    fixed-round k-core peel retains the vertex — k-cores are nested,
    so ``core(v) = Σₖ [v ∈ k-core]`` over k = 1..k_max.  Reuses the
    `algos/kcore.py` peel per k (one masked-count pull per round);
    ``k_max`` bounds the scan at the max degree (fixture degrees are
    {3, 5}; raise for denser graphs).  Columns: vertex, core."""
    from hedonic_ray.algos.kcore import kcore_membership

    g = doc_graph(sf_dir, directed=False)
    core = np.zeros(g.n, dtype=np.int64)
    for k in range(1, k_max + 1):
        alive = kcore_membership(g, k, rounds=rounds)
        if not alive.any():
            break
        core += alive.astype(np.int64)
    return pa.table({"vertex": pa.array(np.arange(g.n, dtype=np.int64)),
                     "core": pa.array(core)})


def doc_contract(sf_dir: str) -> pa.Table:
    """COMMUNITY CONTRACTION (the Louvain/Leiden aggregation step):
    the weighted super-graph of the SQL-reproducible 2-pass hedonic
    partition — one row per unordered community pair (ca ≤ cb) with
    the inter-community edge count (ca = cb rows carry the
    intra-community edge count, i.e. the self-loop weight the next
    coarsening level needs).  ONE scatter over the CSR blocks against
    the broadcast membership (each undirected edge counted once via
    src < dst), per-block pair-count grids, one groupby — the exchange
    carries the community-pair grid, not the edges."""
    import ray
    from ray.data.aggregate import Sum

    from hedonic_ray.engine.superstep import iter_block_views

    g = doc_graph(sf_dir, directed=False)
    mem = hedonic_2pass_membership(sf_dir)
    # the per-block unique() below packs the community pair as
    # ca·n + cb — same bound discipline as algos/mst.py:58; past
    # ~3·10⁹ vertices switch to structured (ca, cb) partials
    assert len(mem) * len(mem) < (1 << 63), \
        "packed community-pair key overflows int64: use structured partials"
    mem_ref = ray.put(mem)

    def pairs(batch: pa.Table) -> pa.Table:
        mm = ray.get(mem_ref)
        ca_out, cb_out, w_out = [], [], []
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            tgt = bv.indices
            m = src < tgt           # each undirected edge once
            if not m.any():
                continue
            la, lb = mm[src[m]], mm[tgt[m]]
            ca = np.minimum(la, lb)
            cb = np.maximum(la, lb)
            key = ca * len(mm) + cb
            uniq, cnt = np.unique(key, return_counts=True)
            ca_out.append(uniq // len(mm))
            cb_out.append(uniq % len(mm))
            w_out.append(cnt.astype(np.int64))
        if not ca_out:
            return pa.table({"ca": pa.array([], pa.int64()),
                             "cb": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        return pa.table({"ca": pa.array(np.concatenate(ca_out)),
                         "cb": pa.array(np.concatenate(cb_out)),
                         "w": pa.array(np.concatenate(w_out))})

    out = (g.blocks.map_batches(pairs, batch_format="pyarrow")
           .groupby(["ca", "cb"]).aggregate(Sum("w", alias_name="weight")))
    rows = out.take_all()
    ca = np.array([r["ca"] for r in rows], np.int64)
    cb = np.array([r["cb"] for r in rows], np.int64)
    w = np.array([r["weight"] for r in rows], np.int64)
    order = np.lexsort((cb, ca))
    return pa.table({"ca": pa.array(ca[order]), "cb": pa.array(cb[order]),
                     "weight": pa.array(w[order])})


def doc_conductance(sf_dir: str) -> pa.Table:
    """Per-community CONDUCTANCE of the 2-pass hedonic partition —
    the standard cluster-quality audit, all-integer: cut(C) = edges
    leaving C, vol(C) = Σ degrees, φ reported as
    ``phi_e9 = 1e9·cut // min(vol, 2m − vol)`` (−1 when the min side
    is empty).  One scatter over the CSR blocks (both arc
    orientations: vol = arcs per community, cut = label-mismatch
    arcs per community), V-sized driver vectors, Python-int finish."""
    import ray

    from hedonic_ray.engine.superstep import iter_block_views

    g = doc_graph(sf_dir, directed=False)
    mem = hedonic_2pass_membership(sf_dir)
    mem_ref = ray.put(mem)
    ncom = int(mem.max()) + 1

    def scan(batch: pa.Table) -> pa.Table:
        mm = ray.get(mem_ref)
        vol = np.zeros(ncom, np.int64)
        cut = np.zeros(ncom, np.int64)
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            tgt = bv.indices
            ls, lt = mm[src], mm[tgt]
            vol += np.bincount(ls, minlength=ncom)
            mism = ls != lt
            if mism.any():
                cut += np.bincount(ls[mism], minlength=ncom)
        return pa.table({"c": pa.array(np.arange(ncom, dtype=np.int64)),
                         "vol": pa.array(vol), "cut": pa.array(cut)})

    vol = np.zeros(ncom, np.int64)
    cut = np.zeros(ncom, np.int64)
    for b in g.blocks.map_batches(scan, batch_format="pyarrow") \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        if b.num_rows:   # rows re-batch arbitrarily: key on the c column
            c = b.column("c").to_numpy()
            np.add.at(vol, c, b.column("vol").to_numpy())
            np.add.at(cut, c, b.column("cut").to_numpy())
    sizes = np.bincount(mem, minlength=ncom).astype(np.int64)
    two_m = int(vol.sum())
    comms = np.flatnonzero(sizes > 0)
    phi = np.empty(len(comms), np.int64)
    for i, c in enumerate(comms):
        mn = min(int(vol[c]), two_m - int(vol[c]))
        phi[i] = (1_000_000_000 * int(cut[c])) // mn if mn > 0 else -1
    return pa.table({"community": pa.array(comms.astype(np.int64)),
                     "n_members": pa.array(sizes[comms]),
                     "cut": pa.array(cut[comms]),
                     "vol": pa.array(vol[comms]),
                     "phi_e9": pa.array(phi)})


def doc_coloring(sf_dir: str, *, rounds: int = 16) -> pa.Table:
    """Jones–Plassmann GREEDY COLORING over the undirected doc graph
    (`algos/coloring.py`): md5 priorities, min-free-color picks.
    Columns: vertex, color (−1 if uncolored at the round cap), round
    (1-based, 0 if uncolored)."""
    from hedonic_ray.algos.coloring import jones_plassmann_coloring

    g = doc_graph(sf_dir, directed=False)
    color, decided = jones_plassmann_coloring(g, rounds=rounds)
    return pa.table({"vertex": pa.array(np.arange(g.n, dtype=np.int64)),
                     "color": pa.array(color),
                     "round": pa.array(decided)})


def doc_mis(sf_dir: str, *, rounds: int = 12) -> pa.Table:
    """Luby MAXIMAL INDEPENDENT SET over the undirected doc graph
    (`algos/mis.py`): md5 priorities, strict-local-minimum rounds.
    Columns: vertex, status (1 in-MIS / −1 excluded / 0 undecided),
    round (1-based round decided, 0 if undecided)."""
    from hedonic_ray.algos.mis import maximal_independent_set

    g = doc_graph(sf_dir, directed=False)
    status, decided = maximal_independent_set(g, rounds=rounds)
    return pa.table({"vertex": pa.array(np.arange(g.n, dtype=np.int64)),
                     "status": pa.array(status),
                     "round": pa.array(decided)})


def doc_mst(sf_dir: str, *, rounds: int = 16) -> pa.Table:
    """BORŮVKA MINIMUM SPANNING FOREST of the undirected doc graph
    (`algos/mst.py`): deterministic integer edge weights
    1 + (a·31 + b·17) % 97 under the strict (w, a, b) total order, so
    the forest is unique and the SQL oracle (per-round argmin +
    pick-forest closure) reproduces it exactly.  Columns: a, b
    (edge, a < b), weight, round (1-based Borůvka round)."""
    from hedonic_ray.algos.mst import minimum_spanning_forest

    g = doc_graph(sf_dir, directed=False)
    a, b, w, r = minimum_spanning_forest(g, rounds=rounds)
    return pa.table({"a": pa.array(a), "b": pa.array(b),
                     "weight": pa.array(w), "round": pa.array(r)})


def doc_matching(sf_dir: str, *, rounds: int = 8) -> pa.Table:
    """Fixed-round MAXIMAL MATCHING over the undirected doc graph
    (`algos/matching.py`): deterministic mutual-min-id proposal
    rounds, one masked neighbor-MIN pull per round, no exchange.
    Columns: a, b (matched pair, a < b), round (1-based)."""
    from hedonic_ray.algos.matching import maximal_matching

    g = doc_graph(sf_dir, directed=False)
    a, b, r = maximal_matching(g, rounds=rounds)
    return pa.table({"a": pa.array(a), "b": pa.array(b),
                     "round": pa.array(r)})


def doc_bipartite(sf_dir: str, *, seed: int = 1, rounds: int = 6) -> pa.Table:
    """BFS 2-COLORING / ODD-CYCLE CERTIFICATE from a deterministic
    seed: every reached vertex gets ``parity = dist % 2``;
    ``n_conflict`` counts its reached neighbors of the SAME parity —
    any nonzero row certifies an odd cycle inside the radius (the
    reached ball is bipartite iff every row is 0).  Two
    `masked_neighbor_count` pulls (even mask, odd mask) over the
    shared CSR blocks; no exchange anywhere.  Seed 1 like `doc_sssp`
    (doc 0's only planted link is a dropped self-loop).  Columns:
    vertex, dist, parity, n_conflict."""
    import ray

    from hedonic_ray.algos.bfs import bfs_distances
    from hedonic_ray.algos.kcore import masked_neighbor_count

    g = doc_graph(sf_dir, directed=False)
    dist = bfs_distances(g, np.array([seed], dtype=np.int64),
                         rounds=rounds)
    reached = dist >= 0
    par = np.where(reached, dist % 2, -1)
    cnt_even = masked_neighbor_count(
        g, ray.put((par == 0).astype(np.int64)))
    cnt_odd = masked_neighbor_count(
        g, ray.put((par == 1).astype(np.int64)))
    conflict = np.where(par == 0, cnt_even, cnt_odd)
    reach = np.flatnonzero(reached)
    return pa.table({"vertex": pa.array(reach.astype(np.int64)),
                     "dist": pa.array(dist[reach]),
                     "parity": pa.array(par[reach]),
                     "n_conflict": pa.array(
                         conflict[reach].astype(np.int64))})


def doc_node2vec(sf_dir: str, *, p: int = 4, q: int = 2,
                 prev_stride: int = 17) -> pa.Table:
    """node2vec 2nd-order transition probabilities on the directed doc
    graph for the sampled (prev ≡ 0 mod 17) walk contexts — exact
    integer weights {q, p·q, p} and prob_e6 rationals
    (`algos/node2vec.py`)."""
    from hedonic_ray.algos.node2vec import node2vec_transition_probs

    raw = doc_edges_cached(sf_dir)   # pre-canonical: dups + self-loops
    _e, _u, n = _GRAPH_CACHE[(sf_dir, "edges")]
    edges = canonicalize_edges(raw, n, directed=True)
    return node2vec_transition_probs(edges, n, p=p, q=q,
                                     prev_stride=prev_stride)


def doc_simrank(sf_dir: str, *, rounds: int = 2, k: int = 50,
                num_partitions: int = 8) -> pa.Table:
    """SIMRANK (Jeh & Widom 2002) on the directed doc graph, fixed
    ``rounds`` iterations of the e9 fixed-point recursion
    ``S_{r+1}(a,b) = floor(8 · Σ_{u→a, v→b} S_r(u,v) / (10·|I(a)|·
    |I(b)|))`` with C = 0.8 and S_r(u,u) ≡ 1e9 — "two pages are
    similar if similar pages link to them", the structural companion
    to co-citation.  Top-``k`` pairs by (s_e9 desc, a, b).

    Every round floors to the SAME e9 integers the unrolled SQL
    oracle computes, so the gate compare is exact; the engine round
    cap EQUALS the SQL unroll cap (the graph_mst parity rule).

    Scale shape per round: the sparse S_r pair table (both
    orientations) hash-joins the edge table TWICE (u→A, then v→B) and
    one groupby(A, B) sums the scatter; the constant diagonal
    contribution rides as ``1e9 · common(A,B)`` (the co-citation
    count, computed once by the same wedge groupby the cocite query
    uses).  No driver state beyond the n-sized in-degree vector (the
    components-table convention); pair-table growth is the standard
    SimRank densification, bounded here by rounds=2 and at production
    scale by per-source top-k pruning between rounds (documented
    trade-off, not applied at gate scale)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from hedonic_ray.context import drop_empty_blocks

    def noloop(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        m = pa.array(src != dst)
        return pa.table({"src": t.column("src").filter(m),
                         "dst": t.column("dst").filter(m)})

    # the cached edge table keeps self-loops (build_link_graph drops
    # them when building the CSR); SimRank's I(·) excludes them too
    edges = (doc_edges_cached(sf_dir)
             .map_batches(noloop, batch_format="pyarrow")
             .materialize())
    g = doc_graph(sf_dir, directed=True)
    n = int(g.n)

    ind = np.zeros(n, np.int64)
    for b in (edges.groupby("dst")
              .aggregate(Count(alias_name="d"))
              .iter_batches(batch_size=65536, batch_format="pyarrow")):
        ind[b.column("dst").to_numpy()] = b.column("d").to_numpy()
    ind_ref = ray.put(ind)

    def src_pairs(grp: pa.Table) -> pa.Table:
        dsts = np.unique(grp.column("dst").to_numpy().astype(np.int64))
        if len(dsts) < 2:
            e = pa.array([], pa.int64())
            return pa.table({"a": e, "b": e})
        ii, jj = np.triu_indices(len(dsts), k=1)
        return pa.table({"a": pa.array(dsts[ii], pa.int64()),
                         "b": pa.array(dsts[jj], pa.int64())})

    common = (edges.groupby("src")
              .map_groups(src_pairs, batch_format="pyarrow")
              .groupby(["a", "b"])
              .aggregate(Count(alias_name="c"))
              .materialize())

    def scale_round(t: pa.Table, sum_col: str) -> pa.Table:
        dd = ray.get(ind_ref)
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        raw = t.column(sum_col).to_numpy().astype(np.int64)
        den = 10 * dd[a] * dd[b]
        s = np.where(den > 0, 8 * raw // np.maximum(den, 1), 0)
        m = pa.array(s > 0)
        return pa.table({"a": pa.array(a, pa.int64()).filter(m),
                         "b": pa.array(b, pa.int64()).filter(m),
                         "s": pa.array(s, pa.int64()).filter(m)})

    def diag_term(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy().astype(np.int64)
        return pa.table({"a": t.column("a").cast(pa.int64()),
                         "b": t.column("b").cast(pa.int64()),
                         "part": pa.array(c * np.int64(1_000_000_000))})

    # round 1: S_0 is the identity, so the scatter sum IS the
    # diagonal term
    s_cur = common.map_batches(
        lambda t: scale_round(diag_term(t).rename_columns(
            ["a", "b", "raw"]), "raw"),
        batch_format="pyarrow").materialize()

    s_edge = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                        ("s", pa.int64())])
    s_e = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    for _ in range(rounds - 1):
        def both(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy()
            b = t.column("b").to_numpy()
            s = t.column("s").to_numpy()
            return pa.table({
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
                "s": pa.array(np.concatenate([s, s]), pa.int64())})

        s_both = s_cur.map_batches(both, batch_format="pyarrow")
        j1 = drop_empty_blocks(s_both, s_edge).join(
            drop_empty_blocks(edges.select_columns(["src", "dst"]), s_e),
            "inner", num_partitions, on=("u",), right_on=("src",))

        def proj1(t: pa.Table) -> pa.Table:
            return pa.table({"va": t.column("dst").cast(pa.int64()),
                             "v": t.column("v").cast(pa.int64()),
                             "s": t.column("s").cast(pa.int64())})

        m1 = j1.map_batches(proj1, batch_format="pyarrow")
        s_m1 = pa.schema([("va", pa.int64()), ("v", pa.int64()),
                          ("s", pa.int64())])
        j2 = drop_empty_blocks(m1, s_m1).join(
            drop_empty_blocks(edges.select_columns(["src", "dst"]), s_e),
            "inner", num_partitions, on=("v",), right_on=("src",))

        def proj2(t: pa.Table) -> pa.Table:
            va = t.column("va").to_numpy().astype(np.int64)
            vb = t.column("dst").to_numpy().astype(np.int64)
            s = t.column("s").to_numpy().astype(np.int64)
            m = pa.array(va < vb)   # symmetric: keep canonical order
            return pa.table({"a": pa.array(va).filter(m),
                             "b": pa.array(vb).filter(m),
                             "part": pa.array(s).filter(m)})

        scatter = j2.map_batches(proj2, batch_format="pyarrow")
        raw = (scatter.union(
            common.map_batches(diag_term, batch_format="pyarrow"))
            .groupby(["a", "b"])
            .aggregate(Sum("part", alias_name="raw")))
        s_cur = raw.map_batches(
            lambda t: scale_round(t, "raw"),
            batch_format="pyarrow").materialize()

    top = (s_cur.sort(["s", "a", "b"], descending=[True, False, False])
           .limit(k).take_all())
    return pa.table({
        "a": pa.array([int(r["a"]) for r in top], pa.int64()),
        "b": pa.array([int(r["b"]) for r in top], pa.int64()),
        "s_e9": pa.array([int(r["s"]) for r in top], pa.int64())})
