import numpy as np
import pytest

from hedonic_ray.engine.superstep import iter_block_views
from hedonic_ray.graph.build import (
    build_link_graph,
    canonicalize_edges,
    edges_from_numpy,
)


def _adjacency_from_blocks(g):
    nb = {v: set() for v in range(g.n)}
    for batch in g.blocks.iter_batches(batch_size=4, batch_format="pyarrow"):
        for bv in iter_block_views(batch):
            src = bv.src_per_edge()
            for u, v in zip(src.tolist(), bv.indices.tolist()):
                nb[u].add(v)
    return nb


def test_undirected_build_dedup_selfloops():
    # duplicates, self loops, both orientations
    edges = np.array([[0, 1], [1, 0], [0, 1], [2, 2], [1, 2], [3, 4]])
    g = build_link_graph(edges_from_numpy(edges), 5, directed=False, num_parts=2)
    nb = _adjacency_from_blocks(g)
    assert nb == {0: {1}, 1: {0, 2}, 2: {1}, 3: {4}, 4: {3}}
    assert g.m == 6  # arcs
    assert g.undirected_edge_count == 3
    np.testing.assert_array_equal(g.out_degree, [1, 2, 1, 1, 1])
    assert g.density() == pytest.approx(3 / 10)


def test_directed_build():
    edges = np.array([[0, 1], [0, 1], [1, 0], [2, 0], [4, 4]])
    g = build_link_graph(edges_from_numpy(edges), 5, directed=True, num_parts=3)
    nb = _adjacency_from_blocks(g)
    assert nb == {0: {1}, 1: {0}, 2: {0}, 3: set(), 4: set()}
    assert g.m == 3
    np.testing.assert_array_equal(g.out_degree, [1, 1, 1, 0, 0])


def test_canonicalize_edges_minmax():
    edges = np.array([[3, 1], [1, 3], [1, 3], [2, 2], [0, 4]])
    out = canonicalize_edges(edges_from_numpy(edges), 5, directed=False)
    rows = sorted((r["src"], r["dst"]) for r in out.take_all())
    assert rows == [(0, 4), (1, 3)]


def test_partition_ranges_cover():
    rng = np.random.default_rng(7)
    edges = rng.integers(0, 50, size=(300, 2))
    g = build_link_graph(edges_from_numpy(edges), 50, directed=False, num_parts=7)
    seen = []
    for batch in g.blocks.iter_batches(batch_size=8, batch_format="pyarrow"):
        for bv in iter_block_views(batch):
            assert bv.hi - bv.lo <= g.span
            assert len(bv.indptr) == bv.hi - bv.lo + 1
            assert np.all(np.diff(bv.indptr) >= 0)
            seen.append((bv.lo, bv.hi))
    # blocks must not overlap
    seen.sort()
    for (l1, h1), (l2, h2) in zip(seen, seen[1:]):
        assert h1 <= l2


def test_join_based_id_assignment_matches_broadcast():
    """Dataset.join scale path ≡ broadcast vocabulary path."""
    from hedonic_ray.graph.build import (
        assign_vertex_ids,
        edges_from_pages,
        edges_from_pages_join,
    )
    from hedonic_ray.sources.synth import generate_pages

    pages = generate_pages(2, 30, p_in=0.25, multiplier=0.1, seed=9).materialize()
    uref, n = assign_vertex_ids(pages)
    a = sorted((r["src"], r["dst"])
               for r in edges_from_pages(pages, uref).take_all())
    b_ds, n2 = edges_from_pages_join(pages, num_partitions=4)
    b = sorted((r["src"], r["dst"]) for r in b_ds.take_all())
    assert n == n2 == 60
    assert a == b


def test_id_lookup_rejects_overwidth_urls():
    """A link url LONGER than the vocabulary's fixed string width must
    be dropped, not silently truncated into a prefix match (ADVICE r1:
    'https://a.example/page/deeper' vs page 'https://a.example/page')."""
    import pyarrow as pa
    import ray
    from hedonic_ray.graph.build import _id_lookup_batch

    vocab = np.unique(np.array(["https://a.example/page",
                                "https://b.example/x"]).astype(str))
    ref = ray.put(vocab)
    batch = pa.table({
        "src_url": ["https://b.example/x", "https://b.example/x"],
        "dst_url": ["https://a.example/page/deeper",  # over-width: DROP
                    "https://a.example/page"],        # exact: keep
    })
    out = _id_lookup_batch(batch, ref)
    assert out.num_rows == 1
    assert out.column("dst").to_pylist() == [0]


def test_url_id_map_handles_duplicate_urls():
    """Re-crawled pages (duplicate urls) must collapse to ONE vid each,
    with dense ranks and boundary-spanning runs handled (ADVICE r1)."""
    import pyarrow as pa
    import ray.data as rd
    from hedonic_ray.graph.build import url_id_map

    urls = ["u%03d" % (i % 7) for i in range(40)]  # 7 distinct, many dups
    pages = rd.from_arrow(pa.table({"url": urls})).repartition(5)
    m, n = url_id_map(pages, num_partitions=4)
    rows = sorted((r["url"], r["vid"]) for r in m.take_all())
    assert n == 7
    assert rows == [("u%03d" % i, i) for i in range(7)]


def test_graph_from_pages_both_id_paths_identical():
    """The auto-switch endpoints (broadcast vocab vs distributed join)
    build identical graphs."""
    from hedonic_ray.graph.build import graph_from_pages
    from hedonic_ray.sources.synth import generate_pages

    pages = generate_pages(2, 25, p_in=0.3, multiplier=0.1, seed=17).materialize()
    ga = graph_from_pages(pages, directed=True, id_assign="broadcast")
    gb = graph_from_pages(pages, directed=True, id_assign="join")
    assert ga.n == gb.n and ga.m == gb.m
    assert _adjacency_from_blocks(ga) == _adjacency_from_blocks(gb)


def test_triangle_probe_auto_switch():
    """probe='auto' picks broadcast below the threshold and bucketed
    above it, both equal to the explicit modes."""
    from hedonic_ray.algos import triangles as T

    edges = [(i, (i + 1) % 12) for i in range(12)] + [(i, (i + 2) % 12)
                                                      for i in range(12)]
    g = build_link_graph(edges_from_numpy(np.array(edges)), 12,
                         directed=False, num_parts=3)
    base = T.triangle_count(g, probe="broadcast")
    auto = T.triangle_count(g, probe="auto")
    np.testing.assert_array_equal(auto.per_vertex, base.per_vertex)
    old = T.PROBE_BROADCAST_MAX
    try:
        T.PROBE_BROADCAST_MAX = 0  # force the bucketed side of the switch
        forced = T.triangle_count(g, probe="auto")
    finally:
        T.PROBE_BROADCAST_MAX = old
    np.testing.assert_array_equal(forced.per_vertex, base.per_vertex)
