import numpy as np
import pytest

from fixtures import TWO_TRI_EDGES, make_graph, rand_edges
from hedonic_ray.analytics import subgraphs as sg


def test_edges_between():
    g = make_graph(TWO_TRI_EDGES, 6)
    mem = np.array([0, 1, 1, 1, 0, 0])
    # edges crossing: (0? coalition0={0,4,5}, coalition1={1,2,3})
    edges = TWO_TRI_EDGES
    expect = sum(1 for u, v in edges if mem[u] != mem[v])
    assert sg.edges_between(g, mem, 0, 1) == expect
    intra0 = sum(1 for u, v in edges if mem[u] == 0 and mem[v] == 0)
    assert sg.edges_between(g, mem, 0, 0) == intra0


def test_neighborhood_closure_and_induced():
    g = make_graph([(0, 1), (1, 2), (2, 3), (3, 4)], 5)
    nb = sg.neighborhood_closure(g, [1])
    np.testing.assert_array_equal(nb, [0, 1, 2])
    t = sg.induced_subgraph_edges(g, [0, 1, 2])
    assert sorted(zip(t.column("src").to_pylist(),
                      t.column("dst").to_pylist())) == [(0, 1), (1, 2)]


def test_degree_histogram_totals():
    n = 30
    g = make_graph(rand_edges(n, 0.2, seed=3), n)
    t = sg.degree_histogram(g, bins=5)
    assert sum(t.column("count").to_pylist()) == n


def test_cluster_degree_distributions():
    g = make_graph(TWO_TRI_EDGES, 6)
    mem = np.array([0, 1, 1, 1, 0, 0])
    key = sg.cluster_degree_distributions(g, mem)
    # both coalitions are triangles → internal degree 2 for all members
    assert key == ((((2, 3),)) , (((2, 3))),) or key == (((2, 3),), ((2, 3),))


def test_rescore_ari():
    import ray.data as rd
    import pyarrow as pa

    results = rd.from_arrow(pa.table({"partition_seed": [1, 2]}))
    memberships = {1: np.array([0, 0, 1, 1]), 2: np.array([0, 1, 0, 1])}
    truth = np.array([0, 0, 1, 1])
    out = sg.rescore_ari(results, memberships, truth).take_all()
    by_seed = {r["partition_seed"]: r["adjusted_rand"] for r in out}
    assert by_seed[1] == pytest.approx(1.0)
    assert by_seed[2] < 1.0
