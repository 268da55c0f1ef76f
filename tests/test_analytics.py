import numpy as np
import pytest

import oracles
from fixtures import (
    CYCLE8_ALT,
    CYCLE8_EDGES,
    CYCLE8_HALVES,
    PATH5_ALL,
    PATH5_EDGES,
    PATH5_HALF,
    T_EDGES,
    T_PART_A0,
    T_PART_A1,
    T_PART_ALL,
    T_PART_WINDOW,
    TWO_TRI_EDGES,
    TWO_TRI_PART,
    make_graph,
    rand_edges,
)
from hedonic_ray.analytics import hedonic_stats as hs


@pytest.mark.parametrize("alpha", [0.0, 0.2, 0.5, 0.9, 1.0])
def test_equilibrium_fraction_matches_oracle(alpha):
    n = 25
    edges = rand_edges(n, 0.2, seed=17)
    g = make_graph(edges, n, num_parts=3)
    mem = np.arange(n) % 4
    got = hs.equilibrium_fraction(g, mem, alpha)
    exp = oracles.equilibrium_fraction(n, edges, list(mem), alpha)
    assert got == pytest.approx(exp)


def test_classification_and_robustness_match_oracle():
    n = 20
    edges = rand_edges(n, 0.25, seed=23)
    g = make_graph(edges, n, num_parts=3)
    for mem in [np.arange(n) % 3, np.zeros(n, np.int64), np.arange(n) % 7]:
        st = hs.vertex_stats(g, mem)
        cls = hs.classify_satisfaction(g, mem, stats=st)
        info = oracles.nodes_info(n, edges, list(mem))
        names = {hs.ALWAYS: "always_satisfied", hs.NEVER: "never_satisfied",
                 hs.RELATIVE: "relatively_satisfied"}
        for v in range(n):
            assert names[cls[v]] == oracles.classify_satisfaction(
                info[v], mem[v]), f"v={v} mem={mem}"
        assert hs.partition_robustness(g, mem, stats=st) == pytest.approx(
            oracles.partition_robustness(n, edges, list(mem)))


def test_closed_form_equilibria_t_graph():
    g = make_graph(T_EDGES, 6)
    st = hs.vertex_stats(g, np.array(T_PART_ALL))
    for a in [0.0, 0.3, 0.5, 0.8, 1.0]:
        assert hs.equilibrium_fraction(g, np.array(T_PART_ALL), a, stats=st) == 1.0
    st0 = hs.vertex_stats(g, np.array(T_PART_A0))
    assert hs.equilibrium_fraction(g, np.array(T_PART_A0), 0.0, stats=st0) == 1.0
    assert hs.equilibrium_fraction(g, np.array(T_PART_A0), 0.3, stats=st0) < 1.0
    st1 = hs.vertex_stats(g, np.array(T_PART_A1))
    assert hs.equilibrium_fraction(g, np.array(T_PART_A1), 1.0, stats=st1) == 1.0
    assert hs.equilibrium_fraction(g, np.array(T_PART_A1), 0.5, stats=st1) < 1.0
    stw = hs.vertex_stats(g, np.array(T_PART_WINDOW))
    for a, ok in [(0.1, False), (0.25, True), (0.3, True), (0.4, False)]:
        assert (hs.equilibrium_fraction(g, np.array(T_PART_WINDOW), a,
                                        stats=stw) == 1.0) is ok


def test_closed_form_equilibria_path_and_cycle():
    g = make_graph(PATH5_EDGES, 5)
    st = hs.vertex_stats(g, np.array(PATH5_ALL))
    for a in [0.0, 0.5, 1.0]:
        assert hs.equilibrium_fraction(g, np.array(PATH5_ALL), a, stats=st) == 1.0
    sth = hs.vertex_stats(g, np.array(PATH5_HALF))
    assert hs.equilibrium_fraction(g, np.array(PATH5_HALF), 0.75, stats=sth) == 1.0
    assert hs.equilibrium_fraction(g, np.array(PATH5_HALF), 0.3, stats=sth) < 1.0

    g8 = make_graph(CYCLE8_EDGES, 8)
    sth8 = hs.vertex_stats(g8, np.array(CYCLE8_HALVES))
    for a in [0.0, 0.5, 1.0]:
        assert hs.equilibrium_fraction(g8, np.array(CYCLE8_HALVES), a,
                                       stats=sth8) == 1.0
    sta = hs.vertex_stats(g8, np.array(CYCLE8_ALT))
    for a in [0.0, 0.3, 1.0]:
        assert hs.equilibrium_fraction(g8, np.array(CYCLE8_ALT), a, stats=sta) < 1.0


def test_two_triangles_robust_partition():
    g = make_graph(TWO_TRI_EDGES, 6)
    mem = np.array(TWO_TRI_PART)
    assert hs.partition_robustness(g, mem) == 1.0


def test_resolution_spectrum_matches_pointwise_equilibrium():
    n = 18
    edges = rand_edges(n, 0.3, seed=31)
    g = make_graph(edges, n, num_parts=3)
    mem = np.arange(n) % 3
    res, fracs, rob = hs.resolution_spectrum(g, mem)
    st = hs.vertex_stats(g, mem)
    cls = hs.classify_satisfaction(g, mem, stats=st)
    always = (cls == hs.ALWAYS).sum()
    assert rob == pytest.approx(always / n)
    # reference semantics: fractions count always + doubtful-in-eq only
    for a, fr in zip(res, fracs):
        eq = hs.equilibrium_flags(g, mem, a, stats=st)
        expected = (always + (eq & (cls == hs.RELATIVE)).sum()) / n
        assert fr == pytest.approx(expected)


def test_best_response_matches_oracle():
    n = 22
    edges = rand_edges(n, 0.25, seed=41)
    g = make_graph(edges, n, num_parts=3)
    mem = np.arange(n) % 5
    for a in [0.0, 0.13, 0.5, 1.0]:
        got = hs.best_response(g, mem, a)
        exp = oracles.best_response(n, edges, list(mem), a)
        np.testing.assert_array_equal(got, exp)


def test_potential_matches_oracle():
    n = 20
    edges = rand_edges(n, 0.3, seed=47)
    g = make_graph(edges, n, num_parts=3)
    mem = np.arange(n) % 4
    for a in [0.0, 0.2, 0.7]:
        assert hs.partition_potential(g, mem, a) == pytest.approx(
            oracles.cpm_potential(n, edges, list(mem), a))


def test_ari_matches_oracle():
    rng = np.random.default_rng(5)
    for _ in range(5):
        a = rng.integers(0, 4, 30)
        b = rng.integers(0, 3, 30)
        assert hs.adjusted_rand_index(a, b) == pytest.approx(
            oracles.adjusted_rand_index(a, b))
    x = rng.integers(0, 4, 30)
    assert hs.adjusted_rand_index(x, x) == pytest.approx(1.0)


def test_exhaustive_tiny_oracle_sweep():
    """F5: all connected graphs on 4 vertices x all partitions —
    robustness, equilibrium, potential exact vs enumeration oracles."""
    n = 4
    parts = oracles.all_partitions_membership(n)
    graphs = oracles.connected_graphs(n)[::9]  # sample for runtime
    for edges in graphs:
        g = make_graph(edges, n, num_parts=2)
        for mem in parts:
            m = np.array(mem)
            st = hs.vertex_stats(g, m)  # ONE gather, reused by every check
            assert hs.partition_robustness(g, m, stats=st) == pytest.approx(
                oracles.partition_robustness(n, edges, list(mem)))
            for a in [0.0, 0.33, 1.0]:
                assert hs.equilibrium_fraction(g, m, a, stats=st) == pytest.approx(
                    oracles.equilibrium_fraction(n, edges, list(mem), a))
                assert hs.partition_potential(g, m, a, stats=st) == pytest.approx(
                    oracles.cpm_potential(n, edges, list(mem), a))


def test_community_stability():
    g = make_graph(TWO_TRI_EDGES, 6)
    out = hs.evaluate_community_stability(g, [0, 4, 5])
    assert set(out) == {"fraction_want_to_leave", "fraction_want_to_join"}
    assert 0.0 <= out["fraction_want_to_leave"] <= 1.0
    assert 0.0 <= out["fraction_want_to_join"] <= 1.0


def test_spectra_helpers():
    from hedonic_ray.analytics import spectra as sp

    seq = sp.generate_sequence(0.3, 7)
    assert len(seq) == 7 and seq == sorted(seq)
    assert 0.0 in seq and 1.0 in seq and 0.3 in seq

    mem = np.array([0, 5, 9, 2])
    np.testing.assert_array_equal(sp.limit_community_count(mem, 4),
                                  [0, 3, 3, 2])

    a = np.array([0, 1, 1, 0])
    assert sp.membership_hash(a) == sp.membership_hash(a.copy())
    assert sp.membership_hash(a) != sp.membership_hash(np.array([0, 1, 1, 1]))


def test_community_spectra_two_triangles():
    from hedonic_ray.analytics import spectra as sp

    g = make_graph(TWO_TRI_EDGES, 6)
    out = sp.community_spectra(g, [[1, 2, 3], [0, 4, 5]]).to_pandas()
    assert len(out) == 2
    # the planted triangles are the robust partition (TWO_TRI_PART)
    assert (out.robustness == 1.0).all()
    assert (out.min_eq_fraction == 1.0).all()


def test_isolated_vertices():
    from hedonic_ray.analytics import spectra as sp

    g = make_graph([(0, 1), (2, 3)], 6)
    np.testing.assert_array_equal(sp.isolated_vertices(g), [4, 5])


# ------------------------------------------ exact-integer certificates (r3)


def test_nash_flags_exact_matches_float_path():
    """At a rational α = num/den away from ties, the exact-integer
    all-coalition flags equal the float isclose path."""
    n = 24
    edges = rand_edges(n, 0.22, seed=41)
    g = make_graph(edges, n, num_parts=3)
    for mem in [np.arange(n) % 3, np.arange(n) % 5, np.zeros(n, np.int64)]:
        for num, den in [(1, 7), (2, 9), (1, 3)]:
            exact = hs.nash_flags_exact(g, mem, num, den, candidates="all")
            flt = hs.equilibrium_flags(g, mem, num / den)
            # the float path may ADD spurious equals via isclose rtol,
            # never remove true ones; on these fixtures no near-ties
            # exist and they agree exactly
            np.testing.assert_array_equal(exact, flt)


def test_nash_flags_exact_adjacent_matches_best_response_fixpoint():
    """candidates="adjacent" satisfied ⟺ best_response keeps the
    vertex in place (the dynamics' own move rule)."""
    n = 22
    edges = rand_edges(n, 0.25, seed=7)
    g = make_graph(edges, n, num_parts=3)
    mem = np.arange(n) % 4
    num, den = 2, 11
    sat = hs.nash_flags_exact(g, mem, num, den, candidates="adjacent")
    br = hs.best_response(g, mem, num / den)
    np.testing.assert_array_equal(sat, br == mem)


def test_spectrum_exact_matches_float_spectrum():
    n = 20
    edges = rand_edges(n, 0.3, seed=3)
    g = make_graph(edges, n, num_parts=3)
    mem = np.arange(n) % 4
    tenths, eq_counts, robust = hs.spectrum_exact_tenths(g, mem)
    res, fracs, rob = hs.resolution_spectrum(g, mem)
    assert robust == pytest.approx(rob * n)
    np.testing.assert_array_equal(tenths, np.arange(11))
    # float spectrum uses isclose (can only add ties); on this fixture
    # the grids agree exactly
    np.testing.assert_array_equal(eq_counts, np.round(fracs * n).astype(int))


def test_metrics_exact_consistency():
    n = 26
    edges = rand_edges(n, 0.2, seed=13)
    g = make_graph(edges, n, num_parts=3)
    mem = np.arange(n) % 5
    other = np.arange(n) % 3
    met = hs.metrics_exact(g, mem, other)
    assert met["n_vertices"] == n
    assert met["alpha_den"] == n * (n - 1) // 2
    assert met["alpha_num"] == g.undirected_edge_count
    # potential_scaled / den == float CPM potential at α = density
    phi = hs.partition_potential(g, mem)
    assert met["potential_scaled"] / met["alpha_den"] == pytest.approx(phi)
    # ARI pair reproduces the float closed form
    ari = hs.adjusted_rand_index(mem, other)
    assert met["ari_num2"] / met["ari_den2"] == pytest.approx(ari)
    # counts consistent with the float paths
    assert met["robust_count"] == int(
        (hs.classify_satisfaction(g, mem) == hs.ALWAYS).sum())
