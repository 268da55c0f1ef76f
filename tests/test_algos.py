import numpy as np
import pytest

import oracles
from fixtures import make_graph, rand_edges
from hedonic_ray.algos.components import connected_components
from hedonic_ray.algos.hedonic import hedonic_communities, onepass_hedonic
from hedonic_ray.algos.labelprop import label_propagation, onepass_improvement
from hedonic_ray.algos.pagerank import pagerank
from hedonic_ray.algos.triangles import triangle_count
from hedonic_ray.sources.synth import (
    ground_truth_membership,
    noisy_membership,
    sbm_edges,
)


@pytest.mark.parametrize("gather", ["dense", "shuffle"])
def test_pagerank_matches_numpy_oracle(gather):
    n = 40
    rng = np.random.default_rng(3)
    edges = [(int(u), int(v)) for u, v in rng.integers(0, n, size=(150, 2))
             if u != v]
    g = make_graph(edges, n, directed=True, num_parts=4)
    res = pagerank(g, gather=gather, max_iters=100, tol=1e-14)
    # oracle runs on the deduped directed edge set
    dedup = sorted({(u, v) for u, v in edges})
    expected = oracles.pagerank_dense(n, dedup, iters=100, tol=1e-14)
    np.testing.assert_allclose(res.state["rank"], expected, atol=1e-6)
    assert res.converged
    assert abs(res.state["rank"].sum() - 1.0) < 1e-9


@pytest.mark.parametrize("gather", ["dense", "shuffle"])
def test_connected_components_exact(gather):
    n = 60
    edges = rand_edges(n, 0.03, seed=11)
    g = make_graph(edges, n, num_parts=5)
    res = connected_components(g, gather=gather)
    np.testing.assert_array_equal(res.state["component"],
                                  oracles.components_uf(n, edges))
    assert res.converged


def test_components_shard_backend_bit_identical():
    """The resident-shard-state components path (`_ComponentsVecSpec`)
    is bit-identical to the Dataset backends per the monotone-min
    argument in its docstring: same labels, iteration count and
    convergence flag — integer labels, so exact equality, across
    shard counts including the P=1 no-split path."""
    n = 180
    edges = rand_edges(n, 0.012, seed=23)
    expected = oracles.components_uf(n, edges)
    for num_parts in (1, 5):
        g = make_graph(edges, n, num_parts=num_parts)
        a = connected_components(g, gather="dense")
        b = connected_components(g, gather="shards")
        np.testing.assert_array_equal(b.state["component"],
                                      a.state["component"])
        np.testing.assert_array_equal(a.state["component"], expected)
        assert b.iterations == a.iterations
        assert b.converged and a.converged


@pytest.mark.parametrize("gather", ["dense", "shuffle"])
def test_lp_onepass_matches_oracle(gather):
    n = 30
    edges = rand_edges(n, 0.15, seed=5)
    g = make_graph(edges, n, num_parts=4)
    init = np.arange(n) % 5
    out = onepass_improvement(g, init, gather=gather)
    np.testing.assert_array_equal(out, oracles.lp_onepass(n, edges, init))


def test_lp_full_terminates():
    n = 50
    edges = rand_edges(n, 0.1, seed=8)
    g = make_graph(edges, n, num_parts=4)
    res = label_propagation(g, max_iters=50)
    assert res.converged
    assert res.state["label"].min() >= 0


@pytest.mark.parametrize("gather", ["dense", "shuffle"])
def test_onepass_hedonic_matches_best_response(gather):
    n = 25
    edges = rand_edges(n, 0.2, seed=13)
    g = make_graph(edges, n, num_parts=3)
    init = np.arange(n) % 4
    out = onepass_hedonic(g, init, gather=gather)
    np.testing.assert_array_equal(
        out, oracles.best_response(n, edges, list(init), alpha=0.0))


@pytest.mark.parametrize("noise", [0.0, 0.5, 2.0])
def test_hedonic_reaches_equilibrium_sbm(noise):
    edges = sbm_edges(3, 20, p_in=0.5, multiplier=0.05, seed=4)
    n = 60
    g = make_graph(edges.tolist(), n, num_parts=4)
    gt = ground_truth_membership(3, 20)
    init = noisy_membership(gt, noise, seed=9)
    res = hedonic_communities(g, init_membership=init, max_iters=100)
    assert res.converged, f"not converged, active={res.metrics[-1]['active_vertices']}"
    mem = res.state["coalition"]
    alpha = g.density()
    assert oracles.is_equilibrium(n, edges.tolist(), mem.tolist(), alpha)
    # easy SBM from ground-truth start recovers the planted partition
    if noise == 0.0:
        assert oracles.adjusted_rand_index(mem, gt) == pytest.approx(1.0)


def test_hedonic_local_sweep_equilibrium():
    """The tasks-backend within-partition local-moving sweep takes a
    different trajectory than the pure synchronous step but must still
    certify a Nash equilibrium (active == 0 on the full candidate
    rule), and should not be slower in supersteps."""
    edges = sbm_edges(4, 25, p_in=0.4, multiplier=0.05, seed=7)
    n = 100
    g = make_graph(edges.tolist(), n, num_parts=4)
    fast = hedonic_communities(g, max_iters=150, gather="tasks")
    assert fast.converged
    mem = fast.state["coalition"]
    assert oracles.is_equilibrium(n, edges.tolist(), mem.tolist(), g.density())
    assert any(m.get("sweep") for m in fast.metrics), "sweep never engaged"
    slow = hedonic_communities(g, max_iters=150, gather="tasks",
                               local_sweep=False)
    assert slow.converged
    assert fast.iterations <= slow.iterations + 10


def test_hedonic_potential_monotone_on_easy_graph():
    edges = sbm_edges(2, 15, p_in=0.6, multiplier=0.05, seed=2)
    g = make_graph(edges.tolist(), 30, num_parts=3)
    res = hedonic_communities(g, max_iters=100)  # singleton init
    assert res.converged
    phis = [m["potential"] for m in res.metrics]
    assert phis[-1] >= phis[0]


@pytest.mark.parametrize("gather", ["dense", "shuffle"])
def test_triangles_match_bruteforce(gather):
    n = 40
    edges = rand_edges(n, 0.15, seed=21)
    g = make_graph(edges, n, num_parts=4)
    res = triangle_count(g, gather=gather)
    total, per = oracles.triangles_brute(n, edges)
    assert res.total == total
    np.testing.assert_array_equal(res.per_vertex, per)


def test_triangles_on_sbm_with_hubs():
    from hedonic_ray.sources.synth import zipf_hub_edges

    edges = sbm_edges(2, 30, p_in=0.3, multiplier=0.1, seed=6)
    hubs = zipf_hub_edges(60, 120, seed=7)
    all_edges = np.concatenate([edges, hubs])
    g = make_graph(all_edges.tolist(), 60, num_parts=5)
    und = sorted({(min(u, v), max(u, v)) for u, v in all_edges.tolist() if u != v})
    total, per = oracles.triangles_brute(60, und)
    res = triangle_count(g)
    assert res.total == total
    np.testing.assert_array_equal(res.per_vertex, per)


@pytest.mark.parametrize("algo_kind", ["hedonic", "lp"])
def test_tasks_backend_matches_dataset_backends(algo_kind):
    """The task-exchange backend must be bit-identical to both Dataset
    gathers (same decision rules, same tie-breaks, same damping)."""
    edges = sbm_edges(3, 15, p_in=0.4, multiplier=0.1, seed=31)
    from fixtures import make_graph as mg

    g = mg(edges.tolist(), 45, num_parts=4)
    if algo_kind == "hedonic":
        # local_sweep=False: the sweep intentionally diverges in
        # trajectory (covered by test_hedonic_local_sweep_equilibrium);
        # bit-identity holds for the pure synchronous step
        runs = {m: hedonic_communities(g, max_iters=60, gather=m,
                                       local_sweep=False)
                for m in ["dense", "shuffle", "tasks"]}
        key = "coalition"
    else:
        init = np.arange(45) % 6
        runs = {m: label_propagation(g, init_labels=init, max_iters=30,
                                     gather=m)
                for m in ["dense", "shuffle", "tasks"]}
        key = "label"
    base = runs["dense"]
    for m in ["shuffle", "tasks"]:
        np.testing.assert_array_equal(runs[m].state[key], base.state[key],
                                      err_msg=m)
        assert runs[m].iterations == base.iterations
        assert runs[m].converged == base.converged


@pytest.mark.parametrize("algo_kind", ["pagerank", "cc"])
def test_numeric_tasks_backend_matches(algo_kind):
    n = 50
    edges = rand_edges(n, 0.1, seed=19)
    if algo_kind == "pagerank":
        g = make_graph(edges, n, directed=True, num_parts=4)
        a = pagerank(g, gather="dense", max_iters=40, tol=1e-14)
        b = pagerank(g, gather="tasks", max_iters=40, tol=1e-14)
        np.testing.assert_allclose(b.state["rank"], a.state["rank"], atol=1e-15)
    else:
        g = make_graph(edges, n, num_parts=4)
        a = connected_components(g, gather="dense")
        b = connected_components(g, gather="tasks")
        np.testing.assert_array_equal(b.state["component"], a.state["component"])
    assert a.iterations == b.iterations


def test_hedonic_fully_deterministic_across_runs():
    """Same graph + init → bit-identical trajectory and result (seeded
    damping, deterministic tie-breaks, no wall-clock dependence)."""
    edges = sbm_edges(4, 15, p_in=0.4, multiplier=0.15, seed=77)
    g = make_graph(edges.tolist(), 60, num_parts=4)
    a = hedonic_communities(g, max_iters=120)
    b = hedonic_communities(g, max_iters=120)
    np.testing.assert_array_equal(a.state["coalition"], b.state["coalition"])
    assert a.iterations == b.iterations
    assert [m["moved"] for m in a.metrics] == [m["moved"] for m in b.metrics]


def test_triangles_bucketed_probe_matches_broadcast():
    from hedonic_ray.sources.synth import zipf_hub_edges

    edges = sbm_edges(3, 25, p_in=0.25, multiplier=0.1, seed=14)
    hubs = zipf_hub_edges(75, 150, seed=15)
    g = make_graph(np.concatenate([edges, hubs]).tolist(), 75, num_parts=5)
    a = triangle_count(g, probe="broadcast")
    b = triangle_count(g, probe="bucketed", n_buckets=6)
    assert b.total == a.total
    np.testing.assert_array_equal(b.per_vertex, a.per_vertex)


def test_shard_counts_exactly_maintained():
    """The stateful sharded-apply actors' incremental count rows must
    equal a fresh full recount after arbitrary mover batches (the
    exactness invariant the incremental engine rests on)."""
    import ray
    from hedonic_ray.engine.shards import ShardPool

    n = 80
    edges = rand_edges(n, 0.08, seed=23)
    g = make_graph(edges, n, num_parts=4)
    mem = np.arange(n, dtype=np.int64)
    pool = ShardPool(g, mem, alpha=0.1, mode="hedonic")
    rng = np.random.default_rng(5)
    for step in range(4):
        mv = rng.choice(n, size=12, replace=False).astype(np.int64)
        old = mem[mv].copy()
        new = rng.integers(0, n, size=12).astype(np.int64)
        mem[mv] = new
        pool.step(mv, old, new, sweep=False)
    # ground truth: full recount from the final membership
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    expect = {}
    for v in range(n):
        for u in adj.get(v, []):
            expect[(v, int(mem[u]))] = expect.get((v, int(mem[u])), 0) + 1
    got = {}
    for shard in pool.shards:
        keys, cnts = ray.get(shard.counts_snapshot.remote())
        for k, c in zip(keys.tolist(), cnts.tolist()):
            got[(k // n, k % n)] = got.get((k // n, k % n), 0) + c
    assert got == expect


def test_spectral_recovers_planted_sbm():
    """Leading-eigenvector bisection (distributed power iteration on
    the modularity matrix) recovers a well-separated planted SBM and
    refuses to split spectrally-indivisible graphs."""
    from hedonic_ray.algos.spectral import spectral_communities

    edges = sbm_edges(2, 30, p_in=0.5, multiplier=0.02, seed=14)
    g = make_graph(edges.tolist(), 60, num_parts=4)
    mem = spectral_communities(g, clusters=2)
    gt = ground_truth_membership(2, 30)
    assert oracles.adjusted_rand_index(mem, gt) == pytest.approx(1.0)
    # determinism
    np.testing.assert_array_equal(mem, spectral_communities(g, clusters=2))
    # a clique has no positive modularity split → one community
    iu = np.triu_indices(12, k=1)
    clique = make_graph(np.stack(iu, axis=1).tolist(), 12, num_parts=2)
    np.testing.assert_array_equal(spectral_communities(clique, clusters=4),
                                  np.zeros(12, dtype=np.int64))


def test_spectral_three_blocks():
    from hedonic_ray.algos.spectral import spectral_communities

    edges = sbm_edges(3, 20, p_in=0.55, multiplier=0.02, seed=15)
    g = make_graph(edges.tolist(), 60, num_parts=4)
    mem = spectral_communities(g, clusters=4)
    gt = ground_truth_membership(3, 20)
    assert oracles.adjusted_rand_index(mem, gt) > 0.9


def test_spectral_shard_backend_parity():
    """The resident-state power iteration (`_SpectralVecSpec`) runs
    the same arithmetic as the Dataset exchange loop up to float merge
    ORDER; on well-separated graphs (eigenvector entries bounded away
    from 0) the sign split — hence the membership — is identical,
    across shard counts including P=1, and the clique refusal path
    agrees."""
    from hedonic_ray.algos.spectral import spectral_communities

    edges = sbm_edges(3, 20, p_in=0.55, multiplier=0.02, seed=15)
    for num_parts in (1, 4):
        g = make_graph(edges.tolist(), 60, num_parts=num_parts)
        a = spectral_communities(g, clusters=4, backend="exchange")
        b = spectral_communities(g, clusters=4, backend="shards")
        np.testing.assert_array_equal(a, b)
    iu = np.triu_indices(12, k=1)
    clique = make_graph(np.stack(iu, axis=1).tolist(), 12, num_parts=2)
    np.testing.assert_array_equal(
        spectral_communities(clique, clusters=4, backend="shards"),
        np.zeros(12, dtype=np.int64))


def test_lp_shards_path_matches_dense(monkeypatch):
    """The LP ShardPool path is normally gated behind 200k vertices —
    lower the gate so the production shard branch is exercised and
    bit-identical to the dense backend on a small graph."""
    from hedonic_ray.algos.labelprop import LabelPropStep

    monkeypatch.setattr(LabelPropStep, "SHARDS_MIN_VERTICES", 0)
    edges = sbm_edges(3, 15, p_in=0.4, multiplier=0.1, seed=33)
    g = make_graph(edges.tolist(), 45, num_parts=4)
    init = np.arange(45) % 6
    a = label_propagation(g, init_labels=init, max_iters=30, gather="dense")
    b = label_propagation(g, init_labels=init, max_iters=30, gather="tasks")
    np.testing.assert_array_equal(b.state["label"], a.state["label"])
    assert b.iterations == a.iterations and b.converged == a.converged


def test_local_mode_bit_identical_to_dense():
    """The tiny-graph driver-local superstep loop (gather="local") runs
    the SAME scatter/gather/apply kernels as dense mode — trajectories
    must be bit-identical for hedonic, LP and PageRank."""
    from hedonic_ray.algos.components import connected_components
    from hedonic_ray.algos.pagerank import pagerank

    n = 60
    edges = rand_edges(n, 0.12, seed=31)
    g = make_graph(edges, n, num_parts=4)
    h_l = hedonic_communities(g, max_iters=50, gather="local",
                              local_sweep=False)
    h_d = hedonic_communities(g, max_iters=50, gather="dense",
                              local_sweep=False)
    np.testing.assert_array_equal(h_l.state["coalition"],
                                  h_d.state["coalition"])
    assert h_l.iterations == h_d.iterations
    l_l = label_propagation(g, max_iters=30, gather="local")
    l_d = label_propagation(g, max_iters=30, gather="dense")
    np.testing.assert_array_equal(l_l.state["label"], l_d.state["label"])
    gd = make_graph(edges, n, directed=True, num_parts=4)
    p_l = pagerank(gd, max_iters=20, tol=1e-12, gather="local")
    p_d = pagerank(gd, max_iters=20, tol=1e-12, gather="dense")
    np.testing.assert_array_equal(p_l.state["rank"], p_d.state["rank"])
    c_l = connected_components(g, gather="local")
    c_d = connected_components(g, gather="dense")
    np.testing.assert_array_equal(c_l.state["component"],
                                  c_d.state["component"])


def test_kcore_vs_brute_peel():
    from hedonic_ray.algos.kcore import kcore_membership

    n = 80
    edges = rand_edges(n, 0.05, seed=23)
    g = make_graph(edges, n, num_parts=4)
    for k in (2, 3, 4):
        got = kcore_membership(g, k)  # converged
        # independent sequential peel over an adjacency-set model
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        alive = set(range(n))
        changed = True
        while changed:
            drop = {v for v in alive
                    if sum(u in alive for u in adj[v]) < k}
            changed = bool(drop)
            alive -= drop
        exp = np.array([v in alive for v in range(n)])
        np.testing.assert_array_equal(got, exp), k
        # fixed-round semantics: round r alive set shrinks monotonically
        prev = None
        for r in range(1, 5):
            a_r = kcore_membership(g, k, rounds=r)
            if prev is not None:
                assert (a_r <= prev).all()
            prev = a_r


def test_hits_integer_matches_numpy_oracle():
    """Unnormalized int64 HITS vs the dense matmul oracle
    (auth_k = Aᵀ hub_{k-1}, hub_k = A auth_k from hub₀ = 1)."""
    from hedonic_ray.algos.hits import hits

    n = 35
    rng = np.random.default_rng(9)
    edges = sorted({(int(u), int(v))
                    for u, v in rng.integers(0, n, size=(140, 2)) if u != v})
    g = make_graph(edges, n, directed=True, num_parts=4)
    A = np.zeros((n, n), dtype=np.int64)
    for u, v in edges:
        A[u, v] = 1
    h = np.ones(n, dtype=np.int64)
    for _ in range(3):
        a = A.T @ h
        h = A @ a
    hub, auth = hits(g, iters=3, normalize=False)
    np.testing.assert_array_equal(hub, h)
    np.testing.assert_array_equal(auth, a)


def test_hits_normalized_converges_to_principal_vectors():
    """normalize=True is the L1-normalized power iteration — after
    enough iterations the hub vector matches the dense fixed point."""
    from hedonic_ray.algos.hits import hits

    n = 25
    edges = rand_edges(n, 0.2, seed=14)
    g = make_graph(edges, n, directed=True, num_parts=3)
    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] = 1.0
    h = np.ones(n)
    for _ in range(60):
        a = A.T @ h
        a /= a.sum() or 1.0
        h = A @ a
        h /= h.sum() or 1.0
    hub, auth = hits(g, iters=60, normalize=True)
    np.testing.assert_allclose(hub, h, atol=1e-9)
    np.testing.assert_allclose(auth, a, atol=1e-9)


def test_edge_jaccard_matches_brute_force():
    """edge_jaccard vs a set-based per-edge oracle (common neighbors /
    neighborhood union) on a random undirected graph."""
    from hedonic_ray.algos.edgesim import edge_jaccard

    n = 40
    edges = rand_edges(n, 0.12, seed=21)
    g = make_graph(edges, n, num_parts=5)
    nbrs = {v: set() for v in range(n)}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    got = {(r["a"], r["b"]): (r["common"], r["jacc_e9"])
           for r in edge_jaccard(g).to_pylist()}
    canon = {(min(u, v), max(u, v)) for u, v in edges}
    assert set(got) == canon
    for a, b in canon:
        c = len(nbrs[a] & nbrs[b])
        u = len(nbrs[a] | nbrs[b])
        assert got[(a, b)] == (c, c * 10**9 // u), (a, b)


# ------------------------------------------------- linkpred / PPR additions


def test_ppr_with_all_seeds_equals_pagerank():
    """Seeds = every vertex ⇒ p is uniform ⇒ PPR IS PageRank (exact
    same float recurrence) — a closed-form cross-check of the PPR
    apply rule."""
    from hedonic_ray.algos.pagerank import pagerank, personalized_pagerank
    from tests.fixtures import make_graph, rand_edges

    g = make_graph(rand_edges(40, 0.12, seed=3), 40, directed=True)
    pr = pagerank(g, max_iters=4, tol=0.0).state["rank"]
    ppr = personalized_pagerank(
        g, np.arange(40), max_iters=4, tol=0.0).state["rank"]
    np.testing.assert_allclose(ppr, pr, rtol=0, atol=1e-15)


def test_ppr_mass_and_seed_concentration():
    from hedonic_ray.algos.pagerank import personalized_pagerank
    from tests.fixtures import make_graph

    # path 0-1-2-3-4 plus isolated-ish tail; seed at 0
    g = make_graph([(0, 1), (1, 2), (2, 3), (3, 4)], 5, directed=False)
    r = personalized_pagerank(g, np.array([0]), max_iters=30).state["rank"]
    assert abs(r.sum() - 1.0) < 1e-9
    # mass concentrates around the seed end (the deg-1 seed forwards
    # everything to vertex 1, so 1 can outrank 0 — that's correct PPR)
    assert r[0] + r[1] > 0.55
    assert r[1] > r[2] > r[3] > r[4]    # decays with hop distance
    assert r[0] > r[2]


def test_assortativity_star_is_minus_one():
    """A star graph is perfectly disassortative: every edge joins the
    hub (deg n−1) to a leaf (deg 1) ⇒ r = −1 exactly."""
    from hedonic_ray.algos.linkpred import degree_assortativity
    from tests.fixtures import make_graph

    g = make_graph([(0, i) for i in range(1, 7)], 7, directed=False)
    t = degree_assortativity(g)
    assert t.column("r_e6")[0].as_py() == -1_000_000


def test_assortativity_matches_dense_oracle():
    from hedonic_ray.algos.linkpred import degree_assortativity
    from tests.fixtures import make_graph, rand_edges

    edges = rand_edges(30, 0.15, seed=11)
    g = make_graph(edges, 30, directed=False)
    t = degree_assortativity(g)
    deg = np.zeros(30, dtype=np.int64)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    x, y = np.array(xs, float), np.array(ys, float)
    r = np.corrcoef(x, y)[0, 1]
    assert abs(t.column("r_e6")[0].as_py() / 1e6 - r) < 2e-6


def test_common_neighbors_path_graph():
    """Path 0-1-2-3-4: non-adjacent distance-2 pairs are (0,2),(1,3),
    (2,4) with exactly one common neighbor each; ties break to (a,b)
    ascending."""
    from hedonic_ray.algos.linkpred import common_neighbors_topk
    from tests.fixtures import make_graph

    g = make_graph([(0, 1), (1, 2), (2, 3), (3, 4)], 5, directed=False)
    t = common_neighbors_topk(g, k=10)
    rows = list(zip(t.column("a").to_pylist(), t.column("b").to_pylist(),
                    t.column("common").to_pylist()))
    assert rows == [(0, 2, 1), (1, 3, 1), (2, 4, 1)]


def test_common_neighbors_excludes_adjacent_and_counts():
    """Triangle + pendant: 0-1,1-2,0-2,2-3.  Non-adjacent pairs:
    (0,3),(1,3) each share neighbor 2; adjacent pairs never appear."""
    from hedonic_ray.algos.linkpred import common_neighbors_topk
    from tests.fixtures import make_graph

    g = make_graph([(0, 1), (1, 2), (0, 2), (2, 3)], 4, directed=False)
    t = common_neighbors_topk(g, k=10)
    rows = set(zip(t.column("a").to_pylist(), t.column("b").to_pylist(),
                   t.column("common").to_pylist()))
    assert rows == {(0, 3, 1), (1, 3, 1)}


def test_scc_matches_bruteforce_mutual_reachability():
    from hedonic_ray.algos.scc import strongly_connected_components
    from tests.fixtures import make_graph

    rng = np.random.default_rng(5)
    n = 24
    arcs = [(int(u), int(v)) for u in range(n) for v in range(n)
            if u != v and rng.random() < 0.08]
    # make sure at least one nontrivial cycle exists
    arcs += [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10)]
    arcs = sorted(set(arcs))
    g_fwd = make_graph(arcs, n, directed=True)
    g_bwd = make_graph([(v, u) for u, v in arcs], n, directed=True)
    got = strongly_connected_components(g_fwd, g_bwd)

    # brute force: boolean transitive closure
    adj = np.zeros((n, n), dtype=bool)
    for u, v in arcs:
        adj[u, v] = True
    reach = adj | np.eye(n, dtype=bool)
    for _ in range(n):
        reach = reach | (reach @ reach)
    mutual = reach & reach.T
    expect = np.array([np.flatnonzero(mutual[v]).min() for v in range(n)])
    np.testing.assert_array_equal(got, expect)


def test_scc_pure_cycle_and_chain():
    from hedonic_ray.algos.scc import strongly_connected_components
    from tests.fixtures import make_graph

    # chain 0→1→2 plus cycle 3→4→5→3
    arcs = [(0, 1), (1, 2), (3, 4), (4, 5), (5, 3), (2, 3)]
    g_fwd = make_graph(arcs, 6, directed=True)
    g_bwd = make_graph([(v, u) for u, v in arcs], 6, directed=True)
    got = strongly_connected_components(g_fwd, g_bwd)
    np.testing.assert_array_equal(got, [0, 1, 2, 3, 3, 3])


def test_scc_backends_bit_identical():
    from hedonic_ray.algos.scc import strongly_connected_components
    from tests.fixtures import make_graph

    rng = np.random.default_rng(17)
    n = 30
    arcs = sorted({(int(u), int(v)) for u in range(n) for v in range(n)
                   if u != v and rng.random() < 0.07} |
                  {(4, 5), (5, 6), (6, 4)})
    g_fwd = make_graph(arcs, n, directed=True)
    g_bwd = make_graph([(v, u) for u, v in arcs], n, directed=True)
    a = strongly_connected_components(g_fwd, g_bwd, backend="local")
    b = strongly_connected_components(g_fwd, g_bwd, backend="ray")
    np.testing.assert_array_equal(a, b)


def test_resource_allocation_weights_by_center_degree():
    """Star center 0 with leaves 1..3 plus edge 1-2: non-adjacent
    pairs through center 0 (deg 3) score 1e9//3; pair (1,3) also has
    no second common neighbor; (2,3) likewise.  Closed-form:
      (1,3): common={0} -> 333333333
      (2,3): common={0} -> 333333333
    and the RA ranking equals brute force on a random graph."""
    from hedonic_ray.algos.linkpred import resource_allocation_topk
    from tests.fixtures import make_graph

    g = make_graph([(0, 1), (0, 2), (0, 3), (1, 2)], 4, directed=False)
    t = resource_allocation_topk(g, k=10)
    rows = set(zip(t.column("a").to_pylist(), t.column("b").to_pylist(),
                   t.column("ra_e9").to_pylist()))
    assert rows == {(1, 3, 333333333), (2, 3, 333333333)}


def test_resource_allocation_matches_bruteforce():
    import numpy as np

    from hedonic_ray.algos.linkpred import resource_allocation_topk
    from tests.fixtures import make_graph

    rng = np.random.default_rng(11)
    n = 30
    edges = sorted({(int(a), int(b)) for a in range(n) for b in range(a + 1, n)
                    if rng.random() < 0.15})
    g = make_graph(edges, n, directed=False)
    nbr = [set() for _ in range(n)]
    for a, b in edges:
        nbr[a].add(b); nbr[b].add(a)
    brute = []
    for a in range(n):
        for b in range(a + 1, n):
            if b in nbr[a]:
                continue
            s = sum(1_000_000_000 // len(nbr[z]) for z in nbr[a] & nbr[b])
            if s:
                brute.append((-s, a, b))
    brute.sort()
    want = [(a, b, -s) for s, a, b in brute[:10]]
    t = resource_allocation_topk(g, k=10)
    got = list(zip(t.column("a").to_pylist(), t.column("b").to_pylist(),
                   t.column("ra_e9").to_pylist()))
    assert got == want


def test_two_hop_counts_closed_form():
    """Path 0-1-2-3-4: N<=2 sizes are 2,3,4,3,2; star 0-{1,2,3}: the
    center sees 3, each leaf sees all 3 others."""
    from hedonic_ray.algos.linkpred import two_hop_counts
    from tests.fixtures import make_graph

    g = make_graph([(0, 1), (1, 2), (2, 3), (3, 4)], 5, directed=False)
    t = two_hop_counts(g)
    assert t.column("n_2hop").to_pylist() == [2, 3, 4, 3, 2]

    g2 = make_graph([(0, 1), (0, 2), (0, 3)], 4, directed=False)
    assert two_hop_counts(g2).column("n_2hop").to_pylist() == [3, 3, 3, 3]


def test_ktruss_closed_form():
    """K4 plus a pendant: every K4 edge has support 2 (in the 4-truss
    and 3-truss); the pendant edge is never in a triangle.  Two
    triangles sharing one edge: all survive 3-truss, all peel at
    4-truss (the outer edges have support 1, and removing them
    strands the shared edge)."""
    from hedonic_ray.algos.truss import ktruss_edges
    from tests.fixtures import make_graph

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    g = make_graph(k4, 5, directed=False)
    t3 = {(r["a"], r["b"]): r["in_truss"]
          for r in ktruss_edges(g, k=3).to_pylist()}
    assert t3[(3, 4)] == 0 and sum(t3.values()) == 6
    t4 = {(r["a"], r["b"]): r["in_truss"]
          for r in ktruss_edges(g, k=4).to_pylist()}
    assert t4[(3, 4)] == 0 and sum(t4.values()) == 6

    bowtie = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    g2 = make_graph(bowtie, 4, directed=False)
    assert sum(r["in_truss"] for r in
               ktruss_edges(g2, k=3).to_pylist()) == 5
    assert sum(r["in_truss"] for r in
               ktruss_edges(g2, k=4).to_pylist()) == 0
    # the 2-truss is the whole edge set (support >= 0 trivially),
    # including edges in no triangle — path graph regression
    path = make_graph([(0, 1), (1, 2)], 3, directed=False)
    assert [r["in_truss"] for r in
            ktruss_edges(path, k=2).to_pylist()] == [1, 1]


def test_avg_neighbor_degree_closed_form():
    """Star 0-{1,2,3}: center's neighbors all have degree 1 (avg 1);
    each leaf's sole neighbor has degree 3 (avg 3); plus an isolated
    vertex reporting zeros."""
    from hedonic_ray.algos.linkpred import avg_neighbor_degree
    from tests.fixtures import make_graph

    g = make_graph([(0, 1), (0, 2), (0, 3)], 5, directed=False)
    t = avg_neighbor_degree(g)
    rows = {r["vertex"]: (r["degree"], r["sum_nbr_deg"],
                          r["avg_nbr_deg_e9"]) for r in t.to_pylist()}
    e9 = 1_000_000_000
    assert rows[0] == (3, 3, e9)
    assert rows[1] == rows[2] == rows[3] == (1, 3, 3 * e9)
    assert rows[4] == (0, 0, 0)


def test_deterministic_walks_brute():
    """The hash choice is independently recomputable: walk the same
    graph in pure Python with adjacency dicts and the same
    md5-mod-degree rule; an isolated seed stops at step 0."""
    from hedonic_ray.algos.linkpred import deterministic_walks
    from hedonic_ray.ops.dedup import md5_low64
    from tests.fixtures import make_graph

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)]
    n = 7                      # 5..6 isolated
    g = make_graph(edges, n, directed=False)
    got = [(r["seed"], r["step"], r["vertex"]) for r in
           deterministic_walks(g, stride=3, steps=4).to_pylist()]

    nbr = {v: [] for v in range(n)}
    for a, b in edges:
        nbr[a].append(b)
        nbr[b].append(a)
    exp = []
    for seed in range(0, n, 3):           # 0, 3, 6
        v = seed
        exp.append((seed, 0, v))
        for step in range(4):
            ns = sorted(nbr[v])
            if not ns:
                break
            v = ns[md5_low64(f"{v}-{step}") % len(ns)]
            exp.append((seed, step + 1, v))
    assert sorted(got) == sorted(exp)
    assert (6, 0, 6) in got and not any(s == 6 and st > 0
                                        for s, st, _ in got)


def test_modularity_terms_consistent():
    """Engine invariants at sf0.001: intra_edges <= m, Q in (-1, 1),
    and the rational reproduces from the emitted integer terms."""
    from hedonic_ray.pipelines.linkgraph import doc_modularity

    t = doc_modularity("/root/testdata/sf0.001").to_pylist()[0]
    m, c, s = t["m"], t["intra_edges"], t["sum_dc2"]
    assert 0 <= c <= m
    num = 4 * m * c - s
    den = 4 * m * m
    q = (abs(num) * 10**9 // den) * (1 if num >= 0 else -1)
    assert t["q_e9"] == q and -10**9 < q < 10**9


def test_katz_integer_matches_numpy_oracle():
    """Exact-integer radius-capped Katz vs the dense matmul oracle:
    num = Σ_{k≤K} beta_inv^(K−k)·(Aᵀ)^k·1 over den = beta_inv^K."""
    from hedonic_ray.algos.katz import katz_centrality

    n = 35
    rng = np.random.default_rng(9)
    edges = sorted({(int(u), int(v))
                    for u, v in rng.integers(0, n, size=(140, 2)) if u != v})
    g = make_graph(edges, n, directed=True, num_parts=4)
    A = np.zeros((n, n), dtype=np.int64)
    for u, v in edges:
        A[u, v] = 1
    w = np.ones(n, dtype=np.int64)
    num_exp = np.zeros(n, dtype=np.int64)
    for k in range(1, 5):
        w = A.T @ w
        num_exp += 4 ** (4 - k) * w
    num, den = katz_centrality(g, iters=4, beta_inv=4)
    assert den == 256
    np.testing.assert_array_equal(num, num_exp)


def test_reciprocal_pairs_matches_corrected_reference_oracle():
    """The distributed reciprocity round must equal a direct Python
    port of the reference's INTENDED rules (reciprocity_clustering.py
    with the always-truthy `'=' or '<' in x` conditions fixed) on
    random graphs and on the reference's own demo graph
    (Krackhardt kite)."""
    from hedonic_ray.algos.reciprocity import reciprocal_pairs

    def oracle(n, edges):
        nbr = {v: set() for v in range(n)}
        for a, b in edges:
            nbr[a].add(b)
            nbr[b].add(a)
        invitations = {}
        for v in range(n):
            comms = [{u} for u in sorted(nbr[v])] + [{v}]
            infos = []
            for C in comms:
                Cm = C - {v}
                fon = set().union(*[nbr[x] for x in Cm]) if Cm else set()
                infos.append((len(nbr[v] & fon), len(fon - nbr[v])))
            K = len(comms)
            entries = [0] * K
            for a in range(K):
                fa, sa = infos[a]
                for b in range(a + 1, K):
                    fb, sb = infos[b]
                    if fa == fb:
                        if sa < sb:
                            entries[b] += 1
                        elif sa > sb:
                            entries[a] += 1
                    elif fa > fb:
                        if sa <= sb:
                            entries[b] += 1
                        else:
                            entries[a] += 1
                            entries[b] += 1
                    else:
                        if sa >= sb:
                            entries[a] += 1
                        else:
                            entries[a] += 1
                            entries[b] += 1
            best = min(entries)
            inv = set()
            for C, e in zip(comms, entries):
                if e == best:
                    inv |= C
            invitations[v] = inv - {v}
        pairs = set()
        for v, s in invitations.items():
            for u in s:
                if v in invitations.get(u, set()):
                    pairs.add(tuple(sorted((v, u))))
        return sorted(pairs)

    kite = [(0, 1), (0, 2), (0, 3), (0, 5), (1, 3), (1, 4), (1, 6),
            (2, 3), (2, 5), (3, 4), (3, 5), (3, 6), (4, 6), (5, 6),
            (5, 7), (6, 7), (7, 8), (8, 9)]  # Krackhardt kite
    cases = [(10, kite)]
    rng = np.random.default_rng(31)
    for seed in range(4):
        n = 24
        edges = sorted({(int(a), int(b)) if a < b else (int(b), int(a))
                        for a, b in rng.integers(0, n, size=(70, 2))
                        if a != b})
        cases.append((n, edges))
    for n, edges in cases:
        g = make_graph(edges, n, num_parts=3)
        got = reciprocal_pairs(g)
        got_pairs = sorted(zip(got.column("a").to_pylist(),
                               got.column("b").to_pylist()))
        assert got_pairs == oracle(n, edges), (n, edges)
    assert len(got_pairs) >= 0  # kite case must be non-trivial:
    g = make_graph(kite, 10, num_parts=2)
    assert reciprocal_pairs(g).num_rows > 0


def test_hedonic_strict_all_coalition_equilibrium_exhaustive():
    """candidates="all" must terminate in an equilibrium over EVERY
    existing coalition at α = m/C(n,2) — brute-force-verified vertex by
    vertex (independent of the engine's analytics) on ALL connected
    labeled graphs with n = 4 plus dense/hub shapes at n = 6, the
    graphs where the adjacent-candidate notion is known to fall short
    (the 0.996 gap)."""
    from hedonic_ray.algos.hedonic import hedonic_communities
    from tests.oracles import connected_graphs

    def brute_all_coalition_nash(edges, n, mem):
        m = len(edges)
        num, den = m, n * (n - 1) // 2
        nbr = {v: set() for v in range(n)}
        for u, w in edges:
            nbr[u].add(w)
            nbr[w].add(u)
        sizes = {}
        for c in mem:
            sizes[c] = sizes.get(c, 0) + 1
        for v in range(n):
            own = mem[v]
            f_own = sum(1 for u in nbr[v] if mem[u] == own)
            own_val = f_own * (den - num) - (sizes[own] - f_own - 1) * num
            for c in sizes:
                if c == own:
                    continue
                f = sum(1 for u in nbr[v] if mem[u] == c)
                if own_val < f * (den - num) - (sizes[c] - f) * num:
                    return False, v, c
        return True, -1, -1

    cases = [(4, e, None) for e in connected_graphs(4)]
    cases += [(6, [(a, b) for a in range(6) for b in range(a + 1, 6)],
               None),
              (6, [(0, i) for i in range(1, 6)], None),    # star/hub
              (6, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),
                   (0, 3)], None)]                         # chorded cycle
    # engineered NON-vacuous case: friendless vertex 6 stranded in the
    # {0,1,2} triangle's coalition — adjacent-Nash (6 has no neighbors,
    # so the dynamics never move it) but NOT all-coalition Nash (the
    # {7} singleton is strictly better: −1·num > −3·num).  The strict
    # refinement must move it.
    cases += [(8, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)],
               [0, 0, 0, 3, 3, 3, 0, 7])]
    refine_fired = 0
    for n, edges, init in cases:
        g = make_graph(edges, n, num_parts=2)
        res = hedonic_communities(g, candidates="all", max_iters=50,
                                  init_membership=init)
        mem = [int(x) for x in res.state["coalition"]]
        ok, v, c = brute_all_coalition_nash(edges, n, mem)
        assert ok, (n, edges, mem, v, c)
        refine_fired += [m["strict_moves"] for m in res.metrics
                         if "strict_moves" in m][0]
    assert refine_fired >= 1, "no case exercised the strict move loop"


def test_pagerank_shard_backend_parity():
    """The resident-shard-state PageRank/PPR path (`_PageRankVecSpec`)
    must reproduce the Dataset backend to float-merge-order precision:
    same iteration counts and convergence, ranks equal at the gate's
    ×1e9 rounding and to 1e-13 relative (per-shard partial sums vs one
    driver vector differ only in float add ORDER)."""
    from hedonic_ray.algos.pagerank import pagerank, personalized_pagerank

    n = 150
    rng = np.random.default_rng(33)
    edges = sorted({(int(u), int(v))
                    for u, v in rng.integers(0, n, size=(700, 2)) if u != v})
    g = make_graph(edges, n, directed=True, num_parts=6)

    def check(a, b):
        assert b.iterations == a.iterations
        assert b.converged == a.converged
        np.testing.assert_allclose(b.state["rank"], a.state["rank"],
                                   rtol=1e-13, atol=1e-16)
        np.testing.assert_array_equal(np.round(b.state["rank"] * 1e9),
                                      np.round(a.state["rank"] * 1e9))

    # fixed-iteration (the gate's shape) and converged runs
    check(pagerank(g, max_iters=5, gather="dense"),
          pagerank(g, max_iters=5, gather="shards"))
    check(pagerank(g, gather="dense"), pagerank(g, gather="shards"))
    # personalized teleport, seeds crossing shard boundaries
    seeds = np.arange(0, n, 13)
    check(personalized_pagerank(g, seeds, gather="dense", max_iters=6),
          personalized_pagerank(g, seeds, gather="shards", max_iters=6))
    check(personalized_pagerank(g, seeds, gather="dense"),
          personalized_pagerank(g, seeds, gather="shards"))


def test_vector_shard_backend_bit_identical():
    """The resident-shard-state vector superstep (engine/shards.py:
    VectorShardPool) must reproduce the Dataset backends bit-for-bit
    for Katz and SSSP — including SSSP's early exit — across several
    shard counts, and a stale pool handle must be fenced."""
    import pytest

    from hedonic_ray.algos.katz import katz_centrality
    from hedonic_ray.algos.sssp import sssp_distances
    from hedonic_ray.engine.shards import VectorShardPool
    from hedonic_ray.algos.sssp import _SsspVecSpec

    n = 120
    rng = np.random.default_rng(21)
    edges = sorted({(int(u), int(v))
                    for u, v in rng.integers(0, n, size=(600, 2)) if u != v})
    g = make_graph(edges, n, directed=True, num_parts=6)
    num_ds, den_ds = katz_centrality(g, iters=4, beta_inv=4,
                                     backend="dataset")
    num_sh, den_sh = katz_centrality(g, iters=4, beta_inv=4,
                                     backend="shards")
    assert den_ds == den_sh
    np.testing.assert_array_equal(num_sh, num_ds)
    for rounds in (1, 3, 8):
        got_ds = sssp_distances(g, 0, rounds=rounds, backend="dataset")
        got_sh = sssp_distances(g, 0, rounds=rounds, backend="shards")
        np.testing.assert_array_equal(got_sh, got_ds,
                                      err_msg=f"rounds={rounds}")
    # early exit: rounds far past convergence must equal converged
    np.testing.assert_array_equal(
        sssp_distances(g, 0, rounds=50, backend="shards"),
        sssp_distances(g, 0, rounds=50, backend="dataset"))
    # the token fence: a newer pool invalidates the older handle
    old = VectorShardPool(g, _SsspVecSpec(0))
    VectorShardPool(g, _SsspVecSpec(1))
    with pytest.raises(Exception, match="stale"):
        old.step(0)


def test_symmetry_breaking_shard_backends_bit_identical():
    """MIS, Jones–Plassmann coloring and maximal matching on the
    resident-shard-state path must reproduce their Dataset backends
    bit-for-bit — statuses, colors, decided rounds, matched-pair
    ORDER — on random undirected graphs across shard counts and at
    tight round caps (the unconverged tail must agree too)."""
    from hedonic_ray.algos.coloring import jones_plassmann_coloring
    from hedonic_ray.algos.matching import maximal_matching
    from hedonic_ray.algos.mis import maximal_independent_set

    rng = np.random.default_rng(77)
    for seed, n, parts in ((0, 90, 5), (1, 130, 3)):
        edges = sorted({(int(u), int(v)) if u < v else (int(v), int(u))
                        for u, v in rng.integers(0, n, size=(4 * n, 2))
                        if u != v})
        g = make_graph(edges, n, num_parts=parts)
        for rounds in (1, 2, 12):
            s_ds, d_ds = maximal_independent_set(
                g, rounds=rounds, backend="dataset")
            s_sh, d_sh = maximal_independent_set(
                g, rounds=rounds, backend="shards")
            np.testing.assert_array_equal(s_sh, s_ds)
            np.testing.assert_array_equal(d_sh, d_ds)
        for rounds in (1, 3, 16):
            c_ds, d_ds = jones_plassmann_coloring(
                g, rounds=rounds, backend="dataset")
            c_sh, d_sh = jones_plassmann_coloring(
                g, rounds=rounds, backend="shards")
            np.testing.assert_array_equal(c_sh, c_ds)
            np.testing.assert_array_equal(d_sh, d_ds)
        for rounds in (1, 2, 8):
            ds = maximal_matching(g, rounds=rounds, backend="dataset")
            sh = maximal_matching(g, rounds=rounds, backend="shards")
            for x, y in zip(sh, ds):
                np.testing.assert_array_equal(x, y)


def test_bfs_kcore_shard_backends_bit_identical():
    """BFS hop distances (single seed, multi-seed, capped and
    fixed-point) and the k-core peel (several k, capped and
    fixed-point) on the resident-shard-state path must equal their
    Dataset backends bit-for-bit."""
    from hedonic_ray.algos.bfs import bfs_distances
    from hedonic_ray.algos.kcore import kcore_membership

    rng = np.random.default_rng(55)
    n = 110
    edges = sorted({(int(u), int(v)) if u < v else (int(v), int(u))
                    for u, v in rng.integers(0, n, size=(3 * n, 2))
                    if u != v})
    g = make_graph(edges, n, num_parts=4)
    for seeds in ([0], [3, 77, 41]):
        sd = np.array(seeds, dtype=np.int64)
        for rounds in (0, 1, 3, None):
            np.testing.assert_array_equal(
                bfs_distances(g, sd, rounds=rounds, backend="shards"),
                bfs_distances(g, sd, rounds=rounds, backend="dataset"),
                err_msg=f"seeds={seeds} rounds={rounds}")
    for k in (1, 2, 3, 5):
        for rounds in (1, 2, None):
            np.testing.assert_array_equal(
                kcore_membership(g, k, rounds=rounds, backend="shards"),
                kcore_membership(g, k, rounds=rounds, backend="dataset"),
                err_msg=f"k={k} rounds={rounds}")


def test_sssp_matches_dense_bellman_ford():
    """Superstep Bellman-Ford vs a dense synchronous relaxation under
    the same deterministic integer weights, at several round caps
    (fixed-round semantics must agree round for round)."""
    from hedonic_ray.algos.sssp import (INF, UNREACHED, _edge_weights,
                                        sssp_distances)

    n = 40
    rng = np.random.default_rng(11)
    edges = sorted({(int(u), int(v))
                    for u, v in rng.integers(0, n, size=(160, 2)) if u != v})
    g = make_graph(edges, n, directed=True, num_parts=4)
    es = np.array([u for u, _ in edges])
    ed = np.array([v for _, v in edges])
    w = _edge_weights(es, ed)
    for rounds in (1, 3, 6):
        exp = np.full(n, int(INF), dtype=np.int64)
        exp[0] = 0
        for _ in range(rounds):
            nxt = exp.copy()
            cand = exp[es] + w
            ok = exp[es] < int(INF)
            np.minimum.at(nxt, ed[ok], cand[ok])
            exp = nxt
        exp[exp == int(INF)] = UNREACHED
        got = sssp_distances(g, 0, rounds=rounds)
        np.testing.assert_array_equal(got, exp, err_msg=f"rounds={rounds}")


def test_earliest_arrival_matches_dense_relaxation():
    """Temporal earliest-arrival vs a dense synchronous relaxation on
    random timestamped arcs, at several round caps."""
    import pyarrow as pa
    import ray.data as rd

    from hedonic_ray.graph.temporal import (INF, UNREACHED,
                                            earliest_arrival)

    rng = np.random.default_rng(5)
    n_nodes, n_arcs = 25, 200
    src = rng.integers(0, n_nodes, n_arcs).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_arcs).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    t = rng.integers(1, 1000, len(src)).astype(np.int64)
    arcs = rd.from_arrow(pa.table({"src": src, "dst": dst, "t": t}))
    nodes = np.unique(np.concatenate([src, dst]))
    seed = int(nodes.min())
    for rounds in (1, 2, 4):
        exp = np.full(len(nodes), int(INF), dtype=np.int64)
        exp[np.searchsorted(nodes, seed)] = 0
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        for _ in range(rounds):
            nxt = exp.copy()
            ok = exp[si] <= t
            np.minimum.at(nxt, di[ok], t[ok])
            exp = nxt
        exp[exp == int(INF)] = UNREACHED
        got = earliest_arrival(arcs, nodes, seed, rounds=rounds)
        np.testing.assert_array_equal(got, exp, err_msg=f"rounds={rounds}")


def test_bfs_path_counts_matches_dense_dp():
    """σ_s(v) vs a dense level-DP oracle on a random undirected graph,
    at several radius caps (counts multiply along the BFS DAG)."""
    from hedonic_ray.algos.bfs import bfs_path_counts

    n = 30
    edges = rand_edges(n, 0.12, seed=33)
    g = make_graph(edges, n, num_parts=4)
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    for rounds in (2, 6):
        # dense BFS levels + path-count DP
        dist = [-1] * n
        dist[0] = 0
        frontier = [0]
        r = 0
        while frontier and r < rounds:
            r += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if dist[v] == -1:
                        dist[v] = r
                        nxt.append(v)
            frontier = nxt
        cnt = [0] * n
        cnt[0] = 1
        for rr in range(1, r + 1):
            for v in range(n):
                if dist[v] == rr:
                    cnt[v] = sum(cnt[u] for u in adj[v]
                                 if dist[u] == rr - 1)
        got_d, got_c = bfs_path_counts(g, 0, rounds=rounds)
        np.testing.assert_array_equal(got_d, np.array(dist))
        np.testing.assert_array_equal(got_c, np.array(cnt))

def test_bfs_downstream_paths_matches_dense_dp():
    """ρ(v) = Σ_{w∈succ} (1+ρ(w)) vs a dense descending-level DP on a
    random undirected graph, plus the stress identity: Σ_v σ(v)·ρ(v)
    telescopes to Σ over DAG paths of their length (checked against a
    brute path enumeration on a tiny graph)."""
    from hedonic_ray.algos.bfs import bfs_downstream_paths, bfs_path_counts

    n = 30
    edges = rand_edges(n, 0.12, seed=34)
    g = make_graph(edges, n, num_parts=4)
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    dist, cnt = bfs_path_counts(g, 0, rounds=6)
    got = bfs_downstream_paths(g, dist)
    rho = [0] * n
    for r in range(int(dist.max()) - 1, -1, -1):
        for v in range(n):
            if dist[v] == r:
                rho[v] = sum(1 + rho[w] for w in adj[v]
                             if dist[w] == r + 1)
    np.testing.assert_array_equal(got, np.array(rho))
    # non-vacuity: some interior vertex carries through-traffic
    interior = (dist >= 1) & (got > 0)
    assert interior.any()


def test_doc_stress_and_bipartite_not_vacuous():
    """The sf0.001 doc graph has interior through-traffic rows and (it
    contains triangles) nonzero odd-cycle conflict rows."""
    from hedonic_ray.pipelines.linkgraph import doc_bipartite, doc_stress

    st = doc_stress("/root/testdata/sf0.001")
    assert st.num_rows > 0
    thr = st.column("n_through").to_numpy()
    d = st.column("dist").to_numpy()
    assert ((thr > 0) & (d >= 1)).any()
    bp = doc_bipartite("/root/testdata/sf0.001")
    assert bp.num_rows > 0
    assert (bp.column("n_conflict").to_numpy() > 0).any()


def test_maximal_matching_valid_and_maximal():
    """Mutual-min-id rounds yield a VALID matching (disjoint
    endpoints, real edges) that is MAXIMAL once the rounds saturate
    (no remaining edge has both endpoints unmatched)."""
    from hedonic_ray.algos.matching import maximal_matching

    n = 40
    edges = rand_edges(n, 0.15, seed=35)
    g = make_graph(edges, n, num_parts=4)
    a, b, r = maximal_matching(g, rounds=32)
    assert len(a) > 0
    eps = np.concatenate([a, b])
    assert len(np.unique(eps)) == len(eps)          # disjoint
    eset = {(min(u, v), max(u, v)) for u, v in edges}
    assert all((u, v) in eset for u, v in zip(a, b))  # real edges
    matched = np.zeros(n, dtype=bool)
    matched[eps] = True
    assert all(matched[u] or matched[v] for u, v in eset)  # maximal


def test_boruvka_matches_kruskal():
    """The Borůvka forest equals a driver-side Kruskal under the same
    strict (w, a, b) key order on a random graph (unique keys ⇒ the
    MSF is unique, so two entirely different algorithms must agree)."""
    from hedonic_ray.algos.mst import edge_weight, minimum_spanning_forest

    n = 60
    edges = rand_edges(n, 0.08, seed=36)
    g = make_graph(edges, n, num_parts=4)
    a, b, w, r = minimum_spanning_forest(g)
    got = set(zip(a.tolist(), b.tolist()))
    # Kruskal with union-find
    canon = sorted(
        {(int(edge_weight(np.int64(min(u, v)), np.int64(max(u, v)))),
          min(u, v), max(u, v)) for u, v in edges})
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    exp = set()
    for wt, u, v in canon:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            exp.add((u, v))
    assert got == exp
    assert all(int(edge_weight(np.int64(u), np.int64(v))) == wt
               for u, v, wt in zip(a, b, w))


def test_luby_mis_independent_and_maximal():
    """Luby MIS invariants at saturation: no two MIS members adjacent
    (independence), every excluded vertex has a MIS neighbor
    (maximality), no vertex undecided."""
    from hedonic_ray.algos.mis import maximal_independent_set

    n = 50
    edges = rand_edges(n, 0.1, seed=37)
    g = make_graph(edges, n, num_parts=4)
    status, decided = maximal_independent_set(g, rounds=64)
    assert (status != 0).all()
    in_mis = status == 1
    assert in_mis.any()
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    for v in range(n):
        if in_mis[v]:
            assert not any(in_mis[w] for w in adj[v])
        else:
            assert any(in_mis[w] for w in adj[v]) or not adj[v]


def test_jp_coloring_proper_and_bounded():
    """JP coloring at saturation: proper (no monochromatic edge),
    ≤ Δ+1 colors, every vertex colored."""
    from hedonic_ray.algos.coloring import jones_plassmann_coloring

    n = 50
    edges = rand_edges(n, 0.12, seed=38)
    g = make_graph(edges, n, num_parts=4)
    color, decided = jones_plassmann_coloring(g, rounds=64)
    assert (color >= 0).all()
    deg = np.zeros(n, np.int64)
    for u, v in edges:
        assert color[u] != color[v]
        deg[u] += 1
        deg[v] += 1
    assert color.max() <= deg.max()


def test_square_count_matches_bruteforce():
    """Wedge-aggregation 4-cycle count vs brute-force enumeration of
    vertex quadruples on a random graph."""
    from itertools import combinations

    from hedonic_ray.pipelines import linkgraph as lg

    n = 18
    edges = rand_edges(n, 0.25, seed=40)
    g = make_graph(edges, n, num_parts=3)
    # replicate doc_squares' kernel directly on the toy graph
    import numpy as np
    from hedonic_ray.ops.dedup import _packed_pair_counts
    from hedonic_ray.engine.superstep import iter_block_views
    import pyarrow as pa

    def wedges(batch):
        a_out, b_out = [], []
        for bv in iter_block_views(batch):
            deg = np.diff(bv.indptr)
            for d in np.unique(deg):
                if d < 2:
                    continue
                starts = bv.indptr[:-1][deg == d]
                nb = bv.indices[starts[:, None] + np.arange(d)[None, :]]
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
    s = 0
    for b in counts.iter_batches(batch_size=65536,
                                 batch_format="pyarrow"):
        c = b.column("i").to_numpy()
        s += int((c * (c - 1) // 2).sum())
    got = s // 2
    eset = {(min(u, v), max(u, v)) for u, v in edges}

    def adj(u, v):
        return (min(u, v), max(u, v)) in eset

    exp = 0
    for q in combinations(range(n), 4):
        for perm in ((0, 1, 2, 3), (0, 1, 3, 2), (0, 2, 1, 3)):
            a_, b_, c_, d_ = (q[i] for i in perm)
            if adj(a_, b_) and adj(b_, c_) and adj(c_, d_) and adj(d_, a_):
                exp += 1
    assert got == exp


def test_critical_path_matches_dense_relaxation_and_backends():
    """Max-plus longest-path supersteps vs a dense synchronous
    relaxation on a random DAG (arcs low→high id, so acyclic), at
    several round caps; dataset and resident-shard backends must be
    bit-identical (the SSSP invariant)."""
    from hedonic_ray.algos.critical_path import longest_path_depths

    n = 40
    rng = np.random.default_rng(17)
    edges = sorted({(int(min(u, v)), int(max(u, v)))
                    for u, v in rng.integers(0, n, size=(160, 2)) if u != v})
    g = make_graph(edges, n, directed=True, num_parts=4)
    es = np.array([u for u, _ in edges])
    ed = np.array([v for _, v in edges])
    for rounds in (1, 3, 6, 12):
        exp = np.zeros(n, dtype=np.int64)
        for _ in range(rounds):
            nxt = exp.copy()
            np.maximum.at(nxt, ed, exp[es] + 1)
            if np.array_equal(nxt, exp):
                break
            exp = nxt
        got = longest_path_depths(g, rounds=rounds, backend="dataset")
        np.testing.assert_array_equal(got, exp, err_msg=f"rounds={rounds}")
        shards = longest_path_depths(g, rounds=rounds, backend="shards")
        np.testing.assert_array_equal(shards, exp,
                                      err_msg=f"shards rounds={rounds}")


def test_critical_path_chain_closed_form():
    """On a directed path 0→1→…→k the depth of vertex i is min(i,
    rounds) — the cap semantics the SQL oracle unrolls."""
    from hedonic_ray.algos.critical_path import longest_path_depths

    n = 9
    edges = [(i, i + 1) for i in range(n - 1)]
    g = make_graph(edges, n, directed=True, num_parts=2)
    got = longest_path_depths(g, rounds=4)
    np.testing.assert_array_equal(
        got, np.minimum(np.arange(n), 4).astype(np.int64))
    full = longest_path_depths(g, rounds=16)
    np.testing.assert_array_equal(full, np.arange(n, dtype=np.int64))


def test_pagerank_warm_start_split_run_bit_identical():
    """Running 5 iterations equals 3 iterations + a 2-iteration
    WARM-STARTED continuation, bit-exactly (same backend, no RNG) —
    the property graph_pagerank_refresh's incremental semantics rest
    on."""
    edges = rand_edges(60, 0.08, seed=11)
    g = make_graph(edges, 60, directed=True)
    full = pagerank(g, max_iters=5, tol=0.0, gather="dense").state["rank"]
    head = pagerank(g, max_iters=3, tol=0.0, gather="dense").state["rank"]
    cont = pagerank(g, max_iters=2, tol=0.0, gather="dense",
                    rank0=head).state["rank"]
    np.testing.assert_array_equal(full, cont)


def test_pagerank_warm_start_shards_matches_dense():
    """The resident-shard warm start (rank0 sliced per shard inside
    the spec) agrees with the Dataset backend at the gate's 1e-9
    rounding."""
    edges = rand_edges(80, 0.06, seed=12)
    g = make_graph(edges, 80, directed=True)
    r0 = pagerank(g, max_iters=3, tol=0.0, gather="dense").state["rank"]
    a = pagerank(g, max_iters=2, tol=0.0, gather="dense",
                 rank0=r0).state["rank"]
    b = pagerank(g, max_iters=2, tol=0.0, gather="shards",
                 rank0=r0).state["rank"]
    np.testing.assert_array_equal(np.floor(a * 1e9 + 0.5),
                                  np.floor(b * 1e9 + 0.5))


def test_neighborhood_function_vs_bfs_oracle():
    """N(h) must equal the per-source BFS distance histogram on a
    random graph (independent numpy adjacency-list oracle)."""
    from collections import deque

    import numpy as np

    from hedonic_ray.algos.anf import neighborhood_function
    from tests.fixtures import make_graph, rand_edges

    n = 40
    edges = rand_edges(n, 0.08, seed=7)
    g = make_graph(edges, n, num_parts=3)
    counts = neighborhood_function(g, rounds=32)

    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    hist = np.zeros(n + 1, np.int64)
    maxd = 0
    for s in range(n):
        dist = np.full(n, -1)
        dist[s] = 0
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for d in dist[dist >= 0]:
            hist[d] += 1
            maxd = max(maxd, int(d))
    expected = np.cumsum(hist[:maxd + 1])
    assert counts.tolist() == expected.tolist()


def test_neighborhood_function_rounds_cap_truncates():
    """A path graph with diameter 5 capped at rounds=2 reports only
    h = 0..2 (the radius-capped semantic the SQL cap mirrors)."""
    from hedonic_ray.algos.anf import neighborhood_function
    from tests.fixtures import make_graph

    g = make_graph([(i, i + 1) for i in range(5)], 6, num_parts=2)
    counts = neighborhood_function(g, rounds=2)
    # h=0: 6 self-pairs; h=1: +2*5 arcs; h=2: +2*4 two-hop pairs
    assert counts.tolist() == [6, 16, 24]
