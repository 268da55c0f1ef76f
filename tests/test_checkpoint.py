import numpy as np
import pytest

from fixtures import make_graph, rand_edges
from hedonic_ray.algos.pagerank import pagerank
from hedonic_ray.algos.hedonic import hedonic_communities
from hedonic_ray.engine.checkpoint import load_latest


def test_pagerank_checkpoint_resume(tmp_path):
    n = 50
    edges = rand_edges(n, 0.1, seed=3)
    g = make_graph(edges, n, directed=True, num_parts=4)
    full = pagerank(g, max_iters=60, tol=1e-14)

    ckpt = str(tmp_path / "ck")
    # run only a few supersteps, "crash", then resume
    partial = pagerank(g, max_iters=6, tol=1e-14, checkpoint_dir=ckpt,
                       run_id="pr", checkpoint_every=3)
    assert not partial.converged
    loaded = load_latest(ckpt, "pr", graph=g)
    assert loaded is not None and loaded.superstep in (2, 5)
    resumed = pagerank(g, max_iters=60, tol=1e-14, checkpoint_dir=ckpt,
                       run_id="pr", resume=True)
    np.testing.assert_allclose(resumed.state["rank"], full.state["rank"],
                               atol=1e-12)
    # resume skipped the already-done supersteps
    assert resumed.metrics[0]["iteration"] > 0


def test_checkpoint_fingerprint_mismatch(tmp_path):
    n = 20
    g1 = make_graph(rand_edges(n, 0.2, seed=1), n, directed=True, num_parts=3)
    g2 = make_graph(rand_edges(n, 0.2, seed=2), n, directed=True, num_parts=3)
    ckpt = str(tmp_path / "ck")
    pagerank(g1, max_iters=4, checkpoint_dir=ckpt, run_id="x", checkpoint_every=2)
    with pytest.raises(ValueError, match="different graph"):
        load_latest(ckpt, "x", graph=g2)


def test_hedonic_checkpoint_resume_reaches_equilibrium(tmp_path):
    import oracles

    n = 40
    edges = rand_edges(n, 0.15, seed=12)
    g = make_graph(edges, n, num_parts=4)
    ckpt = str(tmp_path / "ck")
    hedonic_communities(g, max_iters=3, checkpoint_dir=ckpt, run_id="h",
                        checkpoint_every=1)
    res = hedonic_communities(g, max_iters=100, checkpoint_dir=ckpt,
                              run_id="h", resume=True)
    assert res.converged
    assert res.metrics[0]["iteration"] >= 3
    assert oracles.is_equilibrium(n, edges, res.state["coalition"].tolist(),
                                  g.density())


def test_resume_path_validates_fingerprint(tmp_path):
    """run_supersteps(resume=True) itself must reject a checkpoint from
    a different graph (ADVICE r1: the production resume path skipped
    the fingerprint check)."""
    n = 20
    g1 = make_graph(rand_edges(n, 0.2, seed=1), n, directed=True, num_parts=3)
    g2 = make_graph(rand_edges(n, 0.2, seed=2), n, directed=True, num_parts=3)
    ckpt = str(tmp_path / "ck")
    pagerank(g1, max_iters=4, checkpoint_dir=ckpt, run_id="x", checkpoint_every=2)
    with pytest.raises(ValueError, match="different graph"):
        pagerank(g2, max_iters=8, checkpoint_dir=ckpt, run_id="x", resume=True)


def test_hedonic_shards_checkpoint_resume(tmp_path):
    """Kill mid-run and resume THROUGH THE SHARDS BACKEND
    (gather="tasks" + serial_tail → ShardPool): the resumed run
    re-loads the pre-spawned actor base from the RESTORED membership
    (ApplyShard.load on a non-singleton partition) and still reaches a
    certified Nash equilibrium."""
    import oracles

    n = 60
    edges = rand_edges(n, 0.12, seed=9)
    g = make_graph(edges, n, num_parts=4)
    ckpt = str(tmp_path / "ck")
    r1 = hedonic_communities(g, max_iters=4, gather="tasks",
                             checkpoint_dir=ckpt, run_id="hs",
                             checkpoint_every=2)
    assert not r1.converged
    res = hedonic_communities(g, max_iters=200, gather="tasks",
                              checkpoint_dir=ckpt, run_id="hs", resume=True)
    assert res.converged
    assert res.metrics[0]["iteration"] >= 2
    assert oracles.is_equilibrium(n, edges, res.state["coalition"].tolist(),
                                  g.density())


def test_hedonic_resume_restores_damping_state(tmp_path):
    """phi_hist / stall ride in the checkpointed state and are restored
    via on_resume, so a resumed run continues the damping schedule."""
    from hedonic_ray.algos.hedonic import hedonic_communities

    n = 40
    edges = rand_edges(n, 0.15, seed=5)
    g = make_graph(edges, n, num_parts=3)
    ckpt = str(tmp_path / "ck")
    r1 = hedonic_communities(g, max_iters=6, checkpoint_dir=ckpt,
                             run_id="h", checkpoint_every=2)
    assert len(r1.state.get("phi_hist", [])) > 0
    r2 = hedonic_communities(g, max_iters=40, checkpoint_dir=ckpt,
                             run_id="h", resume=True)
    assert r2.metrics[0]["iteration"] > 0
    # the resumed run's phi history continues, not restarts
    assert len(r2.state["phi_hist"]) >= len(r1.state["phi_hist"])
