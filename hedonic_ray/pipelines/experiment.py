"""Experiment harness: method registry × parameter grid → results table.

Distributed reconstruction of the reference's experiment flow
(``/root/reference/scripts/experiment.py:24-103`` and the
``config.methods`` registry, ``scripts/config.py:15-85``): for each
(SBM network, method, noise, partition seed) run the method, score ARI
accuracy + robustness + duration, and emit one flat record (FIXTURES.md
F6 schema) — a Dataset instead of param-encoded JSON paths.

Differences from the reference, by design:

* failures raise instead of silently yielding all-zero partitions
  (``scripts/experiment.py:27-31`` anti-pattern — SURVEY §7.5.2);
* results carry superstep metrics (iterations, edges/sec);
* the method registry maps to engine callables: ``hedonic`` (local
  moving), ``onepass`` (plurality LP), ``onepass_hedonic`` (α=0 best
  response), ``mirror`` (identity), ``labelprop`` (iterated LP), and
  ``spectral`` (leading-eigenvector bisection via distributed power
  iteration, ``algos/spectral.py`` — round 2), making the reference's
  full 5-method grid (scripts/config.py:15-85) replayable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from hedonic_ray.algos.hedonic import (
    hedonic_communities,
    mirror_communities,
    onepass_hedonic,
)
from hedonic_ray.algos.labelprop import label_propagation, onepass_improvement
from hedonic_ray.analytics.hedonic_stats import (
    adjusted_rand_index,
    partition_robustness,
)
from hedonic_ray.graph.build import build_link_graph, edges_from_numpy
from hedonic_ray.sources.synth import (
    ground_truth_membership,
    noisy_membership,
    sbm_edges,
)


def _run_method(name: str, g, init: np.ndarray, resolution: float | None,
                n_communities: int | None = None):
    if name == "hedonic":
        res = hedonic_communities(g, resolution=resolution,
                                  init_membership=init, max_iters=200)
        return res.state["coalition"], res
    if name == "onepass":
        return onepass_improvement(g, init), None
    if name == "onepass_hedonic":
        return onepass_hedonic(g, init), None
    if name == "mirror":
        return mirror_communities(g, init), None
    if name == "labelprop":
        res = label_propagation(g, init_labels=init, max_iters=100)
        return res.state["label"], None
    if name == "spectral":
        from hedonic_ray.algos.spectral import spectral_communities

        # igraph's leading_eigenvector ignores the initial partition;
        # the reference grid patches clusters := n_communities
        # (scripts/exp.py:69-75) — mirrored here
        return spectral_communities(g, clusters=n_communities or 8), None
    raise KeyError(f"unknown method {name!r}")


METHODS = ["hedonic", "onepass", "onepass_hedonic", "mirror", "labelprop",
           "spectral"]


@dataclass
class ExperimentGrid:
    """Mirrors ``config.experiment_params`` (scripts/config.py:3-13) at
    configurable scale."""

    n_communities: list = field(default_factory=lambda: [2, 3])
    community_size: int = 30
    p_in: list = field(default_factory=lambda: [0.3])
    multiplier: list = field(default_factory=lambda: [0.1])
    noises: list = field(default_factory=lambda: [0.0, 0.5, 2.0])
    network_seeds: list = field(default_factory=lambda: [1])
    partition_seeds: list = field(default_factory=lambda: [1])
    methods: list = field(default_factory=lambda: list(METHODS))


def run_experiment(grid: ExperimentGrid) -> pa.Table:
    """Full grid → flat results table (F6 schema)."""
    records: list[dict] = []
    for k in grid.n_communities:
        for p_in in grid.p_in:
            for mult in grid.multiplier:
                for net_seed in grid.network_seeds:
                    edges = sbm_edges(k, grid.community_size, p_in, mult,
                                      seed=net_seed)
                    n = k * grid.community_size
                    g = build_link_graph(edges_from_numpy(edges), n,
                                         directed=False)
                    gt = ground_truth_membership(k, grid.community_size)
                    resolution = g.density()
                    for method in grid.methods:
                        for noise in grid.noises:
                            for pseed in grid.partition_seeds:
                                init = noisy_membership(gt, noise, seed=pseed)
                                t0 = time.perf_counter()
                                mem, res = _run_method(method, g, init,
                                                       resolution,
                                                       n_communities=k)
                                dt = time.perf_counter() - t0
                                records.append({
                                    "method": method,
                                    "number_of_communities": k,
                                    "community_size": grid.community_size,
                                    "p_in": p_in,
                                    "p_out": p_in * mult,
                                    "multiplier": mult,
                                    "resolution": resolution,
                                    "duration": dt,
                                    "accuracy": adjusted_rand_index(mem, gt),
                                    "robustness": partition_robustness(g, mem),
                                    "noise": noise,
                                    "network_seed": net_seed,
                                    "partition_seed": pseed,
                                    "iterations": (res.iterations if res else 1),
                                    "converged": (res.converged if res else True),
                                })
    return pa.Table.from_pylist(records)


def summarize(results: pa.Table):
    """Grouped mean ± 1.96·σ/√n per (method, noise) — the figure
    aggregation (scripts/plot/paper_plots/plot_figures.py:214-241) as a
    Ray Data groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count, Mean, Std

    ds = rd.from_arrow(results)
    out = ds.groupby(["method", "noise"]).aggregate(
        Mean("accuracy", alias_name="accuracy_mean"),
        Std("accuracy", alias_name="accuracy_std"),
        Mean("robustness", alias_name="robustness_mean"),
        Mean("duration", alias_name="duration_mean"),
        Count(alias_name="n_runs"),
    )

    def ci(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        half = pc.multiply(
            pc.divide(t.column("accuracy_std"),
                      pc.sqrt(pc.cast(t.column("n_runs"), pa.float64()))),
            pa.scalar(1.96))
        return t.append_column("accuracy_ci95", half)

    return out.map_batches(ci, batch_format="pyarrow")
