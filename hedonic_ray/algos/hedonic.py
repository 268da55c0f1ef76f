"""Hedonic local-moving community detection — the flagship algorithm.

Distributed reconstruction of the reference's best-response dynamics
(``/root/reference/hedonic/__init__.py``): each vertex evaluates the
hedonic value

    value(v, c) = friends(v, c) * (1 - α)  -  strangers(v, c) * α
    strangers(v, c) = |c| - friends(v, c) - [v ∈ c]          (:69-75)

over its own coalition plus every coalition holding ≥1 neighbor
(:77-87, candidate set with ``can_create_new_clusters=False``
semantics), and moves on STRICT improvement (:84).  Default resolution
α = graph edge density (:78); default initial membership = singleton
partition (:47).

Semantics divergence (SURVEY §7.5, documented): the reference sweeps
vertices sequentially (:219-227), this engine moves all improving
vertices synchronously per superstep.  Both reach a Nash equilibrium —
``active_vertices == 0`` is exactly the reference's ``in_equilibrium``
scan (:89-94) — but trajectories/partitions may differ; acceptance is
the equilibrium invariant + payoff metrics, matching the reference's
own tolerance of run-to-run divergence (``scripts/exp.py:97-99``).
Synchronous moves can oscillate, so the step monitors the CPM potential
Φ = Σ_c [e_c − α·C(|c|,2)] (``scripts/robustness/meta_graph.py:20-30``)
and, when Φ stalls, thins the mover set by an escalating seeded-hash
filter (acceptance 1/2, 1/4, … of improving vertices); once the active
set is small the loop serializes to one max-gain move per superstep,
which strictly increases Φ and therefore terminates — the same argument
as the reference's sequential sweep.

Ties among equally-best target coalitions break to the LOWEST coalition
id (the reference's dict-iteration order is nondeterministic).
"""

from __future__ import annotations

import numpy as np

from hedonic_ray.algos._labels import (
    empty_label_messages,
    gather_label_counts,
    scatter_label_counts,
)
from hedonic_ray.algos.labelprop import argmax_per_vertex
from hedonic_ray.engine.superstep import run_supersteps, RunResult


def cpm_potential(membership: np.ndarray, friends_own: np.ndarray,
                  resolution: float) -> float:
    """Φ = Σ_c [e_c − α·C(n_c,2)] from per-vertex own-coalition friend
    counts (Σ_v friends_own = 2·Σ_c e_c)."""
    sizes = np.bincount(membership)
    pairs = sizes * (sizes - 1) / 2.0
    return float(friends_own.sum() / 2.0 - resolution * pairs.sum())


class HedonicStep:
    def __init__(self, resolution: float | None = None,
                 init_membership: np.ndarray | None = None,
                 serial_tail: bool = True):
        self.resolution = resolution
        self.init_membership = init_membership
        # serial_tail only applies to the iterated convergence loop; the
        # one-pass variants must apply ALL improving moves in their
        # single synchronous pass (hedonic/__init__.py:282-292)
        self.serial_tail = serial_tail
        self._phi_hist: list[float] = []
        self._stall = 0

    def _alpha(self, g) -> float:
        return g.density() if self.resolution is None else self.resolution

    def init_state(self, g) -> dict:
        if self.init_membership is not None:
            mem = np.asarray(self.init_membership, dtype=np.int64).copy()
            if mem.shape != (g.n,) or mem.min() < 0 or mem.max() >= g.n:
                raise ValueError("membership must be (n,) ints in [0, n)")
        else:
            mem = np.arange(g.n, dtype=np.int64)  # singleton partition (:47)
        return {"coalition": mem}

    def broadcast_state(self, state: dict):
        return state["coalition"]

    def empty_messages(self, mode: str):
        return empty_label_messages()

    def scatter(self, block, membership: np.ndarray, mode: str):
        return scatter_label_counts(block, membership)

    def gather(self, msgs_ds, mode: str, g) -> dict:
        return gather_label_counts(msgs_ds, mode)

    TAIL_SERIAL = 64  # active ≤ this → one best-gain mover per superstep

    def _damp_and_move(self, mem: np.ndarray, d: np.ndarray, l: np.ndarray,
                       gain: np.ndarray, phi: float, alpha: float,
                       active: int, it: int):
        """Shared across execution backends: track Φ, thin movers on
        stall, apply moves.

        Near equilibrium (small active set) synchronous moves livelock:
        micro-improvements of Φ keep resetting the damping, and each
        reset re-ignites swap bursts.  Two safeguards:

        * the stall counter DECAYS on improvement instead of resetting,
          so damping ratchets up around a hovering Φ;
        * when ``active ≤ TAIL_SERIAL`` the step serializes: exactly ONE
          mover — the max-gain vertex (ties → lowest id) — moves per
          superstep.  A single strict-improvement move raises Φ
          strictly, so the tail terminates for the same reason the
          reference's sequential sweep does (hedonic/__init__.py:219-227).
        """
        best = max(self._phi_hist) if self._phi_hist else -np.inf
        if phi > best + 1e-12:
            self._stall = max(0, self._stall - 2)
        else:
            self._stall += 1
        self._phi_hist.append(phi)

        if self.serial_tail and active and active <= self.TAIL_SERIAL:
            # Coalition-disjoint greedy tail: movers whose (source,
            # target) coalition pairs are pairwise disjoint have
            # additive gains — moving one does not change another's
            # value for ITS move (friend counts only change inside the
            # first mover's coalitions) — so Φ increases by Σ gains > 0
            # strictly.  Greedy by gain, ties → lowest vertex id.
            order = np.lexsort((d, -gain))
            used: set = set()
            sel = []
            for i in order.tolist():
                src_c, tgt_c = int(mem[d[i]]), int(l[i])
                if src_c not in used and tgt_c not in used:
                    sel.append(i)
                    used.add(src_c)
                    used.add(tgt_c)
            d, l = d[sel], l[sel]
            level = -1  # marker: serialized tail
        else:
            # Escalating damping: thin the mover set with a seeded hash,
            # halving acceptance the longer Φ has stalled.
            level = 0 if self._stall < 2 else min(6, 1 + (self._stall - 2) // 3)
            if level and active:
                from hedonic_ray.functions.hashing import hash_ints

                keep = hash_ints(d, seed=31 * it + level) % (1 << level) == 0
                d, l = d[keep], l[keep]
        new = mem.copy()
        new[d] = l
        extra = {"potential": phi, "resolution": alpha,
                 "moved": int(len(d)), "damp_level": level}
        return new, extra

    def apply(self, state: dict, arrs: dict, g, it: int):
        mem = state["coalition"]
        alpha = self._alpha(g)
        n = g.n
        dst = arrs["dst"].astype(np.int64)
        lab = arrs["lab"].astype(np.int64)
        cnt = arrs["cnt"].astype(np.float64)

        sizes = np.bincount(mem, minlength=n).astype(np.float64)
        f_own = np.zeros(n, dtype=np.float64)
        own_row = lab == mem[dst]
        f_own[dst[own_row]] = cnt[own_row]
        # value of staying (computed for ALL vertices, even with 0 friends home)
        v_own = f_own * (1 - alpha) - (sizes[mem] - f_own - 1.0) * alpha
        # candidate values (identical arithmetic → own rows tie exactly)
        val = cnt * (1 - alpha) - (sizes[lab] - cnt - own_row.astype(np.float64)) * alpha

        improving = val > v_own[dst]
        d, l, v = argmax_per_vertex(dst[improving], lab[improving], val[improving])
        gain = v - v_own[d]
        active = len(d)

        phi = cpm_potential(mem, f_own, alpha)
        new, extra = self._damp_and_move(mem, d, l, gain, phi, alpha, active, it)
        return {"coalition": new}, active, extra

    def prefers_tasks(self, g) -> bool:
        return g.m >= 400_000

    def tasks_step(self, g, state: dict, it: int):
        """Task-exchange backend (engine/exchange.py) — same decision
        rule, combine + argmax parallelized per destination partition."""
        from hedonic_ray.engine.exchange import label_exchange_step

        mem = state["coalition"]
        alpha = self._alpha(g)
        d, l, gain, f_own_total, active = label_exchange_step(
            g, mem, mode="hedonic", alpha=alpha)
        sizes = np.bincount(mem)
        phi = float(f_own_total / 2.0 - alpha * (sizes * (sizes - 1) / 2.0).sum())
        new, extra = self._damp_and_move(mem, d.astype(np.int64),
                                         l.astype(np.int64), gain, phi,
                                         alpha, active, it)
        return {"coalition": new}, active, extra


def hedonic_communities(g, *, resolution: float | None = None,
                        init_membership=None, max_iters: int = 200,
                        gather: str = "auto", checkpoint_dir=None, run_id=None,
                        checkpoint_every: int = 5, resume: bool = False) -> RunResult:
    """Local-moving hedonic game dynamics to Nash equilibrium
    (``community_hedonic_traversal``, hedonic/__init__.py:214-228).
    ``result.state['coalition']`` is the final membership."""
    if g.directed:
        raise ValueError("hedonic_communities needs an undirected LinkGraph")
    algo = HedonicStep(resolution=resolution, init_membership=init_membership)
    return run_supersteps(g, algo, max_iters=max_iters, gather=gather,
                          checkpoint_dir=checkpoint_dir, run_id=run_id,
                          checkpoint_every=checkpoint_every, resume=resume)


def onepass_hedonic(g, init_membership, *, gather: str = "auto") -> np.ndarray:
    """One synchronous best-response pass at α=0 (max-friends) — the
    distributed ``community_onepass_improvement_hedonic``
    (hedonic/__init__.py:282-292).  All improving vertices move."""
    algo = HedonicStep(resolution=0.0, init_membership=init_membership,
                       serial_tail=False)
    res = run_supersteps(g, algo, max_iters=1, gather=gather)
    return res.state["coalition"]


def mirror_communities(g, init_membership=None) -> np.ndarray:
    """Identity baseline (``community_mirror``, hedonic/__init__.py:261-264)."""
    if init_membership is None:
        return np.zeros(g.n, dtype=np.int64)
    return np.asarray(init_membership, dtype=np.int64).copy()
