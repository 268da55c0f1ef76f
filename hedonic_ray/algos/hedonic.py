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
                 serial_tail: bool = True, local_sweep: bool = True):
        self.resolution = resolution
        self.init_membership = init_membership
        # serial_tail only applies to the iterated convergence loop; the
        # one-pass variants must apply ALL improving moves in their
        # single synchronous pass (hedonic/__init__.py:282-292)
        self.serial_tail = serial_tail
        # local_sweep: tasks-backend partitions run a sequential
        # within-partition local-moving sweep per superstep (the
        # reference's queue dynamics, sharded) — cuts superstep counts
        # several-fold.  Disabled automatically near equilibrium (the
        # provably-terminating serial tail takes over) and for one-pass
        # variants (serial_tail=False implies pure synchronous moves).
        self.local_sweep = local_sweep
        self._phi_hist: list[float] = []
        self._stall = 0
        self._prev_active: int | None = None
        self._sweep_stalled = False
        self._pool = None  # ShardPool (stateful sharded apply)
        self._applied: tuple | None = None  # last superstep's movers

    def _alpha(self, g) -> float:
        return g.density() if self.resolution is None else self.resolution

    def on_resume(self, state: dict) -> None:
        """Restore damping state from a checkpoint (run_supersteps calls
        this on the resume path so Φ-stall damping doesn't reset)."""
        self._phi_hist = [float(x) for x in state.get("phi_hist", [])]
        self._stall = int(state.get("stall", 0))

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
    SWEEP_MAX_FLOOR = 16_000  # sweep window ≤ max(this, V/8)

    def sweep_max(self, g) -> int:
        """Upper edge of the local-sweep window, ∝ V (ROADMAP 5): the
        mid-active grind range the sweeps exist to kill scales with the
        graph, so a constant tuned at V=120k (16k ≈ V/8) would starve
        larger graphs; the floor keeps small/bench graphs at the
        quality-validated window."""
        return max(self.SWEEP_MAX_FLOOR, g.n // 8)

    def _damp_and_move(self, mem: np.ndarray, d: np.ndarray, l: np.ndarray,
                       gain: np.ndarray, phi: float, alpha: float,
                       active: int, it: int, from_sweep: bool = False):
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
            # halving acceptance the longer Φ has stalled.  Sweep-chain
            # movers are exempt (applied all-or-none): a sweep's
            # zero-gain chain only improves Φ JOINTLY, so committing a
            # hash-chosen subset could strictly decrease it — and the
            # sweep window is closed once damping engages (tasks_step
            # gates on _stall), so thinning and sweeps never interleave.
            level = 0 if self._stall < 2 else min(6, 1 + (self._stall - 2) // 3)
            if from_sweep:
                level = 0
            if level and active:
                from hedonic_ray.functions.hashing import hash_ints

                keep = hash_ints(d, seed=31 * it + level) % (1 << level) == 0
                d, l = d[keep], l[keep]
        new = mem.copy()
        new[d] = l
        # applied movers (v, old, new) — the sharded-apply actors fold
        # exactly this delta in at the next superstep
        self._applied = (np.asarray(d, dtype=np.int64),
                         mem[d].astype(np.int64),
                         np.asarray(l, dtype=np.int64))
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
        return self._state_out(new), active, extra

    def _state_out(self, new: np.ndarray) -> dict:
        # damping internals ride along in the state dict so checkpoints
        # persist them (restored via on_resume)
        return {"coalition": new, "phi_hist": list(self._phi_hist),
                "stall": int(self._stall)}

    def prefers_tasks(self, g) -> bool:
        return g.m >= 400_000

    def tasks_step(self, g, state: dict, it: int):
        """Raw-Ray backend: stateful sharded-apply actors
        (engine/shards.py — incremental counts, one round/superstep,
        O(movers) traffic) for iterated runs; stateless task exchange
        (engine/exchange.py) for one-pass variants.  Same decision
        rule and damping as the Dataset backends → bit-identical
        trajectories (tested) unless the local sweep is engaged."""
        mem = state["coalition"]
        alpha = self._alpha(g)
        # sweep WINDOW: plain synchronous steps while the mover set is
        # huge (global sync dynamics find better optima than greedy
        # partition-local chains from a singleton start — measured: Φ
        # 510k vs 620k on the bench SBM), sequential local sweeps once
        # the active set is mid-sized (kills the ~100-superstep tail
        # grind: 140 → ~76 supersteps, final Φ slightly ABOVE the pure
        # sync path), provably-terminating serial tail at the end
        prev = self._prev_active
        # _stall < 2: never sweep once Φ-stall damping engages — the
        # damping hash-thins movers, and a thinned (partial) sweep chain
        # can strictly DECREASE Φ; closed sweep window + stall ratchet +
        # serial tail is the termination argument
        sweep = (self.local_sweep and self.serial_tail
                 and not self._sweep_stalled and self._stall < 2
                 and prev is not None
                 and self.TAIL_SERIAL < prev <= self.sweep_max(g))
        if self.serial_tail:  # iterated run → stateful sharded apply
            from hedonic_ray.engine.shards import ShardPool

            if self._pool is None:
                self._pool = ShardPool(g, mem, alpha, "hedonic")
                self._applied = (np.empty(0, np.int64),) * 3
            d, l, gain, f_own_total, active = self._pool.step(
                *self._applied, sweep)
        else:
            # one-pass variants: stateless task exchange, pure
            # synchronous moves (sweep never applies here)
            from hedonic_ray.engine.exchange import label_exchange_step

            d, l, gain, f_own_total, active = label_exchange_step(
                g, mem, mode="hedonic", alpha=alpha)
        # a sweep whose moves net out to zero while vertices still want
        # to move would loop forever — fall back to the plain path
        self._sweep_stalled = bool(sweep and active > 0 and len(d) == 0)
        if sweep and active <= self.TAIL_SERIAL:
            # the serialized tail's strict-Φ-increase argument needs
            # standalone-improving movers; sweep chains carry zero
            # gains and may only improve jointly — discard them and let
            # the next superstep (sweep auto-disabled: prev ≤ TAIL)
            # take the provably-terminating pure path
            d = d[:0]
            l = l[:0]
            gain = gain[:0]
        self._prev_active = active
        sizes = np.bincount(mem)
        phi = float(f_own_total / 2.0 - alpha * (sizes * (sizes - 1) / 2.0).sum())
        new, extra = self._damp_and_move(mem, d.astype(np.int64),
                                         l.astype(np.int64), gain, phi,
                                         alpha, active, it)
        extra["sweep"] = int(sweep)
        return self._state_out(new), active, extra


def hedonic_communities(g, *, resolution: float | None = None,
                        init_membership=None, max_iters: int = 200,
                        gather: str = "auto", checkpoint_dir=None, run_id=None,
                        checkpoint_every: int = 5, resume: bool = False,
                        local_sweep: bool = True,
                        candidates: str = "adjacent") -> RunResult:
    """Local-moving hedonic game dynamics to Nash equilibrium
    (``community_hedonic_traversal``, hedonic/__init__.py:214-228).
    ``result.state['coalition']`` is the final membership.

    ``local_sweep=False`` forces the pure synchronous step on every
    backend (bit-identical across dense/shuffle/tasks); the default
    sweep accelerates the tasks backend with within-partition
    sequential local moving — different trajectory, same certified
    Nash-equilibrium invariant (``converged`` ⇒ active == 0).

    ``candidates="all"`` (ROADMAP 7) tightens the result to the
    STRICTER equilibrium over every existing coalition — the
    reference's ``is_in_equilibrium`` sense
    (hedonic/__init__.py:560-659) rather than its dynamics' own +
    neighbor move set — via an exact-integer refinement phase after
    convergence (:func:`_strict_refine`)."""
    if g.directed:
        raise ValueError("hedonic_communities needs an undirected LinkGraph")
    if candidates not in ("adjacent", "all"):
        raise ValueError(f"unknown candidate set {candidates!r}")
    algo = HedonicStep(resolution=resolution, init_membership=init_membership,
                       local_sweep=local_sweep)
    res = run_supersteps(g, algo, max_iters=max_iters, gather=gather,
                         checkpoint_dir=checkpoint_dir, run_id=run_id,
                         checkpoint_every=checkpoint_every, resume=resume)
    if candidates == "all":
        _strict_refine(g, res, resolution, max_iters=max_iters,
                       gather=gather, local_sweep=local_sweep)
    return res


STRICT_MAX_MOVES = 4096  # loud budget for the strict refinement loop


def _strict_best_target(st, mem, v: int, num: int, den: int) -> int:
    """Exact-integer best coalition for ``v`` over ALL existing
    coalitions except its own: adjacent candidates from the gathered
    rows, non-adjacent in closed form (f = 0 ⇒ value = −size·num,
    maximized by the smallest coalition).  Ties → lowest coalition id
    (the engine's move-rule tie-break)."""
    lo = int(st.row_start[v])
    cnt = int(st.row_count[v])
    labs = st.rows["coalition"][lo:lo + cnt].astype(np.int64)
    fs = st.rows["friends"][lo:lo + cnt].astype(np.int64)
    own = int(mem[v])
    sizes = st.sizes.astype(np.int64)
    keep = labs != own
    cand_lab = labs[keep]
    cand_val = (fs[keep] * (den - num)
                - (sizes[cand_lab] - fs[keep]) * num)
    mask = sizes > 0
    mask[labs] = False
    mask[own] = False
    if mask.any():
        na = np.flatnonzero(mask)
        best_sz = int(sizes[na].min())
        na_lab = int(na[sizes[na] == best_sz].min())
        cand_lab = np.concatenate([cand_lab, [na_lab]])
        cand_val = np.concatenate([cand_val, [-best_sz * num]])
    own_val = int(st.f_own[v]) * (den - num) - int(st.s_own[v]) * num
    best = int(cand_val.max())
    assert best > own_val, "caller guarantees v is all-coalition-unsatisfied"
    return int(cand_lab[cand_val == best].min())


def _strict_refine(g, res: RunResult, resolution, *, max_iters: int,
                   gather: str, local_sweep: bool) -> None:
    """Tighten an adjacent-candidate Nash point into the ALL-coalition
    equilibrium: repeatedly move the lowest-id unsatisfied vertex (the
    exact flags of `analytics/hedonic_stats.py:nash_flags_exact`,
    candidates="all") to its strictly-better best coalition, then
    re-converge the neighbor dynamics warm-started from the improved
    state.  Every move strictly increases the integer CPM potential
    den·Φ, so the loop terminates; the move budget raises loudly
    rather than looping.  Cost shape at scale: the unsat set after
    adjacent convergence is tiny (the measured 0.996 fraction gap),
    each round is one O(E) analytics gather + a near-equilibrium
    warm-start re-convergence."""
    from hedonic_ray.analytics.hedonic_stats import (nash_flags_exact,
                                                     vertex_stats)

    if resolution is None:
        num, den = int(g.undirected_edge_count), g.n * (g.n - 1) // 2
    else:
        num, den = float(resolution).as_integer_ratio()
    mem = np.asarray(res.state["coalition"], np.int64).copy()
    moves = 0
    while True:
        st = vertex_stats(g, mem, gather=gather)
        sat = nash_flags_exact(g, mem, num, den, candidates="all", stats=st)
        unsat = np.flatnonzero(~sat)
        if not len(unsat):
            break
        if moves >= STRICT_MAX_MOVES:
            raise RuntimeError(
                "strict hedonic refinement exceeded STRICT_MAX_MOVES "
                f"({STRICT_MAX_MOVES}) without reaching the all-coalition "
                "equilibrium")
        v = int(unsat[0])
        mem[v] = _strict_best_target(st, mem, v, num, den)
        algo2 = HedonicStep(resolution=resolution, init_membership=mem,
                            local_sweep=local_sweep)
        r2 = run_supersteps(g, algo2, max_iters=max_iters, gather=gather)
        mem = np.asarray(r2.state["coalition"], np.int64)
        res.metrics.extend(r2.metrics)
        moves += 1
    res.state["coalition"] = mem
    res.converged = True
    res.iterations += moves
    res.metrics.append({"iteration": res.iterations, "active_vertices": 0,
                        "edges_processed": 0, "seconds": 0.0,
                        "strict_moves": moves})


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
