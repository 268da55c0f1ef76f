"""Spectral community detection — leading eigenvector of the
modularity matrix via distributed power iteration.

Closes the one reference method with no round-1 counterpart:
``community_leading_eigenvector`` (``/root/reference/scripts/config.py:34-41``,
``scripts/exp.py:71-72`` — igraph's ARPACK eigensolver).  Rebuilt
Ray-first with Newman's formulation (Newman 2006, "Modularity and
community structure in networks"):

    B_ij = A_ij − k_i k_j / (2m)

* leading eigenvector of ``B`` by shifted power iteration — the only
  O(E) work per iteration is one distributed ``A·x`` product through
  the engine's numeric task exchange (``engine/exchange.py``);
* split = sign(x); recursive bisection uses the GENERALIZED modularity
  matrix ``B^(g)`` (B restricted to a group with row-sum correction,
  Newman eq. 51) so sub-splits optimize global modularity;
* a split is accepted only when ΔQ = sᵀB^(g)s / (4m) > 0 and the
  leading eigenvalue is positive — otherwise the group is
  indivisible, exactly igraph's stopping rule.

Driver state is O(V) vectors (the engine's documented posture);
determinism comes from a fixed-seed start vector per group.

``backend="auto"`` moves the power iteration onto the resident-state
shard supersteps (`_SpectralVecSpec` on
`engine/shards.py:VectorShardPool`) above ``SHARDS_MIN_VERTICES`` or
under ``HEDONIC_RAY_FORCE_SCALE``: the UN-NORMALIZED iterate stays
sharded in the actors and the driver threads only the (mean, norm,
kx) scalars per round — centering and normalization commute with the
matvec (``A·(y−μ1_g)/ν = (A·y − μ·A·1_g)/ν`` with ``A·1_g`` cached
from the init round), so one O(group) ship per bisection split
replaces the Dataset path's two O(V) broadcasts per iteration.  The
backends agree exactly on well-separated graphs (float merge ORDER is
the only difference; tested equal on planted SBMs).
"""

from __future__ import annotations

import numpy as np

from hedonic_ray.engine.exchange import numeric_exchange_step

SHARDS_MIN_VERTICES = 200_000  # same switch point as PageRank/CC/Katz


def _ax(g, x: np.ndarray) -> np.ndarray:
    """Distributed A·x over the symmetrized adjacency (one exchange
    round; partials combined per destination range)."""
    return numeric_exchange_step(g, x.astype(np.float64), mode="copy_sum")


def _group_correction(g, members: np.ndarray, deg: np.ndarray,
                      two_m: float) -> np.ndarray:
    """d^(g)_i = (A·1_g)_i − k_i·(Σ_{j∈g} k_j)/2m for i ∈ g — the
    diagonal row-sum correction of Newman's B^(g).  One A·x product."""
    ind = np.zeros(g.n)
    ind[members] = 1.0
    a1 = _ax(g, ind)
    kg = float(deg[members].sum())
    return a1[members] - deg[members] * (kg / two_m)


def _bg_times(g, members, deg, two_m, dcorr, xm: np.ndarray) -> np.ndarray:
    """B^(g)·x restricted to the group (x supported on members)."""
    x = np.zeros(g.n)
    x[members] = xm
    ax = _ax(g, x)[members]
    kx = float((deg[members] * xm).sum())
    return ax - deg[members] * (kx / two_m) - xm * dcorr


def _leading_split(g, members, deg, two_m, *, iters: int, tol: float,
                   seed: int):
    """Power-iterate B^(g)+σI on a group.  Returns (s ∈ {−1,+1}^|g|,
    ΔQ) or (None, 0.0) when the group is indivisible."""
    k = len(members)
    if k < 2:
        return None, 0.0
    dcorr = _group_correction(g, members, deg, two_m)
    sigma = 2.0 * float(deg[members].max()) + 1.0
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(k)
    x -= x.mean()
    nrm = np.linalg.norm(x)
    if nrm == 0:
        return None, 0.0
    x /= nrm
    lam = 0.0
    for _ in range(iters):
        bx = _bg_times(g, members, deg, two_m, dcorr, x)
        y = bx + sigma * x
        y -= y.mean()  # deflate the all-ones null direction
        nrm = np.linalg.norm(y)
        if nrm < 1e-30:
            return None, 0.0
        y /= nrm
        lam = float(x @ bx)
        if abs(float(y @ x)) > 1.0 - 1e-12:
            x = y
            break
        x = y
    if lam <= tol:
        return None, 0.0
    s = np.where(x >= 0.0, 1.0, -1.0)
    if np.all(s == s[0]):
        return None, 0.0
    bs = _bg_times(g, members, deg, two_m, dcorr, s)
    dq = float(s @ bs) / (2.0 * two_m)
    if dq <= tol:
        return None, 0.0
    return s, dq


class _SpectralVecSpec:
    """Vector-superstep spec (`engine/shards.py:VectorShardPool`) for
    one bisection split: the raw (un-centered, un-normalized) power
    iterate ``y`` lives restricted to the group members inside each
    shard; the member list and start vector arrive as ``ray.put`` refs
    (one object-store read per actor per split, never per round).

    Round protocol (scalars thread through ``rnd``):

    * ``("init", kg)`` — scatter ships the member indicator, merge
      caches ``a1 = (A·1_g)|_g`` and the row-sum correction
      ``dcorr = a1 − k·(kg/2m)``;
    * ``("iter", mean, nrm, kx)`` — scatter ships raw ``y``; merge
      normalizes locally (``x = (y−mean)/nrm``), folds
      ``ax = (A·y − mean·a1)/nrm``, forms ``bx = ax − k·(kx/2m) −
      x·dcorr`` and the next raw iterate ``y' = bx + σx``, returning
      the five scalar partials the driver needs (Σy', Σy'², Σk·y',
      x·bx, y'·x).
    """

    def __init__(self, members_ref, x0_ref, kg: float, two_m: float,
                 sigma: float):
        self.members_ref = members_ref
        self.x0_ref = x0_ref
        self.kg, self.two_m, self.sigma = kg, two_m, sigma

    def init_slice(self, lo, hi, n):
        import ray

        members = ray.get(self.members_ref)
        x0 = ray.get(self.x0_ref)
        sel = (members >= lo) & (members < hi)
        midx = (members[sel] - lo).astype(np.int64)
        mask = np.zeros(hi - lo, dtype=bool)
        mask[midx] = True
        return {"midx": midx, "mask": mask, "yloc": x0[sel].copy(),
                "deg": None, "a1": None, "dcorr": None, "phase": 0}

    def scatter(self, state, lo, hi, indptr, indices, src):
        if state["deg"] is None:
            state["deg"] = np.diff(indptr)
        deg = state["deg"]
        mask = state["mask"]
        live = np.repeat(mask, deg)
        if not live.any():
            return np.empty(0, np.int64), np.empty(0, np.float64)
        vec = np.zeros(hi - lo, dtype=np.float64)
        if state["phase"] == 0:
            vec[state["midx"]] = 1.0
        else:
            vec[state["midx"]] = state["yloc"]
        per_edge = np.repeat(vec, deg)[live]
        dst = indices[live]
        order = np.argsort(dst, kind="stable")
        sx = dst[order]
        sv = per_edge[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(sx)) + 1])
        return sx[starts].astype(np.int64), np.add.reduceat(sv, starts)

    def merge(self, state, lo, hi, n, incoming, rnd):
        midx = state["midx"]
        agg = np.zeros(hi - lo, dtype=np.float64)
        for dst, val in incoming:
            if len(dst):
                agg[dst - lo] += val
        deg_m = state["deg"][midx].astype(np.float64)
        if rnd[0] == "init":
            kg = rnd[1]
            a1 = agg[midx]
            state["a1"] = a1
            state["dcorr"] = a1 - deg_m * (kg / self.two_m)
            state["phase"] = 1
            return {"active": 1}
        _, mean, nrm, kx = rnd
        y = state["yloc"]
        x = (y - mean) / nrm
        ax = (agg[midx] - mean * state["a1"]) / nrm
        bx = ax - deg_m * (kx / self.two_m) - x * state["dcorr"]
        y_new = bx + self.sigma * x
        state["yloc"] = y_new
        return {"active": 1,
                "sy": float(y_new.sum()),
                "sy2": float(y_new @ y_new),
                "sdy": float(deg_m @ y_new),
                "xbx": float(x @ bx),
                "yx": float(y_new @ x)}


def _leading_split_shards(g, members, deg, two_m, *, iters: int,
                          tol: float, seed: int):
    """Resident-state twin of `_leading_split`: same shifted power
    iteration and stopping rules, but per round the driver ships three
    floats down and gets five partials per shard up.  The only
    O(group) driver transfers are the start vector / member list (once
    per split) and the final iterate collect; ΔQ reuses the Dataset
    `_bg_times` for its single product."""
    import ray

    from hedonic_ray.engine.shards import VectorShardPool

    k = len(members)
    if k < 2:
        return None, 0.0
    kg = float(deg[members].sum())
    sigma = 2.0 * float(deg[members].max()) + 1.0
    rng = np.random.default_rng(seed)
    x0 = rng.standard_normal(k)
    x0 -= x0.mean()
    nrm0 = np.linalg.norm(x0)
    if nrm0 == 0:
        return None, 0.0
    x0 /= nrm0
    spec = _SpectralVecSpec(ray.put(np.asarray(members, np.int64)),
                            ray.put(x0), kg, two_m, sigma)
    pool = VectorShardPool(g, spec)
    pool.step(("init", kg))
    mean, nrm = 0.0, 1.0
    kx = float(deg[members] @ x0)
    sx = float(x0.sum())  # Σx of the CURRENT normalized iterate
    lam = 0.0
    for _ in range(iters):
        stats = pool.step(("iter", mean, nrm, kx))
        sy = sum(s["sy"] for s in stats)
        sy2 = sum(s["sy2"] for s in stats)
        sdy = sum(s["sdy"] for s in stats)
        lam = sum(s["xbx"] for s in stats)
        yx = sum(s["yx"] for s in stats)
        mean = sy / k
        nrm = float(np.sqrt(max(sy2 - sy * sy / k, 0.0)))
        if nrm < 1e-30:
            return None, 0.0
        dot = (yx - mean * sx) / nrm
        kx = (sdy - mean * kg) / nrm
        sx = (sy - k * mean) / nrm
        if abs(dot) > 1.0 - 1e-12:
            break
    if lam <= tol:
        return None, 0.0
    x = (pool.collect("yloc") - mean) / nrm
    s = np.where(x >= 0.0, 1.0, -1.0)
    if np.all(s == s[0]):
        return None, 0.0
    dcorr = pool.collect("dcorr")
    bs = _bg_times(g, members, deg, two_m, dcorr, s)
    dq = float(s @ bs) / (2.0 * two_m)
    if dq <= tol:
        return None, 0.0
    return s, dq


def spectral_communities(g, *, clusters: int = 8, iters: int = 80,
                         tol: float = 1e-9, seed: int = 0,
                         backend: str = "auto"):
    """Recursive leading-eigenvector bisection; returns an (n,) int64
    membership (community id = min vertex id of the community, the
    engine's stable labeling convention).

    ``clusters`` caps the number of communities (like the reference's
    ``clusters`` argument); splitting also stops wherever a group is
    spectrally indivisible (no positive eigenvalue / no ΔQ gain).

    ``backend="auto"`` picks the resident-shard-state power iteration
    (`_SpectralVecSpec`) above ``SHARDS_MIN_VERTICES`` or under
    ``HEDONIC_RAY_FORCE_SCALE``, else the Dataset exchange loop.
    """
    if g.directed:
        raise ValueError("spectral_communities needs an undirected LinkGraph")
    if backend == "auto":
        from hedonic_ray.context import force_scale

        backend = "shards" if (force_scale() or
                               g.n >= SHARDS_MIN_VERTICES) else "exchange"
    split = _leading_split_shards if backend == "shards" else _leading_split
    deg = g.out_degree.astype(np.float64)
    two_m = float(g.m)  # arcs of the symmetrized graph = Σ degrees = 2m
    if two_m == 0:
        return np.arange(g.n, dtype=np.int64)
    membership = np.zeros(g.n, dtype=np.int64)  # one community to start
    queue = [np.arange(g.n, dtype=np.int64)]
    n_comms = 1
    out: list[np.ndarray] = []
    while queue and n_comms < clusters:
        members = queue.pop(0)
        s, _dq = split(g, members, deg, two_m, iters=iters,
                       tol=tol, seed=seed + int(members.min()))
        if s is None:
            out.append(members)
            continue
        queue.append(members[s > 0])
        queue.append(members[s < 0])
        n_comms += 1
    out.extend(queue)
    for grp in out:
        membership[grp] = grp.min()
    return membership
