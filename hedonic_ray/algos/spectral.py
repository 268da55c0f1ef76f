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
"""

from __future__ import annotations

import numpy as np

from hedonic_ray.engine.exchange import numeric_exchange_step


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


def spectral_communities(g, *, clusters: int = 8, iters: int = 80,
                         tol: float = 1e-9, seed: int = 0):
    """Recursive leading-eigenvector bisection; returns an (n,) int64
    membership (community id = min vertex id of the community, the
    engine's stable labeling convention).

    ``clusters`` caps the number of communities (like the reference's
    ``clusters`` argument); splitting also stops wherever a group is
    spectrally indivisible (no positive eigenvalue / no ΔQ gain).
    """
    if g.directed:
        raise ValueError("spectral_communities needs an undirected LinkGraph")
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
        s, _dq = _leading_split(g, members, deg, two_m, iters=iters,
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
