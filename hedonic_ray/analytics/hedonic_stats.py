"""Distributed hedonic analytics over (graph, membership).

Reconstructs the reference's analytics surface
(``/root/reference/hedonic/__init__.py``):

* ``node_comm_counts`` — the ``get_nodes_info`` gather (:294-352) as a
  scatter → groupby pipeline: one row ``(vertex, coalition, friends)``
  per vertex × *adjacent* coalition.  Strangers are derived, never
  materialized: ``strangers(v,c) = sizes[c] - friends - [c == own]``
  (:345).  Non-adjacent coalitions (friends = 0) are handled in closed
  form from the community-size table instead of densifying V×C.
* satisfaction classification (:354-370), robustness (:372-394),
  equilibrium fraction (:451-456), vectorized equilibrium with
  ``np.isclose`` (:560-659), resolution spectrum (:432-449),
  legacy α∈{0,1} robustness (:134-160), ARI accuracy (:114-118 via
  pair-counting closed form), CPM partition potential
  (``scripts/robustness/meta_graph.py:20-30``).

All per-vertex reductions are vectorized segment ops over the gathered
rows (sorted by vertex); nothing loops over Python rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from hedonic_ray.algos._labels import gather_label_counts, scatter_label_counts
from hedonic_ray.engine.superstep import iter_block_views, resolve_gather


# ------------------------------------------------------------ core gather


def node_comm_counts(g, membership: np.ndarray, *, gather: str = "auto") -> dict:
    """(vertex, coalition, friends) rows, sorted by (vertex, coalition).

    The distributed ``get_nodes_info`` (hedonic/__init__.py:294-352):
    scatter per-block partial counts, gather via groupby / driver merge.
    """
    import ray

    mode = resolve_gather(gather, g.n)
    mem = np.asarray(membership, dtype=np.int64)
    mem_ref = ray.put(mem)

    def _scatter(batch, _ref=mem_ref):
        import pyarrow as pa

        m = ray.get(_ref)
        outs = [scatter_label_counts(bv, m) for bv in iter_block_views(batch)]
        return pa.concat_tables(outs) if outs else pa.table(
            {"dst": [], "lab": [], "cnt": []})

    msgs = g.blocks.map_batches(_scatter, batch_format="pyarrow", batch_size=4)
    arrs = gather_label_counts(msgs, mode)
    order = np.lexsort((arrs["lab"], arrs["dst"]))
    return {"vertex": arrs["dst"][order].astype(np.int64),
            "coalition": arrs["lab"][order].astype(np.int64),
            "friends": arrs["cnt"][order].astype(np.int64)}


def community_sizes(membership: np.ndarray, n: int) -> np.ndarray:
    """Member count per coalition id (Counter at hedonic/__init__.py:315)."""
    return np.bincount(np.asarray(membership, dtype=np.int64), minlength=n)


# -------------------------------------------------- per-vertex segment stats


@dataclass
class VertexStats:
    """Per-vertex reductions of the counts table + closed-form handling
    of non-adjacent (friends = 0) coalitions."""

    n: int
    f_own: np.ndarray          # friends in own coalition
    s_own: np.ndarray          # strangers in own coalition
    max_f: np.ndarray          # max friends over ALL coalitions (>=0)
    min_s: np.ndarray          # min strangers over ALL coalitions
    comp_min_s: np.ndarray     # min strangers over NON-adjacent coalitions (inf if none)
    rows: dict = field(repr=False)      # the sorted counts table
    row_start: np.ndarray = field(repr=False)  # per-vertex slice starts into rows
    row_count: np.ndarray = field(repr=False)
    sizes: np.ndarray = field(repr=False)
    membership: np.ndarray = field(repr=False)

    def row_values(self, alpha: float) -> np.ndarray:
        """Hedonic value of each counts row at resolution alpha."""
        f = self.rows["friends"].astype(np.float64)
        lab = self.rows["coalition"]
        own = (lab == self.membership[self.rows["vertex"]]).astype(np.float64)
        s = self.sizes[lab] - f - own
        return f * (1.0 - alpha) - s * alpha

    def own_value(self, alpha: float) -> np.ndarray:
        return self.f_own * (1.0 - alpha) - self.s_own * alpha

    def best_value(self, alpha: float) -> np.ndarray:
        """Max hedonic value over ALL coalitions per vertex (adjacent
        rows + the closed-form best non-adjacent coalition)."""
        vals = self.row_values(alpha)
        best = np.full(self.n, -np.inf)
        if len(vals):
            np.maximum.at(best, self.rows["vertex"], vals)
        comp = np.where(np.isfinite(self.comp_min_s),
                        -alpha * self.comp_min_s, -np.inf)
        return np.maximum(best, comp)


def vertex_stats(g, membership: np.ndarray, *, gather: str = "auto",
                 counts: dict | None = None) -> VertexStats:
    n = g.n
    mem = np.asarray(membership, dtype=np.int64)
    rows = counts if counts is not None else node_comm_counts(g, mem, gather=gather)
    v, lab, f = rows["vertex"], rows["coalition"], rows["friends"]
    sizes = community_sizes(mem, n).astype(np.int64)

    row_count = np.bincount(v, minlength=n)
    row_start = np.concatenate([[0], np.cumsum(row_count)[:-1]])

    f_own = np.zeros(n, dtype=np.int64)
    own_mask = lab == mem[v]
    f_own[v[own_mask]] = f[own_mask]
    s_own = sizes[mem] - f_own - 1

    max_f = np.zeros(n, dtype=np.int64)  # 0 = any non-adjacent coalition
    np.maximum.at(max_f, v, f)

    s_rows = sizes[v * 0 + lab] - f - own_mask.astype(np.int64)
    row_min_s = np.full(n, np.iinfo(np.int64).max)
    np.minimum.at(row_min_s, v, s_rows)

    comp_min_s = _complement_min_strangers(n, mem, sizes, rows)
    # when every coalition is adjacent to v, comp_min_s is inf
    min_s = np.minimum(row_min_s.astype(np.float64), comp_min_s)
    return VertexStats(n=n, f_own=f_own.astype(np.float64),
                       s_own=s_own.astype(np.float64),
                       max_f=max_f.astype(np.float64), min_s=min_s,
                       comp_min_s=comp_min_s, rows=rows, row_start=row_start,
                       row_count=row_count, sizes=sizes.astype(np.float64),
                       membership=mem)


def _complement_min_strangers(n: int, mem: np.ndarray, sizes: np.ndarray,
                              rows: dict) -> np.ndarray:
    """For each vertex, min over NON-adjacent coalitions c of
    ``sizes[c] - [c == own]`` — walks coalitions in ascending size and
    resolves each vertex at the first coalition absent from its rows
    (total work ≤ Σ rows)."""
    existing = np.flatnonzero(sizes > 0)
    order = np.lexsort((existing, sizes[existing]))
    sorted_comms = existing[order]
    # vertices adjacent to a coalition, grouped once
    by_comm: dict[int, np.ndarray] = {}
    if len(rows["vertex"]):
        c_order = np.argsort(rows["coalition"], kind="stable")
        cs = rows["coalition"][c_order]
        vs = rows["vertex"][c_order]
        starts = np.flatnonzero(np.concatenate([[True], cs[1:] != cs[:-1]]))
        bounds = np.concatenate([starts, [len(cs)]])
        for i, s in enumerate(starts):
            by_comm[int(cs[s])] = vs[s:bounds[i + 1]]

    base = np.full(n, np.inf)
    unresolved = np.ones(n, dtype=bool)
    for c in sorted_comms.tolist():
        if not unresolved.any():
            break
        blocked = np.zeros(n, dtype=bool)
        adj = by_comm.get(c)
        if adj is not None:
            blocked[adj] = True
        newly = unresolved & ~blocked
        base[newly] = sizes[c]
        # own-coalition correction handled below; mark resolved
        unresolved[newly] = False
    # if own coalition is non-adjacent, sizes[own]-1 also competes
    own_adj = np.zeros(n, dtype=bool)
    if len(rows["vertex"]):
        own_rows = rows["coalition"] == mem[rows["vertex"]]
        own_adj[rows["vertex"][own_rows]] = True
    own_val = np.where(~own_adj, sizes[mem] - 1.0, np.inf)
    return np.minimum(base, own_val)


# ------------------------------------------------------------ equilibrium

ALWAYS, NEVER, RELATIVE = 0, 1, 2


def equilibrium_flags(g, membership, alpha: float, *, stats: VertexStats | None = None,
                      gather: str = "auto") -> np.ndarray:
    """Per-vertex: own-coalition value isclose to the max over all
    coalitions (hedonic/__init__.py:560-659 semantics)."""
    st = stats or vertex_stats(g, membership, gather=gather)
    return np.isclose(st.own_value(alpha), st.best_value(alpha))


def equilibrium_fraction(g, membership, alpha: float, *, stats=None,
                         gather: str = "auto") -> float:
    """hedonic/__init__.py:451-456."""
    return float(equilibrium_flags(g, membership, alpha, stats=stats,
                                   gather=gather).mean())


def classify_satisfaction(g, membership, *, stats: VertexStats | None = None,
                          gather: str = "auto") -> np.ndarray:
    """ALWAYS / NEVER / RELATIVE per vertex (hedonic/__init__.py:354-370):
    robust coalitions achieve BOTH max friends and min strangers; a
    vertex is always-satisfied iff its own coalition is robust,
    never-satisfied iff a robust coalition exists elsewhere, otherwise
    relatively satisfied (resolution-dependent)."""
    st = stats or vertex_stats(g, membership, gather=gather)
    n = st.n
    rows_v = st.rows["vertex"]
    rows_f = st.rows["friends"].astype(np.float64)
    own_mask = st.rows["coalition"] == st.membership[rows_v]
    s_rows = st.sizes[st.rows["coalition"]] - rows_f - own_mask

    # does any coalition achieve both maxima?
    robust_exists = np.zeros(n, dtype=bool)
    achieves = (rows_f == st.max_f[rows_v]) & (s_rows == st.min_s[rows_v])
    robust_exists[rows_v[achieves]] = True
    # non-adjacent coalitions have f = 0: they qualify when max_f == 0
    comp_qualifies = (st.max_f == 0) & (st.comp_min_s == st.min_s)
    robust_exists |= comp_qualifies

    own_robust = (st.f_own == st.max_f) & (st.s_own == st.min_s)
    out = np.full(n, RELATIVE, dtype=np.int8)
    out[robust_exists & own_robust] = ALWAYS
    out[robust_exists & ~own_robust] = NEVER
    return out


def partition_robustness(g, membership, *, stats=None, gather: str = "auto") -> float:
    """Fraction of always-satisfied vertices (hedonic/__init__.py:372-394)."""
    cls = classify_satisfaction(g, membership, stats=stats, gather=gather)
    return float((cls == ALWAYS).mean())


def resolution_spectrum(g, membership, resolutions=None, *, gather: str = "auto"):
    """(resolutions, fractions, robustness) — hedonic/__init__.py:432-449:
    always-satisfied count is resolution-free; relatively-satisfied
    vertices are re-evaluated per resolution; never-satisfied vertices
    never count."""
    resolutions = np.linspace(0, 1, 11) if resolutions is None else np.asarray(resolutions, float)
    st = vertex_stats(g, membership, gather=gather)
    cls = classify_satisfaction(g, membership, stats=st)
    always = int((cls == ALWAYS).sum())
    robustness = always / g.n
    doubtful = cls == RELATIVE
    if not doubtful.any():
        return resolutions, np.full(len(resolutions), robustness), robustness
    fractions = np.empty(len(resolutions))
    for i, a in enumerate(resolutions):
        eq = np.isclose(st.own_value(a), st.best_value(a)) & doubtful
        fractions[i] = (eq.sum() + always) / g.n
    return resolutions, fractions, robustness


# ----------------------------------------------- exact-integer certificates
#
# At resolution α = num/den (a rational — e.g. the hedonic default
# α = density = m / C(n,2), hedonic/__init__.py:78), every hedonic value
# comparison is EXACT integer arithmetic once scaled by den:
#     den·value(v, c) = friends·(den − num) − strangers·num.
# These variants never touch floats, so the driver gate can mirror them
# in DuckDB SQL verbatim (the float paths above keep the reference's
# np.isclose semantics for API parity).


def _check_int64_budget(n: int, max_f: int, num: int, den: int) -> None:
    if max(max_f, 1) * den + n * num >= 2 ** 62:
        raise OverflowError(
            f"exact hedonic values overflow int64 (n={n}, den={den}); "
            "reduce den or switch this gather to Python-int reduction")


def nash_flags_exact(g, membership, num: int, den: int, *,
                     candidates: str = "all",
                     stats: VertexStats | None = None,
                     gather: str = "auto") -> np.ndarray:
    """Per-vertex bool: own coalition's value at α = num/den is ≥ every
    candidate coalition's (exact integers; ties → satisfied, matching
    the reference's strict-improvement move rule,
    hedonic/__init__.py:89-94).

    ``candidates="adjacent"`` is the dynamics' move set (own + neighbor
    coalitions — the sense in which the engine converges);
    ``candidates="all"`` spans every existing coalition (the reference's
    ``is_in_equilibrium``, hedonic/__init__.py:560-659, with exact
    comparison instead of np.isclose)."""
    if candidates not in ("all", "adjacent"):
        raise ValueError(f"unknown candidate set {candidates!r}")
    st = stats or vertex_stats(g, membership, gather=gather)
    num, den = int(num), int(den)
    v = st.rows["vertex"]
    lab = st.rows["coalition"]
    f = st.rows["friends"].astype(np.int64)
    sizes_i = st.sizes.astype(np.int64)
    _check_int64_budget(st.n, int(f.max()) if len(f) else 0, num, den)
    own_mask = lab == st.membership[v]
    s_rows = sizes_i[lab] - f - own_mask.astype(np.int64)
    vals = f * (den - num) - s_rows * num
    own_val = (st.f_own.astype(np.int64) * (den - num)
               - st.s_own.astype(np.int64) * num)
    best = np.full(st.n, np.iinfo(np.int64).min, dtype=np.int64)
    if len(vals):
        np.maximum.at(best, v, vals)
    sat = own_val >= best
    if candidates == "all":
        # non-adjacent coalitions: friends = 0, strangers = the
        # closed-form complement minimum (inf when every coalition is
        # adjacent to v)
        has_comp = np.isfinite(st.comp_min_s)
        comp_s = np.where(has_comp, st.comp_min_s, 0).astype(np.int64)
        sat &= ~has_comp | (own_val >= -comp_s * num)
    return sat


def spectrum_exact_tenths(g, membership, *, stats: VertexStats | None = None,
                          gather: str = "auto"):
    """``resolution_spectrum`` over the grid α = i/10, i = 0..10, with
    exact integer satisfaction tests (hedonic/__init__.py:432-449
    semantics: always-satisfied count is resolution-free, relatively
    satisfied vertices re-evaluated per grid point, never-satisfied
    never count).  Returns (tenths, eq_counts, robust_count) as ints."""
    st = stats or vertex_stats(g, membership, gather=gather)
    cls = classify_satisfaction(g, membership, stats=st)
    always = int((cls == ALWAYS).sum())
    doubtful = cls == RELATIVE
    tenths = np.arange(11, dtype=np.int64)
    eq_counts = np.empty(11, dtype=np.int64)
    for i in range(11):
        sat = nash_flags_exact(g, membership, i, 10, candidates="all",
                               stats=st)
        eq_counts[i] = always + int((sat & doubtful).sum())
    return tenths, eq_counts, always


def metrics_exact(g, membership, other_membership=None, *,
                  stats: VertexStats | None = None,
                  gather: str = "auto") -> dict[str, int]:
    """Partition-quality metrics as EXACT integers at the played
    resolution α = m/C(n,2): CPM potential scaled by den
    (den·Φ = den·e_in − num·Σ C(size,2)), all-coalition equilibrium
    count, robustness count, and — when ``other_membership`` is given —
    the ARI numerator/denominator pair
    (num2 = 2·(nc2·Σcomb − sa·sb), den2 = nc2·(sa+sb) − 2·sa·sb,
    so ARI = num2/den2 exactly; hedonic/__init__.py:114-118)."""
    st = stats or vertex_stats(g, membership, gather=gather)
    n = g.n
    m = g.undirected_edge_count
    num, den = int(m), n * (n - 1) // 2
    sizes_i = st.sizes.astype(np.int64)
    e_in = int(st.f_own.sum()) // 2
    pairs = int((sizes_i * (sizes_i - 1) // 2).sum())
    out = {
        "n_vertices": n,
        "m_edges": m,
        "alpha_num": num,
        "alpha_den": den,
        "n_coalitions": int((sizes_i > 0).sum()),
        "intra_edges": e_in,
        "potential_scaled": den * e_in - num * pairs,  # Python ints: no overflow
        "eq_count": int(nash_flags_exact(g, membership, num, den,
                                         candidates="all", stats=st).sum()),
        "robust_count": int((classify_satisfaction(
            g, membership, stats=st) == ALWAYS).sum()),
    }
    if other_membership is not None:
        a = np.asarray(membership, dtype=np.int64)
        b = np.asarray(other_membership, dtype=np.int64)
        hi = int(max(b.max(), 0)) + 1
        _, cnt = np.unique(a * np.int64(hi) + b, return_counts=True)
        sum_comb = int((cnt.astype(object) * (cnt - 1) // 2).sum())
        _, ca = np.unique(a, return_counts=True)
        _, cb = np.unique(b, return_counts=True)
        sa = int((ca.astype(object) * (ca - 1) // 2).sum())
        sb = int((cb.astype(object) * (cb - 1) // 2).sum())
        nc2 = den
        out["ari_num2"] = 2 * (nc2 * sum_comb - sa * sb)
        out["ari_den2"] = nc2 * (sa + sb) - 2 * sa * sb
    return out


# ------------------------------------------------------------ best response


def best_response(g, membership, alpha: float, *, stats=None,
                  gather: str = "auto") -> np.ndarray:
    """Strict-improvement best-response target per vertex (candidates =
    own + adjacent coalitions, hedonic/__init__.py:77-87; ties → lowest
    coalition id)."""
    from hedonic_ray.algos.labelprop import argmax_per_vertex

    st = stats or vertex_stats(g, membership, gather=gather)
    vals = st.row_values(alpha)
    own_val = st.own_value(alpha)
    rows_v = st.rows["vertex"]
    improving = vals > own_val[rows_v]
    d, l, _ = argmax_per_vertex(rows_v[improving], st.rows["coalition"][improving],
                                vals[improving])
    out = st.membership.copy()
    out[d] = l
    return out


def robustness_legacy(g, membership, *, gather: str = "auto"):
    """Per-coalition (robust_count, size): vertices whose best response
    at BOTH α=0 and α=1 is their own coalition
    (``robustness_per_community``, hedonic/__init__.py:134-160)."""
    st = vertex_stats(g, membership, gather=gather)
    mem = st.membership
    br0 = best_response(g, mem, 0.0, stats=st)
    br1 = best_response(g, mem, 1.0, stats=st)
    robust = (br0 == mem) & (br1 == mem)
    comms = np.unique(mem)
    return {int(c): (int(robust[mem == c].sum()), int((mem == c).sum()))
            for c in comms}


# ------------------------------------------------------------ global metrics


def partition_potential(g, membership, alpha: float | None = None, *,
                        stats=None, gather: str = "auto") -> float:
    """CPM potential Φ = Σ_c [e_c − α·C(n_c,2)]
    (scripts/robustness/meta_graph.py:20-30; halved node-potential sum).
    Default α = graph density, matching the hedonic default."""
    a = g.density() if alpha is None else alpha
    st = stats or vertex_stats(g, membership, gather=gather)
    pairs = st.sizes * (st.sizes - 1) / 2.0
    return float(st.f_own.sum() / 2.0 - a * pairs.sum())


def adjusted_rand_index(pred, truth) -> float:
    """Exact ARI via the pair-counting contingency table — the
    distributed-safe closed form of igraph ``compare_communities``
    ("adjusted_rand", hedonic/__init__.py:114-118).  Inputs are
    membership vectors."""
    a = np.asarray(pred, dtype=np.int64)
    b = np.asarray(truth, dtype=np.int64)
    n = len(a)
    if n < 2:
        return 1.0
    hi = max(b.max(), 0) + 1
    key = a * np.int64(hi) + b
    _, cnt = np.unique(key, return_counts=True)
    sum_comb = (cnt * (cnt - 1) / 2.0).sum()
    _, ca = np.unique(a, return_counts=True)
    _, cb = np.unique(b, return_counts=True)
    sa = (ca * (ca - 1) / 2.0).sum()
    sb = (cb * (cb - 1) / 2.0).sum()
    nc2 = n * (n - 1) / 2.0
    expected = sa * sb / nc2
    max_idx = (sa + sb) / 2.0
    if max_idx == expected:
        return 1.0
    return float((sum_comb - expected) / (max_idx - expected))


def community_to_partition(n: int, community) -> np.ndarray:
    """Indicator membership (hedonic/__init__.py:405-409)."""
    out = np.zeros(n, dtype=np.int64)
    out[np.asarray(list(set(community)), dtype=np.int64)] = 1
    return out


def evaluate_community_stability(g, community, *, gather: str = "auto") -> dict:
    """Fractions of insiders wanting to leave / outside neighbors wanting
    to join the indicator partition (hedonic/__init__.py:411-430; the
    preference rule is argmax FRIENDS, :396-403, ties → lowest id)."""
    n = g.n
    inside = np.zeros(n, dtype=bool)
    inside[np.asarray(list(set(community)), dtype=np.int64)] = True
    mem = inside.astype(np.int64)
    counts = node_comm_counts(g, mem, gather=gather)
    v, lab, f = counts["vertex"], counts["coalition"], counts["friends"]
    # prefer community with max friends; ties → lowest coalition id
    from hedonic_ray.algos.labelprop import argmax_per_vertex

    d, l, _ = argmax_per_vertex(v, lab, f.astype(np.float64))
    pref = np.full(n, -1, dtype=np.int64)
    pref[d] = l
    outer_neighbors = np.zeros(n, dtype=bool)
    has_inside_neighbor = (lab == 1)
    outer_neighbors[v[has_inside_neighbor]] = True
    outer_neighbors &= ~inside
    want_leave = inside & (pref == 0)
    want_join = outer_neighbors & (pref == 1)
    n_out = int(outer_neighbors.sum())
    return {
        "fraction_want_to_leave": float(want_leave.sum() / max(1, inside.sum())),
        "fraction_want_to_join": float(want_join.sum() / n_out) if n_out else 0.0,
    }
