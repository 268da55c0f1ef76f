"""Pure NumPy / dict reference implementations (igraph-free).

These define ground truth independently of the engine, mirroring the
reference's semantics (citations into /root/reference/):

* hedonic value / best response — hedonic/__init__.py:39-87
* nodes_info friend/stranger gather — hedonic/__init__.py:294-352
* satisfaction classification / robustness — hedonic/__init__.py:354-394
  and scripts/robustness/robust.py:7-45
* CPM partition potential — scripts/robustness/meta_graph.py:20-30
* PageRank — standard damped power iteration (dense)
* connected components — union-find
* ARI — pair-counting contingency closed form
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def adjacency(n: int, edges) -> list[set]:
    nb = [set() for _ in range(n)]
    for u, v in edges:
        if u != v:
            nb[u].add(v)
            nb[v].add(u)
    return nb


# ------------------------------------------------------------ hedonic core


def hedonic_value(friends: float, strangers: float, alpha: float) -> float:
    return friends * (1 - alpha) - strangers * alpha


def nodes_info(n: int, edges, membership) -> dict:
    """hedonic/__init__.py:294-352 — every community represented for
    every node, strangers = total - friends - [own]."""
    comm_counter = Counter(membership)
    friends_counts = {v: Counter() for v in range(n)}
    for u, v in edges:
        if u == v:
            continue
        friends_counts[u][membership[v]] += 1
        friends_counts[v][membership[u]] += 1
    info = {}
    for v in range(n):
        own = membership[v]
        d = {}
        for c, total in comm_counter.items():
            f = friends_counts[v].get(c, 0)
            d[c] = {"friends": f, "strangers": total - f - (1 if c == own else 0)}
        info[v] = d
    return info


def best_response(n: int, edges, membership, alpha: float) -> np.ndarray:
    """Synchronous best-response target per vertex: strict improvement
    over own community, candidates = own + neighbor communities
    (hedonic/__init__.py:77-87), ties → lowest community id (engine
    rule)."""
    nb = adjacency(n, edges)
    sizes = Counter(membership)
    out = np.array(membership, dtype=np.int64).copy()
    for v in range(n):
        own = membership[v]
        fr = Counter(membership[u] for u in nb[v])
        f_own = fr.get(own, 0)
        best_val = hedonic_value(f_own, sizes[own] - f_own - 1, alpha)
        best_c = own
        for c in sorted(fr):
            if c == own:
                continue
            val = hedonic_value(fr[c], sizes[c] - fr[c], alpha)
            if val > best_val:
                best_val, best_c = val, c
        out[v] = best_c
    return out


def is_equilibrium(n: int, edges, membership, alpha: float) -> bool:
    """hedonic/__init__.py:89-94 — no vertex strictly prefers another
    candidate community."""
    return bool(np.all(best_response(n, edges, membership, alpha)
                       == np.asarray(membership)))


def cpm_potential(n: int, edges, membership, alpha: float) -> float:
    """Φ = Σ_c [e_c − α·C(n_c,2)] (meta_graph.py:20-30, halved sum of
    node potentials)."""
    sizes = Counter(membership)
    e_in = Counter()
    for u, v in edges:
        if u != v and membership[u] == membership[v]:
            e_in[membership[u]] += 1
    return sum(e_in[c] - alpha * s * (s - 1) / 2 for c, s in sizes.items())


# ------------------------------------------------------------ robustness


def classify_satisfaction(node_info: dict, own: int) -> str:
    """hedonic/__init__.py:354-370."""
    max_f = max(i["friends"] for i in node_info.values())
    min_s = min(i["strangers"] for i in node_info.values())
    robust = {c for c, i in node_info.items()
              if i["friends"] == max_f and i["strangers"] == min_s}
    if robust:
        return "always_satisfied" if own in robust else "never_satisfied"
    return "relatively_satisfied"


def partition_robustness(n: int, edges, membership) -> float:
    """Fraction of always-satisfied nodes (hedonic/__init__.py:372-394,
    independently scripts/robustness/robust.py:7-45)."""
    info = nodes_info(n, edges, membership)
    flags = [classify_satisfaction(info[v], membership[v]) == "always_satisfied"
             for v in range(n)]
    return sum(flags) / n


def equilibrium_fraction(n: int, edges, membership, alpha: float) -> float:
    """Fraction of nodes whose own-community potential is (isclose) the
    max over ALL communities (hedonic/__init__.py:451-456,560-659)."""
    info = nodes_info(n, edges, membership)
    cnt = 0
    for v in range(n):
        vals = {c: hedonic_value(i["friends"], i["strangers"], alpha)
                for c, i in info[v].items()}
        if np.isclose(vals[membership[v]], max(vals.values())):
            cnt += 1
    return cnt / n


# ------------------------------------------------------------ classic algos


def pagerank_dense(n: int, directed_edges, damping=0.85, iters=100, tol=1e-12):
    """Dense power iteration with uniform dangling redistribution."""
    outdeg = np.zeros(n)
    for u, v in directed_edges:
        outdeg[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in directed_edges:
            contrib[v] += r[u] / outdeg[u]
        dangling = r[outdeg == 0].sum()
        new = (1 - damping) / n + damping * (contrib + dangling / n)
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return r


def components_uf(n: int, edges) -> np.ndarray:
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min vertex id per component
    roots = [find(v) for v in range(n)]
    comp_min = defaultdict(lambda: n)
    for v, r in enumerate(roots):
        comp_min[r] = min(comp_min[r], v)
    return np.array([comp_min[r] for r in roots], dtype=np.int64)


def triangles_brute(n: int, edges) -> tuple[int, np.ndarray]:
    nb = adjacency(n, edges)
    per = np.zeros(n, dtype=np.int64)
    total = 0
    for u in range(n):
        for v in nb[u]:
            if v <= u:
                continue
            for w in nb[u] & nb[v]:
                if w > v:
                    total += 1
                    per[u] += 1
                    per[v] += 1
                    per[w] += 1
    return total, per


def lp_onepass(n: int, edges, labels) -> np.ndarray:
    """Synchronous plurality pass, lowest-label tie-break."""
    nb = adjacency(n, edges)
    out = np.asarray(labels, dtype=np.int64).copy()
    for v in range(n):
        if not nb[v]:
            continue
        cnt = Counter(labels[u] for u in nb[v])
        best = max(cnt.values())
        out[v] = min(c for c, k in cnt.items() if k == best)
    return out


def adjusted_rand_index(a, b) -> float:
    """Closed-form ARI from the contingency table."""
    a = np.asarray(a)
    b = np.asarray(b)
    n = len(a)
    cont = Counter(zip(a.tolist(), b.tolist()))
    sum_comb = sum(v * (v - 1) / 2 for v in cont.values())
    ai = Counter(a.tolist())
    bi = Counter(b.tolist())
    sa = sum(v * (v - 1) / 2 for v in ai.values())
    sb = sum(v * (v - 1) / 2 for v in bi.values())
    nc2 = n * (n - 1) / 2
    expected = sa * sb / nc2 if nc2 else 0.0
    max_idx = (sa + sb) / 2
    if max_idx == expected:
        return 1.0
    return (sum_comb - expected) / (max_idx - expected)


# ------------------------------------------------------------ enumeration


def all_partitions_membership(n: int):
    """All set-partitions of {0..n-1} in normalized membership form
    (scripts/robustness/partitions.py:3-47)."""

    def rec(i, labels, next_label):
        if i == n:
            yield tuple(labels)
            return
        for c in range(next_label + 1):
            yield from rec(i + 1, labels + [c], max(next_label, c + 1))

    return list(rec(0, [], 0))


def connected_graphs(n: int):
    """All connected labeled graphs on n vertices (edge subsets)."""
    from itertools import combinations

    pairs = list(combinations(range(n), 2))
    out = []
    for mask in range(1, 1 << len(pairs)):
        edges = [pairs[i] for i in range(len(pairs)) if mask >> i & 1]
        if len(edges) < n - 1:
            continue
        comp = components_uf(n, edges)
        if np.all(comp == 0):
            out.append(edges)
    return out
