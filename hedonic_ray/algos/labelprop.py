"""Label propagation (plurality) supersteps.

One superstep IS the reference's ``community_onepass_improvement``
(``/root/reference/hedonic/__init__.py:266-280``): every vertex adopts
the plurality label among its neighbors, computed synchronously against
the pre-step labels.  The reference's tie-break is Python-set iteration
order (nondeterministic); this engine fixes the deterministic rule
**lowest label wins ties** — documented divergence, covered by tests
that enumerate both semantics' agreement on tie-free inputs.

Iterated LP can 2-cycle on bipartite-ish structures (synchronous
updates); the step detects a period-2 oscillation (state equals the
state two supersteps ago) and stops deterministically.
"""

from __future__ import annotations

import numpy as np

from hedonic_ray.algos._labels import (
    empty_label_messages,
    gather_label_counts,
    scatter_label_counts,
)
from hedonic_ray.engine.superstep import run_supersteps, RunResult


def argmax_per_vertex(dst: np.ndarray, lab: np.ndarray, score: np.ndarray,
                      tie_lab: np.ndarray | None = None):
    """Per-dst row maximizing ``score``; ties → lowest ``lab``.
    Returns (unique_dst, best_lab, best_score)."""
    if len(dst) == 0:
        return dst, lab, score
    order = np.lexsort((lab, -score, dst))
    d, l, s = dst[order], lab[order], score[order]
    first = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
    return d[first], l[first], s[first]


class LabelPropStep:
    def __init__(self, init_labels: np.ndarray | None = None,
                 use_shards: bool = True):
        self.init_labels = init_labels
        # iterated runs use the stateful sharded-apply actors
        # (engine/shards.py — one round/superstep, O(movers) traffic);
        # one-pass runs use the stateless task exchange
        self.use_shards = use_shards
        self._pool = None
        self._applied: tuple | None = None

    def init_state(self, g) -> dict:
        if self.init_labels is not None:
            lab = np.asarray(self.init_labels, dtype=np.int64).copy()
            if lab.shape != (g.n,) or lab.min() < 0 or lab.max() >= g.n:
                raise ValueError("init labels must be (n,) ints in [0, n)")
        else:
            lab = np.arange(g.n, dtype=np.int64)
        return {"label": lab, "prev_label": lab.copy()}

    def broadcast_state(self, state: dict):
        return state["label"]

    def empty_messages(self, mode: str):
        return empty_label_messages()

    def scatter(self, block, labels: np.ndarray, mode: str):
        return scatter_label_counts(block, labels)

    def gather(self, msgs_ds, mode: str, g) -> dict:
        return gather_label_counts(msgs_ds, mode)

    def apply(self, state: dict, arrs: dict, g, it: int):
        label = state["label"]
        new = label.copy()
        d, l, _ = argmax_per_vertex(arrs["dst"].astype(np.int64),
                                    arrs["lab"].astype(np.int64),
                                    arrs["cnt"].astype(np.float64))
        new[d] = l  # isolated vertices receive no rows → keep label
        active = int((new != label).sum())
        if active and np.array_equal(new, state["prev_label"]):
            active = 0  # period-2 oscillation → deterministic stop
        return {"label": new, "prev_label": label}, active, {}

    def prefers_tasks(self, g) -> bool:
        return g.m >= 400_000

    SHARDS_MIN_VERTICES = 200_000  # below this, LP converges in a few
    # supersteps and the pool's one-time build outweighs its per-step win

    def tasks_step(self, g, state: dict, it: int):
        label = state["label"]
        if self.use_shards and g.n >= self.SHARDS_MIN_VERTICES:
            from hedonic_ray.engine.shards import ShardPool

            if self._pool is None:
                self._pool = ShardPool(g, label, 0.0, "lp")
                self._applied = (np.empty(0, np.int64),) * 3
            d, l, _gain, _f, _a = self._pool.step(*self._applied, False)
        else:
            from hedonic_ray.engine.exchange import label_exchange_step

            d, l, _gain, _f, _a = label_exchange_step(g, label, mode="lp")
        d = d.astype(np.int64)
        l = l.astype(np.int64)
        new = label.copy()
        new[d] = l
        self._applied = (d, label[d].copy(), l)
        active = int((new != label).sum())
        if active and np.array_equal(new, state["prev_label"]):
            active = 0
        return {"label": new, "prev_label": label}, active, {}


def label_propagation(g, *, init_labels=None, max_iters: int = 100,
                      gather: str = "auto", checkpoint_dir=None, run_id=None,
                      checkpoint_every: int = 5, resume: bool = False) -> RunResult:
    """Iterated plurality LP; ``result.state['label']`` is the final
    labeling.  Default init: every vertex its own label."""
    if g.directed:
        raise ValueError("label_propagation needs an undirected LinkGraph")
    return run_supersteps(g, LabelPropStep(init_labels), max_iters=max_iters,
                          gather=gather, checkpoint_dir=checkpoint_dir,
                          run_id=run_id, checkpoint_every=checkpoint_every,
                          resume=resume)


def onepass_improvement(g, init_labels, *, gather: str = "auto") -> np.ndarray:
    """Exactly ONE synchronous plurality pass — the distributed form of
    ``community_onepass_improvement`` (hedonic/__init__.py:266-280)."""
    res = run_supersteps(g, LabelPropStep(init_labels, use_shards=False),
                         max_iters=1, gather=gather)
    return res.state["label"]
