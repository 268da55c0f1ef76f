"""Generic gather–scatter superstep driver.

One superstep =

1. **scatter** — ``graph.blocks.map_batches(...)`` over the materialized
   Arrow CSR blocks; the kernel reads the current vertex state from a
   broadcast ``ray.put`` ref (zero-copy numpy out of the object store)
   and emits *partially aggregated* per-destination messages (the
   combiner: within a partition, messages to the same key are already
   reduced before anything is shuffled).
2. **gather** — combine partials across partitions.  Two strategies:

   * ``"shuffle"`` — ``groupby(key).aggregate(...)`` (Ray Data hash
     shuffle with per-block partial aggregation; the scale path — works
     for any V).
   * ``"dense"`` — partials are dense numpy vectors per partition,
     summed/min-reduced as they stream off ``iter_batches`` (valid while
     a V-sized vector fits in driver memory; this is the same partial
     aggregation pushed to its limit, and is far faster at sandbox V).

   ``"auto"`` picks dense for V ≤ DENSE_MAX_VERTICES else shuffle.
   Both are tested to produce identical results.
3. **apply** — per-vertex state update from the gathered values; counts
   ``active_vertices`` for the convergence check (the distributed analog
   of the reference's ``in_equilibrium`` scan,
   ``/root/reference/hedonic/__init__.py:89-94``).

State scales with V (not with the page payload), so it is broadcast per
superstep and checkpointed per partition; at 10^12-vertex extreme the
apply stage shards into the same ``part`` ranges as the CSR blocks
(state slice co-located with adjacency in an actor pool) — the
partition layout here is already keyed for that.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from hedonic_ray.context import configure_context
from hedonic_ray.engine.checkpoint import load_latest, save_checkpoint

DENSE_MAX_VERTICES = 2_000_000


@dataclass
class BlockView:
    """Zero-copy numpy view of one CSR block row."""

    part: int
    lo: int
    hi: int
    indptr: np.ndarray
    indices: np.ndarray

    @property
    def n_edges(self) -> int:
        return int(self.indptr[-1])

    def src_per_edge(self) -> np.ndarray:
        """Global src id of every edge in this block."""
        return self.lo + np.repeat(
            np.arange(self.hi - self.lo), np.diff(self.indptr)
        )


def iter_block_views(batch: pa.Table):
    for r in range(batch.num_rows):
        yield BlockView(
            part=batch.column("part")[r].as_py(),
            lo=batch.column("lo")[r].as_py(),
            hi=batch.column("hi")[r].as_py(),
            indptr=np.asarray(batch.column("indptr")[r].values),
            indices=np.asarray(batch.column("indices")[r].values),
        )


class _Scatter:
    """Stateless map_batches UDF: runs the algo's scatter kernel per CSR
    block.  Pickled per superstep with the fresh state ref; the state
    arrays themselves move through the object store, not the closure."""

    def __init__(self, algo, state_ref, mode: str):
        self.algo = algo
        self.state_ref = state_ref
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        state = ray.get(self.state_ref)
        outs = [self.algo.scatter(bv, state, self.mode)
                for bv in iter_block_views(batch)]
        outs = [t for t in outs if t is not None and t.num_rows > 0]
        if not outs:
            return self.algo.empty_messages(self.mode)
        return pa.concat_tables(outs)


# ---------------------------------------------------------------- gathers


def dense_vec_table(part: int, vec: np.ndarray) -> pa.Table:
    """Scatter output for dense mode: one row with the partition's full
    partial vector."""
    return pa.table({
        "part": pa.array([part], pa.int64()),
        "vec": pa.ListArray.from_arrays(
            pa.array([0, len(vec)], pa.int32()),
            pa.array(vec, pa.from_numpy_dtype(vec.dtype)),
        ),
    })


def gather_dense(msgs_ds, n: int, op: str = "sum", init: float = 0.0) -> np.ndarray:
    """Stream partition partials off the pipeline, reduce on the driver."""
    acc = np.full(n, init, dtype=np.float64)
    for batch in msgs_ds.iter_batches(batch_size=8, batch_format="pyarrow"):
        for r in range(batch.num_rows):
            vec = np.asarray(batch.column("vec")[r].values)
            if op == "sum":
                acc += vec
            elif op == "min":
                np.minimum(acc, vec, out=acc)
            else:
                raise ValueError(op)
    return acc


def gather_kv_shuffle(msgs_ds, key_cols: list[str], value_col: str, agg: str):
    """groupby-aggregate shuffle gather → driver numpy dict (the result
    is ≤ #distinct keys rows, already globally combined)."""
    from ray.data.aggregate import Min, Sum

    agg_fn = {"sum": Sum, "min": Min}[agg](value_col, alias_name=value_col)
    out = msgs_ds.groupby(key_cols).aggregate(agg_fn)
    cols: dict[str, list] = {c: [] for c in [*key_cols, value_col]}
    for batch in out.iter_batches(batch_size=262144, batch_format="pyarrow"):
        for c in cols:
            cols[c].append(batch.column(c).to_numpy(zero_copy_only=False))
    return {c: (np.concatenate(v) if v else np.empty(0, np.int64))
            for c, v in cols.items()}


def gather_kv_driver(msgs_ds, key_cols: list[str], value_col: str, agg: str):
    """Driver-side combine of per-partition partials (dense-mode analog
    for keyed messages): concat the already-partially-aggregated rows
    and reduce with one vectorized groupby."""
    cols: dict[str, list] = {c: [] for c in [*key_cols, value_col]}
    for batch in msgs_ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
        for c in cols:
            cols[c].append(batch.column(c).to_numpy(zero_copy_only=False))
    arrs = {c: (np.concatenate(v) if v else np.empty(0, np.int64))
            for c, v in cols.items()}
    if arrs[value_col].size == 0:
        return arrs
    order = np.lexsort(tuple(arrs[c] for c in reversed(key_cols)))
    keys = np.stack([arrs[c][order] for c in key_cols], axis=1)
    vals = arrs[value_col][order]
    boundary = np.ones(len(vals), dtype=bool)
    boundary[1:] = np.any(keys[1:] != keys[:-1], axis=1)
    starts = np.flatnonzero(boundary)
    if agg == "sum":
        reduced = np.add.reduceat(vals, starts)
    elif agg == "min":
        reduced = np.minimum.reduceat(vals, starts)
    else:
        raise ValueError(agg)
    out = {c: keys[starts, i] for i, c in enumerate(key_cols)}
    out[value_col] = reduced
    return out


# ---------------------------------------------------------------- the loop


@dataclass
class RunResult:
    state: dict
    metrics: list = field(default_factory=list)
    iterations: int = 0
    converged: bool = False

    @property
    def total_seconds(self) -> float:
        return sum(m["seconds"] for m in self.metrics)

    @property
    def edges_per_second(self) -> float:
        secs = self.total_seconds
        total = sum(m["edges_processed"] for m in self.metrics)
        return total / secs if secs > 0 else 0.0


def resolve_gather(mode: str, n: int) -> str:
    if mode == "auto":
        from hedonic_ray.context import force_scale

        if force_scale():
            return "shuffle"
        return "dense" if n <= DENSE_MAX_VERTICES else "shuffle"
    return mode


LOCAL_MAX_ARCS = 200_000  # below this, a Ray round trip per superstep
# costs more than the whole scatter+gather — run the loop on the driver


class _LocalMsgs:
    """iter_batches shim over in-memory scatter outputs, so the algos'
    dense-mode gather kernels run unchanged on the local path."""

    def __init__(self, tables):
        self._tables = tables

    def iter_batches(self, *, batch_size=None, batch_format="pyarrow"):
        for t in self._tables:
            if t.num_rows:
                yield t


def _local_superstep(algo, graph, tables, state, it):
    """One superstep entirely on the driver: same scatter/gather/apply
    kernels as dense mode (block order identical to the Dataset scan),
    zero Ray round trips — the small-graph escape hatch for iterated
    algorithms whose per-superstep work is microseconds."""
    bcast = algo.broadcast_state(state)
    outs = []
    for t in tables:
        for bv in iter_block_views(t):
            o = algo.scatter(bv, bcast, "dense")
            if o is not None and o.num_rows > 0:
                outs.append(o)
    msgs = _LocalMsgs(outs or [algo.empty_messages("dense")])
    gathered = algo.gather(msgs, "dense", graph)
    return algo.apply(state, gathered, graph, it)


def run_supersteps(graph, algo, *, max_iters: int = 100, gather: str = "auto",
                   checkpoint_dir: str | None = None, run_id: str | None = None,
                   checkpoint_every: int = 5, resume: bool = False) -> RunResult:
    """Drive ``algo`` to convergence over ``graph``.

    The algo contract: ``init_state(g)``, ``broadcast_state(state)``
    (what scatter needs), ``scatter(block, state, mode)``,
    ``gather(msgs_ds, mode, g)``, ``apply(state, gathered, g, it)`` →
    ``(state, active, extra_metrics)``.
    """
    import ray

    from hedonic_ray.context import force_scale

    configure_context()
    if gather == "auto" and hasattr(algo, "prefers_tasks") and \
            hasattr(algo, "tasks_step") and algo.prefers_tasks(graph):
        mode = "tasks"
    elif gather == "tasks":
        mode = "tasks"
    elif gather == "local" or (gather == "auto" and not force_scale()
                               and graph.m <= LOCAL_MAX_ARCS):
        mode = "local"
    else:
        mode = resolve_gather(gather, graph.n)
    local_tables = None
    if mode == "local":
        local_tables = getattr(graph, "_local_blocks", None)
        if local_tables is None:
            local_tables = ray.get(graph.arrow_refs())
            graph._local_blocks = local_tables
    start_it = 0
    state = None
    if resume and checkpoint_dir and run_id:
        # graph is passed so the checkpoint's input fingerprint is
        # validated on the production resume path — resuming against a
        # different graph of the same n must fail loudly, not silently
        loaded = load_latest(checkpoint_dir, run_id, graph=graph)
        if loaded is not None:
            start_it, state = loaded.superstep + 1, loaded.state
            if hasattr(algo, "on_resume"):
                algo.on_resume(state)
    if state is None:
        state = algo.init_state(graph)

    result = RunResult(state=state)
    for it in range(start_it, max_iters):
        t0 = time.perf_counter()
        if mode == "tasks":
            state, active, extra = algo.tasks_step(graph, state, it)
        elif mode == "local":
            state, active, extra = _local_superstep(algo, graph,
                                                    local_tables, state, it)
        else:
            bcast = algo.broadcast_state(state)
            state_ref = ray.put(bcast)
            msgs = graph.blocks.map_batches(
                _Scatter(algo, state_ref, mode), batch_format="pyarrow",
                batch_size=4,
            )
            gathered = algo.gather(msgs, mode, graph)
            state, active, extra = algo.apply(state, gathered, graph, it)
        dt = time.perf_counter() - t0
        metric = {"iteration": it, "active_vertices": int(active),
                  "edges_processed": graph.m, "seconds": dt, **extra}
        result.metrics.append(metric)
        result.state = state
        result.iterations = it + 1
        if checkpoint_dir and run_id and (
            active == 0 or (it + 1) % checkpoint_every == 0
        ):
            save_checkpoint(checkpoint_dir, run_id, it, state, graph,
                            algo_name=type(algo).__name__, metrics=result.metrics)
        if active == 0:
            result.converged = True
            break
    return result
