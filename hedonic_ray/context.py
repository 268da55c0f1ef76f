"""Execution-context defaults for the engine.

Quiet progress bars and order-free streaming execution by default; knobs
live on Ray Data's ``DataContext``.  Nothing here initialises Ray.
"""

from __future__ import annotations

import os


def configure_context(
    *,
    target_max_block_size: int | None = None,
    preserve_order: bool = False,
    verbose: bool = False,
) -> None:
    """Apply engine-wide ``DataContext`` defaults.

    Called lazily by pipelines; safe to call repeatedly.  Ordering is
    left OFF (streaming executor reorders blocks freely) — every
    operator in this engine is defined order-insensitively and tests
    sort before comparing.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = preserve_order
    ctx.enable_progress_bars = verbose
    try:  # not present in every Ray release
        ctx.execution_options.verbose_progress = verbose
    except Exception:
        pass


def drop_empty_blocks(ds, schema=None):
    """Materialize ``ds`` and drop its zero-row blocks.

    Ray Data operators emit schema-less EMPTY blocks (one per idle
    task), and the hash-shuffle ``Dataset.join`` rejects them ("No
    match ... for key field reference" out of acero).  Filtering uses
    block METADATA from the materialized plan — no block data moves.
    ``schema`` (pyarrow) is used for a typed empty result when every
    block is empty.
    """
    import ray.data as rd

    m = ds.materialize()
    refs = [ref for bundle in m.iter_internal_ref_bundles()
            for ref, md in bundle.blocks if (md.num_rows or 0) > 0]
    if not refs:
        import pyarrow as pa

        return rd.from_arrow(schema.empty_table() if schema is not None
                             else pa.table({}))
    return rd.from_arrow_refs(refs)


def force_scale() -> bool:
    """``HEDONIC_RAY_FORCE_SCALE=1`` flips every ``"auto"`` branch to
    its production-scale path (distributed joins, bucketed probes,
    shuffle gathers, IVF) regardless of input size — so the 100-TB
    branches run through the same oracle-checked queries and tests the
    small-data defaults do, instead of being only equal-tested."""
    return os.environ.get("HEDONIC_RAY_FORCE_SCALE", "") not in ("", "0")


def session_cpus() -> int:
    """CPUs of the live Ray session (falls back to env / OS count)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or 1
    except Exception:
        pass
    return int(os.environ.get("RAY_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)


def actor_pool(frac: float = 0.25) -> tuple[int, int]:
    """Autoscaling actor-pool size ``(1, k)`` for a map_batches stage:
    scales down to 1 on tiny inputs (cheap startup) and up to a
    fraction of the session so several concurrent stages never starve
    each other (an actor pool that reserves every CPU serializes the
    pipeline)."""
    return (1, max(1, int(session_cpus() * frac)))


def default_num_partitions(n_edges: int | None = None,
                           n_vertices: int | None = None) -> int:
    """Number of graph partitions (CSR blocks).

    Sized so each block holds a bounded slice of the edge list: at
    sandbox scale this tracks the CPU count, capped so tiny graphs
    don't pay per-partition fixed costs (a 5k-vertex graph on 32 CPUs
    wants a handful of partitions, not 32); at cluster scale callers
    pass an explicit value so each Arrow CSR block stays ≲256 MiB
    (``n_edges * 16B / parts``).
    """
    parts = max(4, min(64, session_cpus()))
    if n_vertices is not None:
        parts = max(1, min(parts, -(-n_vertices // 4000)))
    if n_edges is not None:
        # keep blocks under ~16M edges (~256 MiB of uint64 pairs)
        parts = max(parts, -(-n_edges // 16_000_000))
    return parts


def session_scoped(cache: dict) -> dict:
    """Clear a module-level cache of Ray-object-holding values when
    the Ray session changed (ray.shutdown()/re-init in one process
    would otherwise leave dead ObjectRefs / MaterializedDatasets in
    the cache).  The session marker is the driver node id — stable
    within a session, fresh after re-init."""
    import ray

    mark = (ray.get_runtime_context().get_node_id()
            if ray.is_initialized() else None)
    if cache.get("__session__") != mark:
        cache.clear()
        cache["__session__"] = mark
    return cache
