"""Resumable partitioned Parquet sink.

The engine never writes one giant file: output is partitioned by a key
hash (or an explicit partition column) into one DIRECTORY per
partition, each completed atomically (tmp file → rename, then a
``_SUCCESS`` marker written last).  A re-run of the same write SKIPS
partitions whose marker exists — the skip happens BEFORE the shuffle,
so a resumed job neither moves nor rewrites finished data.

Replaces the reference's whole-file JSON/CSV result dumps +
``.completed`` markers (``/root/reference/scripts/exp.py:108-122``)
with a partition-granular, atomically-committed layout that a
256-node run can restart cheaply.

``_write_part`` runs inside Ray tasks, so on a multi-node cluster
``root`` MUST be shared storage (NFS / FUSE-mounted object store) —
partitions written to worker-local disks would be invisible to the
driver's resume scan and to ``read_partitioned``.  The constraint is
asserted best-effort in :func:`write_partitioned` (single-node
sessions are always safe; multi-node sessions require the caller to
pass ``shared_fs=True`` to vouch for the mount).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from hedonic_ray.functions.hashing import hash_ints, hash_strings


def _part_dir(root: str, part: int) -> str:
    return os.path.join(root, f"part={part:05d}")


def _finished_parts(root: str) -> set[int]:
    if not os.path.isdir(root):
        return set()
    out = set()
    for d in os.listdir(root):
        if d.startswith("part=") and os.path.exists(
                os.path.join(root, d, "_SUCCESS")):
            out.add(int(d.split("=")[1]))
    return out


def _assign_part(batch: pa.Table, key: str, num_partitions: int,
                 skip: frozenset) -> pa.Table:
    col = batch.column(key)
    if pa.types.is_integer(col.type):
        h = hash_ints(col.to_numpy().astype(np.int64))
    else:
        h = hash_strings(col.to_pylist())
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    batch = batch.append_column("__part", pa.array(part))
    if skip:
        keep = ~np.isin(part, np.fromiter(skip, dtype=np.int64))
        batch = batch.filter(pa.array(keep))
    return batch


def _write_part(group: pa.Table, root: str) -> pa.Table:
    part = int(group.column("__part")[0].as_py())
    d = _part_dir(root, part)
    os.makedirs(d, exist_ok=True)
    data = group.drop_columns(["__part"])
    tmp = os.path.join(d, ".data.parquet.tmp")
    pq.write_table(data, tmp)
    os.replace(tmp, os.path.join(d, "data.parquet"))
    with open(os.path.join(d, "_SUCCESS"), "w"):
        pass
    return pa.table({"part": pa.array([part], pa.int64()),
                     "rows": pa.array([data.num_rows], pa.int64())})


def write_partitioned(ds, root: str, *, key: str,
                      num_partitions: int = 16,
                      shared_fs: bool = False) -> pa.Table:
    """Write ``ds`` under ``root`` as ``part=NNNNN/data.parquet``
    directories keyed by ``hash(key) % num_partitions``.

    Partitions already carrying a ``_SUCCESS`` marker are pruned from
    the pipeline before the one co-locating shuffle, so a resumed run
    only processes unfinished key ranges.  Returns the manifest of
    partitions written THIS run (part, rows); an empty table means the
    output was already complete.

    Partition files are written by Ray tasks: on a MULTI-node cluster
    ``root`` must be a shared filesystem, and the caller must pass
    ``shared_fs=True`` to vouch for it — otherwise this raises rather
    than silently producing a resume scan that can't see worker-local
    partitions.
    """
    import ray

    if not shared_fs and len(ray.nodes() or []) > 1:
        raise RuntimeError(
            "write_partitioned on a multi-node cluster requires root "
            f"({root!r}) to be shared storage; pass shared_fs=True "
            "after mounting it on every node")
    os.makedirs(root, exist_ok=True)
    skip = frozenset(_finished_parts(root))
    if len(skip) >= num_partitions:
        return pa.table({"part": pa.array([], pa.int64()),
                         "rows": pa.array([], pa.int64())})
    assigned = ds.map_batches(
        lambda b: _assign_part(b, key, num_partitions, skip),
        batch_format="pyarrow")
    manifest = assigned.groupby("__part").map_groups(
        lambda g: _write_part(g, root), batch_format="pyarrow")
    rows = manifest.take_all()  # ≤ num_partitions rows
    # partitions that received ZERO rows never reach map_groups — mark
    # them complete too (no data file), otherwise every re-run of an
    # already-complete output re-pays the full shuffle just to learn
    # those key ranges are inherently empty
    written = {r["part"] for r in rows}
    for p in range(num_partitions):
        if p not in skip and p not in written:
            d = _part_dir(root, p)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "_SUCCESS"), "w"):
                pass
    return pa.table({
        "part": pa.array([r["part"] for r in rows], pa.int64()),
        "rows": pa.array([r["rows"] for r in rows], pa.int64()),
    })


def read_partitioned(root: str):
    """Read back a :func:`write_partitioned` output as a Dataset
    (only partitions with a ``_SUCCESS`` marker — a crashed writer's
    partial data is invisible).  A validly completed output whose
    partitions all received zero rows reads back as an EMPTY Dataset,
    not an error."""
    import ray.data as rd

    finished = sorted(_finished_parts(root))
    if not finished:
        raise FileNotFoundError(f"no completed partitions under {root}")
    paths = [os.path.join(_part_dir(root, p), "data.parquet")
             for p in finished]
    paths = [p for p in paths if os.path.exists(p)]  # empty partitions
    if not paths:  # complete, but every partition was empty
        return rd.from_arrow(pa.table({}))
    # deliberately unpruned: this reads back OUR OWN sink's complete
    # output (schema unknown here, all columns wanted by contract) —
    # every corpus-table read_parquet in the repo passes columns=
    return rd.read_parquet(paths)
