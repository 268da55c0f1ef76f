"""Shared scatter/gather for label-count supersteps.

Messages are the distributed form of the reference's ``nodes_info``
gather (``/root/reference/hedonic/__init__.py:294-352``): for every
vertex, how many neighbors it has in each community/label.  Scatter
emits per-partition PARTIAL counts (one ``np.unique`` over
``dst * n + label`` keys — the combiner), gather merges them either via
``groupby(["dst","lab"]).sum()`` (shuffle path) or a driver-side
vectorized reduce of the partials (dense path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.engine.superstep import gather_kv_driver, gather_kv_shuffle


def empty_label_messages() -> pa.Table:
    return pa.table({"dst": pa.array([], pa.int64()),
                     "lab": pa.array([], pa.int64()),
                     "cnt": pa.array([], pa.int64())})


def scatter_label_counts(block, labels: np.ndarray) -> pa.Table:
    """(dst, lab, cnt) partials for one CSR block: counts of each source
    label seen by each destination, pre-aggregated within the block."""
    n = np.int64(len(labels))
    lab_per_edge = labels[block.src_per_edge()]
    key = block.indices.astype(np.int64) * n + lab_per_edge
    uk, cnt = np.unique(key, return_counts=True)
    return pa.table({"dst": pa.array(uk // n, pa.int64()),
                     "lab": pa.array(uk % n, pa.int64()),
                     "cnt": pa.array(cnt.astype(np.int64), pa.int64())})


def gather_label_counts(msgs_ds, mode: str) -> dict:
    """→ dict of numpy arrays {dst, lab, cnt}, globally combined."""
    if mode == "dense":
        return gather_kv_driver(msgs_ds, ["dst", "lab"], "cnt", "sum")
    return gather_kv_shuffle(msgs_ds, ["dst", "lab"], "cnt", "sum")
