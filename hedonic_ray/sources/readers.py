"""External graph sources.

* :func:`read_snap_edgelist` — SNAP-style ``.txt`` / ``.txt.gz`` edge
  lists (``src<ws>dst`` per line, ``#`` comments) — the reference's
  DBLP reader (``/root/reference/scripts/utils.py:88-103``) as a
  ``read_text`` → vectorized parse pipeline.
* :func:`read_communities` — ground-truth community files
  (``scripts/utils.py:105-122``): one community's node ids per line, or
  ``node community`` pairs.
* :func:`write_membership` / :func:`read_membership` — vertex-state
  Parquet replacing the reference's single-row membership CSVs
  (``scripts/save_exp_data.py:73-89``) and pickled graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hedonic_ray.context import configure_context


def _parse_edge_lines(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    lines = batch.column("text")
    keep = pc.invert(pc.starts_with(pc.utf8_trim_whitespace(lines), "#"))
    lines = lines.filter(keep)
    src, dst = [], []
    for ln in lines.to_pylist():
        parts = ln.split()
        if len(parts) == 2:
            src.append(int(parts[0]))
            dst.append(int(parts[1]))
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64())})


def read_snap_edgelist(path: str):
    """SNAP edge list → edge Dataset (src, dst).  gzip handled by
    Arrow's stream decompression."""
    import ray.data as rd

    configure_context()
    kwargs = {}
    if path.endswith(".gz"):
        kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
    ds = rd.read_text(path, **kwargs)
    return ds.map_batches(_parse_edge_lines, batch_format="pyarrow")


def read_communities(path: str, mode: str = "list_of_communities"):
    """Community file → Dataset (coalition, vertex).

    ``list_of_communities``: line i holds community i's node ids.
    ``node_labels``: each line is ``node community``.
    """
    import ray.data as rd

    configure_context()
    kwargs = {}
    if path.endswith(".gz"):
        kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
    ds = rd.read_text(path, **kwargs)
    # line numbers matter for list mode → driver-side enumeration of the
    # (small) community file
    rows_c, rows_v = [], []
    idx = 0
    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for ln in batch.column("text").to_pylist():
            parts = [int(x) for x in ln.split()]
            if not parts:
                continue
            if mode == "list_of_communities":
                rows_c.extend([idx] * len(parts))
                rows_v.extend(parts)
                idx += 1
            elif mode == "node_labels":
                rows_v.append(parts[0])
                rows_c.append(parts[1])
            else:
                raise ValueError(mode)
    return rd.from_arrow(pa.table({"coalition": pa.array(rows_c, pa.int64()),
                                   "vertex": pa.array(rows_v, pa.int64())}))


def write_membership(path: str, membership: np.ndarray, **extra_cols) -> None:
    """Vertex state → Parquet (vertex, coalition, *extra)."""
    import pyarrow.parquet as pq

    n = len(membership)
    cols = {"vertex": np.arange(n, dtype=np.int64),
            "coalition": np.asarray(membership, dtype=np.int64)}
    for k, v in extra_cols.items():
        cols[k] = np.asarray(v)
    pq.write_table(pa.table(cols), path)


def read_membership(path: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vertex", "coalition"])
    order = np.argsort(t.column("vertex").to_numpy())
    return t.column("coalition").to_numpy()[order].astype(np.int64)
