"""Per-superstep checkpointing with lineage manifests.

Replaces the reference's ``.completed`` marker files
(``/root/reference/scripts/exp.py:120-122``) with resumable state:
every checkpoint writes the full vertex state as one Parquet file per
graph partition (the same ``part`` ranges as the CSR blocks, so a
sharded resume can read only its slice), then a ``manifest.json``
written LAST and atomically (tmp + rename) — a superstep directory
without a manifest is incomplete and ignored by resume.

Manifest lineage: ``run_id``, ``superstep``, ``algo``, parent
superstep, an input fingerprint ``(n, m, num_parts, directed)`` so a
resume against a different graph fails loudly, plus the per-superstep
metrics so far (iteration, active_vertices, edges_processed, seconds).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _fingerprint(graph) -> dict:
    return {"n": graph.n, "m": graph.m, "num_parts": graph.num_parts,
            "directed": graph.directed}


def _step_dir(root: str, run_id: str, superstep: int) -> str:
    return os.path.join(root, run_id, f"step_{superstep:06d}")


def save_checkpoint(root: str, run_id: str, superstep: int, state: dict,
                    graph, *, algo_name: str, metrics: list) -> str:
    d = _step_dir(root, run_id, superstep)
    os.makedirs(d, exist_ok=True)
    array_keys, scalar_meta = [], {}
    for k, v in state.items():
        if isinstance(v, np.ndarray) and v.shape == (graph.n,):
            array_keys.append(k)
        else:
            scalar_meta[k] = v if not isinstance(v, np.ndarray) else v.tolist()
    span = graph.span
    for p in range(graph.num_parts):
        lo, hi = p * span, min(graph.n, (p + 1) * span)
        if lo >= hi:
            continue
        cols = {"vertex": np.arange(lo, hi, dtype=np.int64)}
        for k in array_keys:
            cols[k] = state[k][lo:hi]
        pq.write_table(pa.table(cols), os.path.join(d, f"part-{p:05d}.parquet"))
    manifest = {
        "run_id": run_id,
        "superstep": superstep,
        "parent_superstep": superstep - 1 if superstep > 0 else None,
        "algo": algo_name,
        "input_fingerprint": _fingerprint(graph),
        "array_keys": array_keys,
        "scalars": scalar_meta,
        "num_parts": graph.num_parts,
        "metrics": metrics,
    }
    tmp = os.path.join(d, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(d, "manifest.json"))
    return d


@dataclass
class LoadedCheckpoint:
    superstep: int
    state: dict
    manifest: dict


def load_latest(root: str, run_id: str, graph=None) -> LoadedCheckpoint | None:
    run_dir = os.path.join(root, run_id)
    if not os.path.isdir(run_dir):
        return None
    steps = sorted(
        d for d in os.listdir(run_dir)
        if d.startswith("step_")
        and os.path.exists(os.path.join(run_dir, d, "manifest.json"))
    )
    if not steps:
        return None
    d = os.path.join(run_dir, steps[-1])
    with open(os.path.join(d, "manifest.json")) as f:
        manifest = json.load(f)
    if graph is not None and manifest["input_fingerprint"] != _fingerprint(graph):
        raise ValueError(
            f"checkpoint {d} was written for a different graph: "
            f"{manifest['input_fingerprint']} vs {_fingerprint(graph)}"
        )
    parts = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    tables = [pq.read_table(os.path.join(d, f)) for f in parts]
    full = pa.concat_tables(tables)
    order = np.argsort(full.column("vertex").to_numpy())
    state: dict = {}
    for k in manifest["array_keys"]:
        state[k] = full.column(k).to_numpy()[order].copy()
    for k, v in manifest["scalars"].items():
        state[k] = v
    return LoadedCheckpoint(superstep=manifest["superstep"], state=state,
                            manifest=manifest)
