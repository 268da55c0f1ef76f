"""Command-line entry points (``python -m hedonic_ray ...``).

Mirrors the reference's argparse experiment driver
(``/root/reference/scripts/experiment.py:111-120``: grid parameters →
per-run result records) on the engine's registry, plus the flagship
page pipeline.  Results land as resumable partitioned Parquet
(``sources/sinks.py``) — re-running a finished command is a cheap
no-op, a crashed one resumes at partition granularity.

Owns a Ray session only when run standalone (guarded ``ray.init``);
embedded callers keep their own.
"""

from __future__ import annotations

import argparse
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")


def _cmd_experiment(args) -> int:
    import ray.data as rd

    from hedonic_ray.pipelines.experiment import (
        ExperimentGrid, run_experiment, summarize)
    from hedonic_ray.sources.sinks import write_partitioned

    _ensure_ray()
    grid = ExperimentGrid(
        n_communities=args.communities,
        community_size=args.community_size,
        p_in=args.p_in,
        multiplier=args.multiplier,
        noises=args.noises,
        network_seeds=args.network_seeds,
        partition_seeds=args.partition_seeds,
        methods=args.methods,
    )
    results = run_experiment(grid)
    if args.out:
        manifest = write_partitioned(
            rd.from_arrow(results).map_batches(
                lambda t: t.append_column(
                    "run_key", t.column("network_seed")),
                batch_format="pyarrow"),
            args.out, key="run_key", num_partitions=args.partitions)
        print(f"wrote {results.num_rows} records "
              f"({manifest.num_rows} new partitions) to {args.out}")
    summary = summarize(results).to_pandas().sort_values(["method", "noise"])
    print(summary.to_string(index=False))
    return 0


def _cmd_flagship(args) -> int:
    from hedonic_ray.pipelines.linkgraph import flagship
    from hedonic_ray.sources.sinks import write_partitioned

    _ensure_ray()
    import ray.data as rd

    table = flagship(args.sf_dir)
    print(f"flagship: {table.num_rows} vertices")
    if args.out:
        manifest = write_partitioned(rd.from_arrow(table), args.out,
                                     key="vertex",
                                     num_partitions=args.partitions)
        print(f"wrote {manifest.num_rows} new partitions to {args.out}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hedonic_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("experiment",
                       help="method-registry grid (reference "
                            "scripts/experiment.py semantics)")
    e.add_argument("--communities", type=int, nargs="+", default=[2, 3])
    e.add_argument("--community-size", type=int, default=30)
    e.add_argument("--p-in", type=float, nargs="+", default=[0.3])
    e.add_argument("--multiplier", type=float, nargs="+", default=[0.1])
    e.add_argument("--noises", type=float, nargs="+", default=[0.0, 0.5, 2.0])
    e.add_argument("--network-seeds", type=int, nargs="+", default=[1])
    e.add_argument("--partition-seeds", type=int, nargs="+", default=[1])
    e.add_argument("--methods", nargs="+",
                   default=["hedonic", "onepass", "onepass_hedonic",
                            "mirror", "labelprop", "spectral"])
    e.add_argument("--out", default=None,
                   help="partitioned-Parquet output root (resumable)")
    e.add_argument("--partitions", type=int, default=8)
    e.set_defaults(fn=_cmd_experiment)

    f = sub.add_parser("flagship",
                       help="pages → extract → graph → PageRank/CC/"
                            "hedonic vertex table")
    f.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    f.add_argument("--out", default=None)
    f.add_argument("--partitions", type=int, default=8)
    f.set_defaults(fn=_cmd_flagship)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
