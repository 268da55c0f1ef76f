import gzip
import os

import numpy as np
import pytest


def test_snap_edgelist_reader(tmp_path):
    from hedonic_ray.sources.readers import read_snap_edgelist

    p = tmp_path / "g.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("# comment line\n0 1\n1 2\n\n2 0\n")
    rows = sorted((r["src"], r["dst"])
                  for r in read_snap_edgelist(str(p)).take_all())
    assert rows == [(0, 1), (1, 2), (2, 0)]


def test_snap_reader_to_graph(tmp_path):
    from hedonic_ray.graph.build import build_link_graph
    from hedonic_ray.sources.readers import read_snap_edgelist

    p = tmp_path / "g.txt"
    p.write_text("0 1\n1 2\n2 0\n3 4\n")
    ds = read_snap_edgelist(str(p))
    g = build_link_graph(ds, 5, directed=False, num_parts=2)
    assert g.undirected_edge_count == 4


def test_communities_reader(tmp_path):
    from hedonic_ray.sources.readers import read_communities

    p = tmp_path / "c.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("0 1 2\n3 4\n")
    rows = sorted((r["coalition"], r["vertex"])
                  for r in read_communities(str(p)).take_all())
    assert rows == [(0, 0), (0, 1), (0, 2), (1, 3), (1, 4)]

    p2 = tmp_path / "labels.txt"
    p2.write_text("0 5\n1 5\n2 7\n")
    rows = sorted((r["vertex"], r["coalition"]) for r in
                  read_communities(str(p2), mode="node_labels").take_all())
    assert rows == [(0, 5), (1, 5), (2, 7)]


def test_membership_roundtrip(tmp_path):
    from hedonic_ray.sources.readers import read_membership, write_membership

    mem = np.array([0, 1, 1, 0, 2], dtype=np.int64)
    p = str(tmp_path / "m.parquet")
    write_membership(p, mem)
    np.testing.assert_array_equal(read_membership(p), mem)


def test_gml_roundtrip_and_igraph_dialect(tmp_path):
    import numpy as np
    import pyarrow as pa

    from hedonic_ray.sources.gml import read_gml, write_gml

    # round-trip: write (with membership) → read back bit-equal
    edges = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                      "dst": pa.array([1, 2, 0, 0], pa.int64())})
    mem = np.array([0, 0, 1, 1])
    p = str(tmp_path / "g.gml")
    write_gml(p, edges, n_vertices=4, membership=mem)
    eds, nodes, directed = read_gml(p)
    got = sorted((r["src"], r["dst"]) for r in eds.take_all())
    assert got == [(0, 1), (1, 2), (2, 0), (3, 0)]
    assert not directed
    assert nodes.column("vertex").to_pylist() == [0, 1, 2, 3]
    assert nodes.column("community").to_pylist() == [0, 0, 1, 1]

    # the igraph/networkx block layout with extra attrs and strings
    (tmp_path / "h.gml").write_text(
        'graph\n[\n  directed 1\n'
        '  node\n  [\n    id 0\n    label "a b"\n  ]\n'
        '  node\n  [\n    id 1\n    label "c"\n    weight 2.5\n  ]\n'
        '  edge\n  [\n    source 0\n    target 1\n  ]\n]\n')
    eds, nodes, directed = read_gml(str(tmp_path / "h.gml"))
    assert directed
    assert [r for r in eds.take_all()] == [{"src": 0, "dst": 1}]
    assert nodes.column("label").to_pylist() == ["a b", "c"]

    # hard cases the tokenizer must survive: ']' inside a quoted
    # string, a nested networkx-style sub-block, an edgeless write
    (tmp_path / "k.gml").write_text(
        'graph\n[\n'
        '  node [ id 0 label "x ] y" graphics [ x 1 y 2 ] ]\n'
        '  node [ id 1 ]\n'
        '  edge [ source 0 target 1 ]\n]\n')
    eds, nodes, _ = read_gml(str(tmp_path / "k.gml"))
    assert [r for r in eds.take_all()] == [{"src": 0, "dst": 1}]
    assert nodes.column("label").to_pylist() == ["x ] y", None]
    assert "graphics" not in nodes.column_names  # nested attrs skipped

    import ray.data as rd
    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    p0 = str(tmp_path / "empty.gml")
    write_gml(p0, empty, n_vertices=3)
    eds, nodes, _ = read_gml(p0)
    assert eds.count() == 0 and len(nodes) == 3

    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_gml_text = (tmp_path / "bad.gml")
        read_gml_text.write_text("graph [ node [ id 0 ")
        read_gml(str(read_gml_text))


def test_gml_feeds_link_graph(tmp_path):
    """GML-read edges drive the engine end-to-end (CC on 2 islands)."""
    import pyarrow as pa

    from hedonic_ray.algos.components import connected_components
    from hedonic_ray.graph.build import build_link_graph
    from hedonic_ray.sources.gml import read_gml, write_gml

    edges = pa.table({"src": pa.array([0, 1, 3, 4], pa.int64()),
                      "dst": pa.array([1, 2, 4, 5], pa.int64())})
    p = str(tmp_path / "g.gml")
    write_gml(p, edges, n_vertices=6)
    eds, nodes, _ = read_gml(p)
    g = build_link_graph(eds, len(nodes), directed=False, num_parts=2)
    labels = connected_components(g).state["component"]
    assert len(set(labels[:3])) == 1 and len(set(labels[3:])) == 1
    assert labels[0] != labels[3]


def test_experiment_harness_tiny():
    from hedonic_ray.pipelines.experiment import (
        ExperimentGrid,
        run_experiment,
        summarize,
    )

    grid = ExperimentGrid(n_communities=[2], community_size=20,
                          noises=[0.0, 2.0], methods=["hedonic", "mirror",
                                                      "onepass_hedonic"])
    t = run_experiment(grid)
    assert t.num_rows == 1 * 1 * 1 * 1 * 3 * 2 * 1
    df = t.to_pandas()
    # ground-truth start on an easy SBM: hedonic keeps the planted blocks
    hed0 = df[(df.method == "hedonic") & (df.noise == 0.0)]
    assert (hed0.accuracy == 1.0).all()
    assert (df.converged).all()
    # mirror from noise=0 is the ground truth itself
    mir0 = df[(df.method == "mirror") & (df.noise == 0.0)]
    assert (mir0.accuracy == 1.0).all()
    s = summarize(t).to_pandas()
    assert {"method", "noise", "accuracy_mean", "accuracy_ci95"} <= set(s.columns)


def test_partitioned_write_resumable(tmp_path):
    """write_partitioned commits per-partition atomically and a re-run
    skips finished partitions (prunes before the shuffle)."""
    import os
    import time
    import ray.data as rd
    import pyarrow as pa
    import numpy as np
    from hedonic_ray.sources.sinks import (
        read_partitioned, write_partitioned, _part_dir)

    root = str(tmp_path / "out")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(500), pa.int64()),
        "value": pa.array(np.arange(500) * 2, pa.int64()),
    }))
    m1 = write_partitioned(ds, root, key="doc_id", num_partitions=8)
    assert m1.num_rows == 8 and sum(m1.column("rows").to_pylist()) == 500
    back = read_partitioned(root).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == list(range(500))
    assert back["value"].tolist() == [2 * i for i in range(500)]
    # simulate a crashed partition: drop its marker + data
    victim = _part_dir(root, 3)
    os.remove(os.path.join(victim, "_SUCCESS"))
    os.remove(os.path.join(victim, "data.parquet"))
    mtimes = {p: os.path.getmtime(os.path.join(_part_dir(root, p), "data.parquet"))
              for p in range(8) if p != 3}
    time.sleep(0.05)
    m2 = write_partitioned(ds, root, key="doc_id", num_partitions=8)
    assert m2.column("part").to_pylist() == [3]  # ONLY the victim rewritten
    for p, t in mtimes.items():
        assert os.path.getmtime(os.path.join(_part_dir(root, p),
                                             "data.parquet")) == t
    assert len(read_partitioned(root).to_pandas()) == 500
    # fully-complete output → no-op
    m3 = write_partitioned(ds, root, key="doc_id", num_partitions=8)
    assert m3.num_rows == 0


def test_cli_experiment_and_flagship(tmp_path, capsys):
    """The argparse CLI drives the method registry and the flagship
    pipeline, writing resumable partitioned Parquet (reference surface:
    scripts/experiment.py:111-120)."""
    from hedonic_ray.cli import main
    from hedonic_ray.sources.sinks import read_partitioned

    out = str(tmp_path / "res")
    rc = main(["experiment", "--communities", "2", "--community-size", "12",
               "--noises", "0.0", "--methods", "mirror", "labelprop",
               "--out", out, "--partitions", "2"])
    assert rc == 0
    res = read_partitioned(out).to_pandas()
    assert set(res["method"]) == {"mirror", "labelprop"}
    assert "accuracy" in res.columns
    captured = capsys.readouterr().out
    assert "accuracy_mean" in captured or "labelprop" in captured

    out2 = str(tmp_path / "flag")
    rc = main(["flagship", "--sf-dir", "/root/testdata/sf0.001",
               "--out", out2, "--partitions", "4"])
    assert rc == 0
    flag = read_partitioned(out2).to_pandas()
    assert len(flag) == 500 and "coalition" in flag.columns


def test_jsonl_roundtrip_bit_exact(tmp_path):
    """parquet -> JSONL -> read back preserves every row and column
    value (ids, text bytes, metadata) — the fidelity the text_jsonl_io
    gate checksums summarize."""
    import pyarrow.parquet as pq

    import ray

    from hedonic_ray.sources.jsonl import read_jsonl, write_jsonl

    src = "/root/testdata/sf0.001/documents.parquet"
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    write_jsonl(ray.data.read_parquet(src, columns=cols),
                str(tmp_path / "docs"))
    import pandas as pd

    back = (read_jsonl(str(tmp_path / "docs"), columns=cols)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    orig = (pq.read_table(src, columns=cols)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back[cols], orig[cols])
