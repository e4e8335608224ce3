"""Tests for bounded BFS, the GROUPED_AGG pandas UDF, and the Python
DataSource JSON-lines sink."""

from __future__ import annotations

import json
from pathlib import Path

from pandasqlite_spark.functions.graph import bfs_hops


def test_bfs_distances_on_a_path_graph(spark):
    # 1→2→3→4→5 (symmetrized): from seed 1, dist(k) = k-1, capped at 3.
    edges = [(i, i + 1) for i in range(1, 5)]
    e = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,)], "node bigint")
    out = {r.node: r.dist for r in bfs_hops(e, seeds).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # node 5 is 4 hops: beyond bound


def test_bfs_takes_shortest_of_multiple_routes(spark):
    # triangle 1-2-3 plus tail 3→4: node 3 is reachable in 1 hop (direct)
    # and 2 hops (via 2); BFS must record 1.
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    e = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,)], "node bigint")
    out = {r.node: r.dist for r in bfs_hops(e, seeds).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


def test_jsonl_sink_writes_manifest_and_exact_rows(spark, tmp_path):
    from pandasqlite_spark.sources.generator import register

    register(spark)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id bigint, v string")
    df.repartition(2).write.format("pyjsonl").option("path", out).mode(
        "append"
    ).save()
    manifest = json.loads((Path(out) / "_MANIFEST.json").read_text())
    assert manifest["rows"] == 3
    assert len(manifest["files"]) >= 1
    back = spark.read.schema("id long, v string").json(out + "/part-*.jsonl")
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, "a"), (2, "b"), (3, "c")]
