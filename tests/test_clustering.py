"""Centroid operators: value correctness on a hand-computable fixture
plus the plan shapes the 100 TB design depends on (broadcast centroid
join, no cartesian in the incremental-dedup anti join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandasqlite_spark.functions.clustering import (
    assign_nearest_centroid,
    label_centroid_sums,
    q_embedding_assign,
)
from pandasqlite_spark.functions.dedup import q_dedup_incremental
from pandasqlite_spark.operators.common import load


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )


def test_centroid_sums_and_assignment_on_fixture(spark):
    # label 0 centroid = (0.5, 0.5); label 1 centroid = (3, 4)
    d = _emb(
        spark,
        [
            (1, [0.0, 0.0], 0),
            (2, [1.0, 1.0], 0),
            (3, [3.0, 4.0], 1),
            (4, [2.5, 0.0], 0),  # nearer (0.5, 0.5) than (3, 4)
        ],
    )
    sums = label_centroid_sums(d)
    got = {(r.label, r.dim): (float(r.s), r.n) for r in sums.collect()}
    assert got[(0, 0)] == (3.5, 3) and got[(0, 1)] == (1.0, 3)
    assert got[(1, 0)] == (3.0, 1) and got[(1, 1)] == (4.0, 1)

    assigned = {
        r.vec_id: r.nearest_label
        for r in assign_nearest_centroid(d, sums).collect()
    }
    assert assigned == {1: 0, 2: 0, 3: 1, 4: 0}


def test_assignment_tie_breaks_by_lowest_label(spark):
    # two identical centroids: the tie must go to the smaller label
    d = _emb(spark, [(1, [1.0, 1.0], 5), (2, [1.0, 1.0], 3)])
    sums = label_centroid_sums(d)
    rows = assign_nearest_centroid(d, sums).collect()
    assert {r.nearest_label for r in rows} == {3}


def test_assignment_plan_broadcasts_centroids(spark, sf_dir):
    plan = (
        q_embedding_assign(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_plan_is_anti_join_not_cartesian(spark, sf_dir):
    plan = (
        q_dedup_incremental(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_token_budget_uses_partial_aggregation(spark, sf_dir):
    from pandasqlite_spark.functions.text import q_corpus_token_budget

    plan = (
        q_corpus_token_budget(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # map-side partial + final agg around a single exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1


def test_kmeans_converges_on_separable_fixture(spark):
    from pandasqlite_spark.functions.clustering import kmeans_lloyd

    # two tight blobs far apart; vec_id % 2 seeding scatters both blobs
    # across both initial clusters, so convergence requires real updates
    rows = [(i, [0.0 + i * 0.01, 0.0], 0) for i in range(4)] + [
        (10 + i, [5.0, 5.0 + i * 0.01], 0) for i in range(4)
    ]
    d = _emb(spark, rows)
    got = kmeans_lloyd(d, k=2, iters=3).collect()
    by_blob = {
        frozenset(r.vec_id for r in got if r.nearest_label == lbl)
        for lbl in {r.nearest_label for r in got}
    }
    assert by_blob == {frozenset({0, 1, 2, 3}), frozenset({10, 11, 12, 13})}


def test_kmeans_checkpoint_path_matches_plain(spark):
    from pandasqlite_spark.functions.clustering import kmeans_lloyd

    d = _emb(spark, [(i, [float(i % 5), float(i % 3)], 0) for i in range(30)])
    plain = sorted((r.vec_id, r.nearest_label) for r in kmeans_lloyd(d, k=3).collect())
    ckpt = sorted(
        (r.vec_id, r.nearest_label)
        for r in kmeans_lloyd(d, k=3, checkpoint=True).collect()
    )
    assert plain == ckpt


def test_dec12_to_double_matches_duckdb_past_2_53(spark):
    """Direct decimal(38,12)->double casts diverge by 1 ulp between
    engines once the scaled integer passes 2^53 (DuckDB double-rounds
    via the scaled int64).  The split conversion must agree bit-for-bit
    — this pins the exact magnitude that failed at sf0.1."""
    import duckdb

    from pandasqlite_spark.functions.clustering import _dec12_to_double

    vals = ["38472.477093199578", "9007199.254740993123", "1.000000000001"]
    for v in vals:
        got = (
            spark.sql(f"SELECT CAST('{v}' AS DECIMAL(38,12)) AS sq")
            .select(_dec12_to_double("sq").alias("d"))
            .collect()[0]
            .d
        )
        want = duckdb.sql(
            f"""SELECT CAST(FLOOR(sq) AS DOUBLE)
                       + CAST(CAST(sq - FLOOR(sq) AS DECIMAL(14,12)) AS DOUBLE)
                FROM (SELECT CAST('{v}' AS DECIMAL(38,12)) sq)"""
        ).fetchone()[0]
        assert got.hex() == want.hex(), (v, got.hex(), want.hex())
