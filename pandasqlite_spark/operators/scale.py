"""Scale techniques: bucketed co-located joins, salted skew joins.

These are the levers the 100 TB deployment pulls when AQE alone isn't
enough; each has a test asserting the *plan property* it exists for
(no shuffle for bucketed joins; balanced partitions for salted joins),
not just result correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8
) -> None:
    """Persist a table bucketed (and sorted) by its join key.  Joins and
    aggregations on ``key`` between tables bucketed the same way are
    co-located: Catalyst plans them with NO Exchange — at 100 TB this
    removes the dominant cost of every fact⋈fact join."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def write_range_sorted(
    df: DataFrame, path: str, key: str, n_partitions: int = 8
) -> None:
    """Persist parquet range-partitioned and sorted by ``key`` — the
    data-layout lever for scan-heavy workloads: every output file
    covers a disjoint key range, so parquet row-group min/max stats
    turn a key-range filter into file- and row-group-level skipping
    (the batch analogue of a clustered index; at 100 TB this is the
    difference between scanning one file and scanning them all)."""
    (
        df.repartitionByRange(n_partitions, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: split each hot left key across
    ``n_salts`` shuffle partitions (deterministic salt from the full
    row hash) and replicate the right side once per salt.  Result is
    identical to the plain join; the shuffle is balanced even when one
    key holds most of the rows.  (AQE's skew-join handles sort-merge
    skew automatically; salting is the explicit fallback for hash
    aggregations and older planners.)"""
    lcols = [F.col(c) for c in left.columns]
    salted_l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*lcols), F.lit(n_salts)).cast("int")
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_l.join(
        salted_r,
        (F.col(left_key) == F.col(right_key)) & (salted_l._salt == salted_r._salt),
    )
    return out.drop("_salt")


def plan_has_exchange(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan


def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders through the salted join, aggregated per status.

    Salting is result-invariant — the oracle is the plain join — so the
    driver's value-hash proves the skew mitigation does not perturb
    semantics while the plan test proves it balances the shuffle."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey")
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


QUERIES = {
    "join-skew-salted": q_join_skew_salted,
}

ORACLES = {
    "join-skew-salted": """
        SELECT o_orderstatus, COUNT(*) AS cnt,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
}
