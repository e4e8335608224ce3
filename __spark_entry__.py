"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator correctness harness:
each key from SURVEY.md §2 maps to a (spark, sf_dir) -> DataFrame
builder and an equivalent DuckDB-runnable ANSI SQL string; the driver
hash-compares them at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-style pricing
    summary — scan → filter (pushed to parquet) → hash agg → sort."""
    from pandasqlite_spark.operators.relational import q_agg_count_sum_avg_min_max

    return q_agg_count_sum_avg_min_max(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pandasqlite_spark.operators import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from pandasqlite_spark.operators import registry

    return registry.oracle_sql()


def oracle_sql_big() -> dict[str, str]:
    """Optional staged (multi-statement) oracle overrides for big-SF
    sweeps — keys whose single-statement oracle exhausts the DuckDB
    verifier's temp disk at sf10 (50M-edge multi-hop graph expansions).
    Not part of the driver contract; ``scripts/driver_sweep.py`` uses
    these when present so sf10 gets a full value check instead of a
    rows-executed record."""
    from pandasqlite_spark.operators import registry

    return registry.oracle_sql_big()
