"""SparkSession factory with SQLite-parity and scale-oriented defaults.

Parity configs (SURVEY.md §4.2-2):

- ``spark.sql.ansi.enabled=false`` — SQLite casts are lossy-but-silent
  (bad casts yield NULL, not errors); the reference's generated SQL relies
  on that forgiveness (reference ``pandasqlite/pandasqlite.py:223``).
- ``spark.sql.caseSensitive=false`` — SQLite identifiers are
  case-insensitive.
- ``spark.sql.session.timeZone=UTC`` — deterministic timestamp semantics,
  matching DuckDB's UTC-naive timestamps for the correctness oracle.

Scale configs: AQE on (runtime re-plan, skew-join handling, partition
coalescing), Arrow on (fast toPandas / pandas_udf), shuffle partitions
sized to the local core count (overridable; on a real cluster this would
be ~2-3× total cores or left to AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pandasqlite_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` (driver contract) sets local parallelism;
    defaults to all cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("PANDASQLITE_SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        ncpu = os.cpu_count() or 8 if cpus == "*" else int(cpus)
        shuffle_partitions = max(8, ncpu)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # --- parity with the reference's SQLite semantics ---
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.caseSensitive", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # --- scale / performance posture ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PANDASQLITE_SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
