"""Pipeline operators from the reference itself (SURVEY.md §2.A) as
oracle-checkable query keys: ingest round-trip, deterministic value
sampling, enum enumeration, and the text2sql end-to-end path (driven by
the deterministic FakeLLM — no network, same prompt/parse contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandasqlite_spark.core.ingest import ingest
from pandasqlite_spark.core.llm import FakeLLM
from pandasqlite_spark.core.text2sql import text2sql
from pandasqlite_spark.operators.common import load


def q_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest (hash → sanitize → register) then read the hash-named view
    back — the reference's store/read cycle (``pandasqlite.py:114-115``,
    ``README.md:49``) without the SQLite hop."""
    results, _, _ = ingest(spark, [f"{sf_dir}/region.parquet"], persist=False)
    return spark.table(f"`{results[0]['hash']}`")


def q_sample_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic analogue of ``snapshot_data`` (5 values per column,
    reference ``pandasqlite.py:290-302``): lowest 5 distinct values of a
    few nation columns, exploded to rows so the oracle is plain SQL."""
    n = load(spark, sf_dir, "nation")
    parts = []
    for c in ("n_nationkey", "n_name"):
        parts.append(
            n.select(F.col(c).cast("string").alias("value"))
            .distinct()
            # null-pin: NULLS LAST on both engines, so a NULL sample
            # value only surfaces when fewer than 5 non-null distinct
            # values exist (and the LLM prompt leads with real values)
            .orderBy(F.col("value").asc_nulls_last())
            .limit(5)
            .select(F.lit(c).alias("column_name"), "value")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def q_distinct_enum_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``distinct_enum_values`` (reference ``pandasqlite.py:283-287``)
    over the ENUM-ish columns of the star schema, as (column, value)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    a = c.select(F.lit("c_mktsegment").alias("column_name"), F.col("c_mktsegment").alias("value")).distinct()
    b = o.select(F.lit("o_orderpriority").alias("column_name"), F.col("o_orderpriority").alias("value")).distinct()
    return a.union(b)


_T2S_QUESTION = "total revenue and order count by return flag"
_T2S_SQL = (
    "SELECT l_returnflag, COUNT(*) AS n, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
    "FROM table GROUP BY l_returnflag"
)


def q_text2sql_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference lifecycle (SURVEY.md §3): ingest lineitem → build
    the five-section prompt → (fake) LLM → fence-parse → token-aware
    table rewrite → dialect rewrite → ``spark.sql`` execution."""
    llm = FakeLLM(text2sql_answers={_T2S_QUESTION: _T2S_SQL})
    results, _, _ = ingest(spark, [f"{sf_dir}/lineitem.parquet"], llm, persist=False)
    sql = text2sql(_T2S_QUESTION, results, llm)
    return spark.sql(sql)


QUERIES = {
    "ingest-roundtrip": q_ingest_roundtrip,
    "sample-values": q_sample_values,
    "distinct-enum-values": q_distinct_enum_values,
    "text2sql-e2e": q_text2sql_e2e,
}

ORACLES = {
    "ingest-roundtrip": "SELECT * FROM region",
    "sample-values": """
        SELECT column_name, value FROM (
          SELECT 'n_nationkey' AS column_name, CAST(n_nationkey AS VARCHAR) AS value
          FROM nation GROUP BY 2 ORDER BY 2 NULLS LAST LIMIT 5)
        UNION ALL
        SELECT column_name, value FROM (
          SELECT 'n_name' AS column_name, n_name AS value
          FROM nation GROUP BY 2 ORDER BY 2 NULLS LAST LIMIT 5)
    """,
    "distinct-enum-values": """
        SELECT 'c_mktsegment' AS column_name, c_mktsegment AS value
        FROM customer GROUP BY 2
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders GROUP BY 2
    """,
    "text2sql-e2e": (
        "SELECT l_returnflag, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "FROM lineitem GROUP BY l_returnflag"
    ),
}
