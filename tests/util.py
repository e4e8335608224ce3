"""Driver-mimicking comparator: row-count + schema + order-insensitive
value comparison between a Spark DataFrame and a DuckDB oracle query."""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

from pandasqlite_spark.operators.common import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v.hex()  # bit-exact float comparison
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
        return tuple(_norm(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    got = spark_df.toPandas()
    problems = []
    if sorted(got.columns) != sorted(oracle_pdf.columns):
        problems.append(f"columns: spark={sorted(got.columns)} oracle={sorted(oracle_pdf.columns)}")
        return problems
    if len(got) != len(oracle_pdf):
        problems.append(f"row count: spark={len(got)} oracle={len(oracle_pdf)}")
    a, b = canon(got), canon(oracle_pdf)
    if a != b:
        diff_a = [r for r in a if r not in set(map(tuple, b))][:3]
        diff_b = [r for r in b if r not in set(map(tuple, a))][:3]
        problems.append(f"values differ; spark-only={diff_a} oracle-only={diff_b}")
    return problems
