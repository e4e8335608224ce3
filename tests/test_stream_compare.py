"""compare_streamed must reach the same verdicts as the in-memory
comparator: pass on equal multisets (any row/chunk order), fail on a
value flip, a row-count delta, or a schema delta — it replaces the
in-memory compare for full-projection keys whose 60M-row toPandas held
~77 GB RSS at sf10."""

from __future__ import annotations

import duckdb

from tests.util import compare_streamed


def _con(rows):
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if v is None else repr(v)}, "
            f"CAST({'NULL' if x is None else x} AS DOUBLE))"
            for i, v, x in rows
        )
        + ") v(id, s, x)"
    )
    return con


ROWS = [(1, "a", 1.5), (2, "b", -0.0), (3, None, None), (4, "d", 2.25)]


def _spark_df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "id long, s string, x double")


def test_streamed_match_any_order(spark):
    con = _con(ROWS)
    assert compare_streamed(
        _spark_df(spark), con, "SELECT * FROM t ORDER BY id DESC", chunk_rows=2
    ) == []


def test_streamed_catches_value_flip(spark):
    con = _con([(1, "a", 1.5), (2, "b", -0.0), (3, None, None), (4, "d", 2.26)])
    problems = compare_streamed(_spark_df(spark), con, "SELECT * FROM t", chunk_rows=2)
    assert problems and "values differ" in problems[0]


def test_streamed_catches_row_count(spark):
    con = _con(ROWS)
    problems = compare_streamed(
        _spark_df(spark), con, "SELECT * FROM t WHERE id <> 2", chunk_rows=2
    )
    assert problems and "row count" in problems[0]


def test_streamed_catches_schema(spark):
    con = _con(ROWS)
    problems = compare_streamed(
        _spark_df(spark), con, "SELECT id, s, x AS y FROM t", chunk_rows=2
    )
    assert problems and problems[0].startswith("columns")


def test_streamed_null_int_chunk_consistency(spark):
    """An int column whose nulls land in only SOME chunks must canon
    identically across chunks (the plain to_pandas float64 widening
    this comparator guards against)."""
    rows = [(i, "s", None) for i in range(6)] + [(9, "s", 7)]
    df = spark.createDataFrame(
        [(i, s, v) for i, s, v in rows], "id long, s string, v long"
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, 's', {'NULL' if v is None else v})" for i, _, v in rows
        )
        + ") v(id, s, v)"
    )
    assert compare_streamed(df, con, "SELECT * FROM t", chunk_rows=2) == []
