"""Every queries() key with an oracle_sql() entry must match the DuckDB
oracle exactly (row count, schema, order-insensitive values) — the same
contract the driver enforces at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.util import compare, duckdb_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_query_matches_oracle(key, spark, sf_dir):
    con = duckdb_connection(sf_dir)
    got = QUERIES[key](spark, sf_dir)
    expected = con.sql(ORACLES[key]).df()
    problems = compare(got, expected)
    assert not problems, f"{key}: {problems}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_no_rows_only_keys_remain():
    """Every registry key carries a full DuckDB value oracle.  This set
    reached empty in round 6; keep it empty — a new key landing without
    an oracle_sql() entry silently downgrades the driver's check from
    rows+schema+hash to rows-only, and this invariant makes that a test
    failure instead of a skip."""
    assert sorted(set(QUERIES) - set(ORACLES)) == []
