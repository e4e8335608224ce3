"""Assembles the full queries()/oracle_sql() surface for the driver.

Merges the relational surface (SURVEY.md §2.B), the pipeline operators
(§2.A: ingest round-trip, sampling, text2sql e2e), and the
LLM-data-pipeline extensions (§2.D: dedup, similarity, text analysis,
event windows).  Keys without an oracle entry are genuinely
non-SQL-expressible (or rely on engine-specific hashing) and get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from pandasqlite_spark.operators import advanced, extended, pipeline, relational, scale, tpch
    from pandasqlite_spark.functions import (
        analytics,
        evalmetrics,
        stats,
        geo,
        clustering,
        curate,
        dedup,
        graph,
        multimodal,
        sampling,
        similarity,
        sketches,
        text,
        timeseries,
        udfs,
    )
    from pandasqlite_spark.sources import generator as pyds_generator
    from pandasqlite_spark.streaming import events as streaming_events

    return (
        pyds_generator,
        relational,
        advanced,
        extended,
        scale,
        tpch,
        pipeline,
        dedup,
        sampling,
        multimodal,
        similarity,
        sketches,
        clustering,
        curate,
        graph,
        geo,
        analytics,
        evalmetrics,
        stats,
        text,
        timeseries,
        udfs,
        streaming_events,
    )


def queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _modules():
        out.update(getattr(m, "QUERIES", {}))
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLES", {}))
    return out


def oracle_sql_big() -> dict[str, str]:
    """Staged (multi-statement) DuckDB oracles for keys whose
    single-statement oracle is disk-infeasible at big SFs: each
    intermediate is materialized ONCE into a temp table instead of a
    multiply-referenced CTE, bounding the verifier's temp spill.
    Semantically identical to the registry oracle — the sweep harness
    prefers these when present; the driver's sf0.01 gate keeps using
    ``oracle_sql()``."""
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLES_BIG", {}))
    return out
