#!/usr/bin/env python
"""Interleaved A/B + value-identity for the round-9 range-join
prefix-count rewrite.  BASE = the pre-change bucketed pair-join form,
reconstructed verbatim below (the ab_fuzzy precedent); OPT = the
committed prefix-count form.

    python scripts/ab_rangejoin_sf1.py [sf_dir] [runs_per_arm]

Writes AB_RANGEJOIN_SF1.json with per-arm raw seconds, medians, and
``identical`` — full sorted-row equality of the two forms at sf_dir
AND on the nulls twin.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pandasqlite_spark.operators.advanced import _RANGE_MS, q_range_join  # noqa: E402
from pandasqlite_spark.operators.common import load_events  # noqa: E402


def range_join_pairjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-rewrite form, verbatim."""
    e = load_events(spark, sf_dir)
    ms = F.unix_millis("ts")
    errors = (
        e.filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("a_id"), ms.alias("a_ms"))
        .withColumn("bucket", F.explode(F.array(
            F.expr(f"a_ms div {_RANGE_MS}"),
            F.expr(f"a_ms div {_RANGE_MS} + 1"),
        )))
    )
    others = e.select(F.col("event_id").alias("b_id"), ms.alias("b_ms")).withColumn(
        "bucket", F.expr(f"b_ms div {_RANGE_MS}")
    )
    joined = errors.join(others, "bucket").filter(
        (F.col("b_ms") > F.col("a_ms"))
        & (F.col("b_ms") <= F.col("a_ms") + _RANGE_MS)
        & (F.col("b_id") != F.col("a_id"))
    )
    per_error = joined.groupBy("a_id").agg(F.countDistinct("b_id").alias("n_following"))
    all_errors = e.filter(F.col("event_type") == "error").select(F.col("event_id").alias("a_id"))
    return (
        all_errors.join(per_error, "a_id", "left")
        .select("a_id", F.coalesce("n_following", F.lit(0)).alias("n_following"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pandasqlite_spark.session import get_spark

    spark = get_spark("ab_rangejoin_sf1")

    # value identity at sf_dir + small SFs + the nulls twin
    ident = {}
    for label, d in (
        ("sf0.001", "/root/testdata/sf0.001"),
        ("sf0.01", "/root/testdata/sf0.01"),
        ("target", sf_dir),
        ("nulls", "/tmp/testdata_nulls"),
    ):
        if not os.path.isdir(d):
            ident[label] = "skipped (missing dir)"
            continue
        a = sorted(map(tuple, range_join_pairjoin(spark, d).collect()))
        b = sorted(map(tuple, q_range_join(spark, d).collect()))
        ident[label] = (a == b)
        print(f"identity[{label}] = {ident[label]} ({len(a)} rows)", flush=True)

    warm = "/root/testdata/sf0.001"
    for fn in (range_join_pairjoin, q_range_join):
        fn(spark, warm).write.mode("overwrite").format("noop").save()
    base, opt = [], []
    for _ in range(n_runs):
        for arm, fn in (("base", range_join_pairjoin), ("opt", q_range_join)):
            spark.sparkContext.setJobDescription(f"range-join [{arm}]")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            (base if arm == "base" else opt).append(
                round(time.perf_counter() - t0, 3)
            )
    out = {
        "sf_dir": sf_dir,
        "runs_per_arm": n_runs,
        "identical": ident,
        "base_runs": base,
        "opt_runs": opt,
        "base_median": round(statistics.median(base), 3),
        "opt_median": round(statistics.median(opt), 3),
    }
    print(out, flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "AB_RANGEJOIN_SF1.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
