#!/usr/bin/env python
"""Interleaved A/B for the round-9 batch-2 spread/lineage changes
(text-naive-bayes, dedup-minhash-estimate).  BASE arm: spread_scan →
identity AND classic.DataFrame.localCheckpoint → identity (these two
keys had no other checkpoint, so that is exactly the pre-change plan).

    python scripts/ab_spread2_sf1.py [sf_dir] [runs_per_arm]

Writes AB_SPREAD2_SF1.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.classic.dataframe import DataFrame as CDataFrame  # noqa: E402

from pandasqlite_spark.operators import common  # noqa: E402

KEYS = ["text-naive-bayes", "dedup-minhash-estimate"]

_REAL_CKPT = CDataFrame.localCheckpoint
_REAL_SPREAD = common.spread_scan


def _base_on() -> None:
    CDataFrame.localCheckpoint = lambda self, eager=True: self
    common.spread_scan = lambda df, c: df


def _opt_on() -> None:
    CDataFrame.localCheckpoint = _REAL_CKPT
    common.spread_scan = _REAL_SPREAD


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pandasqlite_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("ab_spread2_sf1")
    warm = "/root/testdata/sf0.001"
    out = {}
    for key in KEYS:
        for setter in (_base_on, _opt_on):
            setter()
            try:
                entry.queries()[key](spark, warm).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception:
                pass
        base, opt = [], []
        for _ in range(n_runs):
            for arm, setter in (("base", _base_on), ("opt", _opt_on)):
                setter()
                spark.sparkContext.setJobDescription(f"{key} [{arm}]")
                t0 = time.perf_counter()
                entry.queries()[key](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                (base if arm == "base" else opt).append(
                    round(time.perf_counter() - t0, 3)
                )
        out[key] = {
            "base_runs": base,
            "opt_runs": opt,
            "base_median": round(statistics.median(base), 3),
            "opt_median": round(statistics.median(opt), 3),
        }
        print(key, out[key], flush=True)
    _opt_on()
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "AB_SPREAD2_SF1.json"), "w") as fh:
        json.dump({"sf_dir": sf_dir, "runs_per_arm": n_runs, "keys": out}, fh,
                  indent=1)


if __name__ == "__main__":
    main()
