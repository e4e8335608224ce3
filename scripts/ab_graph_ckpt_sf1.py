#!/usr/bin/env python
"""Interleaved A/B for the round-9 graph lineage cuts: BASE arm
monkeypatches DataFrame.localCheckpoint to identity (none of these
three keys had any other checkpoint, so that reproduces the pre-change
plan exactly), OPT arm restores it.  Interleaved base/opt within one
shared JVM, noop sink.

    python scripts/ab_graph_ckpt_sf1.py [sf_dir] [runs_per_arm]

Writes AB_GRAPH_CKPT_SF1.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
# Spark 4: the concrete class is classic.DataFrame, which OVERRIDES
# localCheckpoint — patching only the parent silently does nothing
from pyspark.sql.classic.dataframe import DataFrame as CDataFrame  # noqa: E402

KEYS = ["graph-pagerank", "graph-modularity", "graph-label-propagation"]

_REAL_CKPT = CDataFrame.localCheckpoint


def _ident_ckpt(self, eager=True):
    return self


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pandasqlite_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("ab_graph_ckpt_sf1")
    warm = "/root/testdata/sf0.001"
    out = {}
    for key in KEYS:
        for fn in (_ident_ckpt, _REAL_CKPT):
            CDataFrame.localCheckpoint = fn
            try:
                entry.queries()[key](spark, warm).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception:
                pass
        base, opt = [], []
        for _ in range(n_runs):
            for arm, fn in (("base", _ident_ckpt), ("opt", _REAL_CKPT)):
                CDataFrame.localCheckpoint = fn
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
    CDataFrame.localCheckpoint = _REAL_CKPT
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "AB_GRAPH_CKPT_SF1.json"), "w") as fh:
        json.dump({"sf_dir": sf_dir, "runs_per_arm": n_runs, "keys": out}, fh,
                  indent=1)


if __name__ == "__main__":
    main()
