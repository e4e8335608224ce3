#!/usr/bin/env python
"""Interleaved A/B for the round-9 spread_scan change (guide §2.5):
BASE = spread_scan forced to identity (the pre-change plan), OPT = the
committed form.  Runs each arm N times per key, interleaved
base/opt/base/opt within one shared JVM (both arms share whatever
machine state the contended host is in at that moment), noop sink.

    python scripts/ab_spread_sf1.py [sf_dir] [runs_per_arm]

Writes AB_SPREAD_SF1.json: per key, per arm raw seconds + medians.
Value identity is checked separately by the driver-sweep oracle runs;
this script measures only.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandasqlite_spark.operators import common  # noqa: E402

KEYS = [
    "agg-bootstrap-ci",
    "cluster-kmeans",
    "simsearch-ivf-kmeans",
    "embedding-assign",
]

_REAL_SPREAD = common.spread_scan


def _identity_spread(df, id_col):
    return df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pandasqlite_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("ab_spread_sf1")
    # consumers bind spread_scan at call time through the module
    # attribute their own module imported by value — patch BOTH homes
    import pandasqlite_spark.functions.analytics as analytics
    import pandasqlite_spark.functions.clustering as clustering
    import pandasqlite_spark.functions.similarity as similarity

    def set_spread(fn):
        common.spread_scan = fn
        analytics.spread_scan = fn
        clustering.spread_scan = fn
        similarity._spread_scan = fn
        similarity.spread_scan = fn

    out = {}
    # warm plan shapes once per arm at sf0.001
    warm = "/root/testdata/sf0.001"
    for key in KEYS:
        for fn in (_identity_spread, _REAL_SPREAD):
            set_spread(fn)
            try:
                entry.queries()[key](spark, warm).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception:
                pass
        base, opt = [], []
        for _ in range(n_runs):
            for arm, fn in (("base", _identity_spread), ("opt", _REAL_SPREAD)):
                set_spread(fn)
                spark.sparkContext.setJobDescription(f"{key} [{arm}]")
                t0 = time.perf_counter()
                entry.queries()[key](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.perf_counter() - t0
                (base if arm == "base" else opt).append(round(dt, 3))
        out[key] = {
            "base_runs": base,
            "opt_runs": opt,
            "base_median": round(statistics.median(base), 3),
            "opt_median": round(statistics.median(opt), 3),
        }
        print(key, out[key], flush=True)
    set_spread(_REAL_SPREAD)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "AB_SPREAD_SF1.json"), "w") as fh:
        json.dump({"sf_dir": sf_dir, "runs_per_arm": n_runs, "keys": out}, fh,
                  indent=1)


if __name__ == "__main__":
    main()
