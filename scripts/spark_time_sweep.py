#!/usr/bin/env python
"""Spark-side timing survey over registry keys: build + noop-sink each
key once (timing includes build-time jobs like eager checkpoints),
record wall seconds.  No oracle — this ranks walls, it does not prove
correctness (driver_sweep.py does that).

    python scripts/spark_time_sweep.py OUT.json SF_DIR [key ...]

Defaults to every queries() key.  Writes OUT.json incrementally
(crash-safe); each record carries the /proc/stat steal fraction over
its own wall window (BENCH_NOTES.md round-10 rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def _stat():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def main() -> None:
    out_path, sf_dir = sys.argv[1], sys.argv[2]
    from pandasqlite_spark.session import get_spark

    spark = get_spark("spark_time_sweep")
    qs = entrymod.queries()
    keys = sys.argv[3:] or list(qs)
    out: dict = {"sf_dir": sf_dir, "keys": {}}
    for key in keys:
        spark.sparkContext.setJobDescription(f"sweep {key}")
        s0 = _stat()
        t0 = time.perf_counter()
        try:
            qs[key](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            err = None
        except Exception as exc:  # noqa: BLE001
            err = repr(exc)[:500]
        wall = round(time.perf_counter() - t0, 3)
        s1 = _stat()
        d = [b - a for a, b in zip(s0, s1)]
        steal = round(100 * d[7] / (sum(d) or 1), 2)
        out["keys"][key] = {"spark_s": wall, "steal_pct": steal, "err": err}
        print(key, wall, f"steal={steal}%", err or "", flush=True)
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
