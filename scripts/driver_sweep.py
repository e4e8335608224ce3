#!/usr/bin/env python
"""Driver-style correctness sweep: run EVERY queries() key against its
DuckDB oracle with full value comparison, in one fresh session — the
same check the external driver performs at sf0.01, runnable at any SF:

    python scripts/driver_sweep.py [sf_dir] [--vanilla] [--keys k1,k2,...]

Exits non-zero on any mismatch.  (This is how the approx-distinct rsd
bug was caught: pytest defaults to sf0.001 where the sketch happened to
be inside tolerance; the sweep at sf0.01 wasn't.)

``--vanilla`` runs the sweep under a DEFAULT-CONF SparkSession — Spark 4
ANSI mode ON, no parity confs — replicating the external driver's own
session.  Every key must pass in BOTH modes; a key that only passes under
``get_spark`` has a hidden session-conf dependence (the round-1
``cast-types`` failure mode).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.util import compare, duckdb_connection  # noqa: E402
from pandasqlite_spark.session import get_spark  # noqa: E402


def vanilla_spark():
    """A session with driver-like defaults: NO parity confs, ANSI on."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("driver_sweep_vanilla")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def main() -> int:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--keys" in argv:
        i = argv.index("--keys")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    vanilla = "--vanilla" in argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = vanilla_spark() if vanilla else get_spark("driver_sweep")
    if vanilla:
        print(f"vanilla session: ansi={spark.conf.get('spark.sql.ansi.enabled')}")
    # COLLECTION plumbing, not engine conf: the comparator's toPandas
    # without Arrow converts row-at-a-time (30+ min for a 6M-row result
    # at sf1 — the long pole of the first sf1 sweep attempt).  Arrow
    # changes how the driver RECEIVES rows, never what the engine
    # computes, so the vanilla-session independence the sweep exists to
    # prove is untouched.  Runtime-settable, so set it for both modes.
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    con = duckdb_connection(sf_dir)
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only is not None:
        unknown = only - set(queries)
        if unknown:
            print(f"unknown keys: {sorted(unknown)}")
            return 2
        queries = {k: v for k, v in queries.items() if k in only}
    t0 = time.perf_counter()
    failures: list[tuple[str, object]] = []
    verbose = os.environ.get("SWEEP_VERBOSE") == "1"
    for key in sorted(queries):
        if verbose:
            print(f"KEY {key}", flush=True)
        t1 = time.perf_counter()
        try:
            df = queries[key](spark, sf_dir)
            if key in oracles:
                problems = compare(df, con.sql(oracles[key]).df())
                if problems:
                    failures.append((key, problems))
            else:
                df.count()  # rows-only keys: must at least execute
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append((key, repr(exc)[:300]))
        dt = time.perf_counter() - t1
        if dt > 15:
            print(f"SLOW {key}: {dt:.1f}s", flush=True)
    print(f"total: {time.perf_counter() - t0:.1f}s for {len(queries)} keys")
    if failures:
        for key, why in failures:
            print(f"FAIL {key}: {why}")
        return 1
    print("all keys match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
