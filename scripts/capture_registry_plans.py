#!/usr/bin/env python
"""Capture .explain("formatted") for arbitrary REGISTRY keys into
plans/<tag>/registry/<key>_<suffix>.txt (same evidence contract as
capture_plans.py, which covers only the headline bench queries).

Usage: python scripts/capture_registry_plans.py <tag> <suffix> key [key ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", tag, "registry")
    os.makedirs(out_dir, exist_ok=True)

    from pandasqlite_spark.session import get_spark

    spark = get_spark("pandasqlite_spark_plan_capture_registry")
    qs = entrymod.queries()
    for key in keys:
        df = qs[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
