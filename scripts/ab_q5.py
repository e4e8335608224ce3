#!/usr/bin/env python
"""Focused A/B for the q5 bench path decision (round-8 verdict item 6):
current explode→groupBy signature (ReusedExchange self-join) vs the
row-local signature under its documented win condition (repartitioned
scan + eagerly persisted signature).  Interleaved A/B/A/B..., median of
N, one untimed warm-up each.

Usage: python scripts/ab_q5.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandasqlite_spark.functions.dedup import (  # noqa: E402
    candidate_pairs,
    lsh_bands,
    minhash_signatures,
    minhash_signatures_local,
)
from pandasqlite_spark.operators.common import load  # noqa: E402
from pandasqlite_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    docs = load(spark, sf_dir, "documents")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def a_current():
        return candidate_pairs(
            lsh_bands(minhash_signatures(docs, portable=False))
        ).count()

    def b_local_ckpt():
        sig = minhash_signatures_local(docs.repartition(n_part)).localCheckpoint(
            eager=True
        )
        try:
            return candidate_pairs(lsh_bands(sig)).count()
        finally:
            sig.unpersist()

    for fn in (a_current, b_local_ckpt):  # warm-up, untimed
        fn()

    walls = {"current": [], "local_ckpt": []}
    for r in range(runs):
        for name, fn in (("current", a_current), ("local_ckpt", b_local_ckpt)):
            t0 = time.monotonic()
            c = fn()
            walls[name].append(round(time.monotonic() - t0, 3))
            print(f"run {r} {name}: {walls[name][-1]:.3f}s rows={c}", flush=True)
    out = {
        "sf_dir": sf_dir,
        "median_s": {n: round(statistics.median(w), 3) for n, w in walls.items()},
        "all_s": walls,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
