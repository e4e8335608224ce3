#!/usr/bin/env python
"""Round-8 verdict item 6: profile q5_dedup_minhash at sf1 (the #2
headline query, 5.07s in BENCH_SF1) — split the wall into signature /
LSH-band+bucket-join stages, and A/B the explode→groupBy signature
(`minhash_signatures`) against the shuffle-free row-local variant
(`minhash_signatures_local`) under the latter's documented win
condition (persisted signature feeding the self-join).

Variants, each a full q5 (pairs.count()) unless noted:
  sig_grpby      signature only, explode→groupBy (count())
  sig_local      signature only, row-local array fold (count())
  q5_current     bench path: groupBy sig → bands → bucket self-join
  q5_local       local sig → bands → bucket self-join (no persist:
                 signature recomputed on both join sides)
  q5_local_ckpt  local sig → localCheckpoint → bands → self-join
                 (the documented win condition)
  q5_grpby_ckpt  groupBy sig → localCheckpoint → bands → self-join
                 (controls for checkpoint-vs-ReusedExchange)

Median of N (default 3) after one untimed warm-up of the scan; runs
interleave variants round-robin so JVM drift lands evenly.

Usage: python scripts/profile_q5_sf1.py [sf_dir] [runs]
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
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    docs = load(spark, sf_dir, "documents")
    docs.count()  # warm the scan / page cache

    def sig_grpby():
        return minhash_signatures(docs, portable=False).count()

    def sig_local():
        return minhash_signatures_local(docs).count()

    def q5_current():
        return candidate_pairs(
            lsh_bands(minhash_signatures(docs, portable=False))
        ).count()

    def q5_local():
        return candidate_pairs(lsh_bands(minhash_signatures_local(docs))).count()

    def _ckpt(sig_df):
        sig = sig_df.localCheckpoint(eager=True)
        try:
            return candidate_pairs(lsh_bands(sig)).count()
        finally:
            sig.unpersist()

    def q5_local_ckpt():
        return _ckpt(minhash_signatures_local(docs))

    def q5_grpby_ckpt():
        return _ckpt(minhash_signatures(docs, portable=False))

    # the documented win condition is "input already well-partitioned":
    # the sf1 parquet scan is 2 partitions, so give the local variant a
    # one-time round-robin repartition to full parallelism first
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs_wide = docs.repartition(n_part)

    def sig_local_repart():
        return minhash_signatures_local(docs_wide).count()

    def q5_local_repart_ckpt():
        return _ckpt(minhash_signatures_local(docs_wide))

    variants = [
        ("sig_grpby", sig_grpby),
        ("sig_local", sig_local),
        ("q5_current", q5_current),
        ("q5_local", q5_local),
        ("q5_local_ckpt", q5_local_ckpt),
        ("q5_grpby_ckpt", q5_grpby_ckpt),
        ("sig_local_repart", sig_local_repart),
        ("q5_local_repart_ckpt", q5_local_repart_ckpt),
    ]
    walls: dict[str, list[float]] = {n: [] for n, _ in variants}
    counts: dict[str, int] = {}
    for r in range(runs):
        for name, fn in variants:
            t0 = time.monotonic()
            c = fn()
            walls[name].append(time.monotonic() - t0)
            counts[name] = c
            print(f"run {r} {name}: {walls[name][-1]:.3f}s rows={c}", flush=True)

    out = {
        "sf_dir": sf_dir,
        "runs": runs,
        "median_s": {n: round(statistics.median(w), 3) for n, w in walls.items()},
        "all_s": {n: [round(x, 3) for x in w] for n, w in walls.items()},
        "rows": counts,
    }
    print(json.dumps(out))
    with open("PROFILE_Q5_SF1.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
