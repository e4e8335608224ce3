#!/usr/bin/env python
"""sf10 streaming drain (round-8 verdict #9): the batch twins are
sf10-value-proven; this adds the sf10 PERFORMANCE/state datum for the
three cheapest streaming twins — `events-streaming-heatmap`,
`events-streaming-rate-limit`, `events-streaming-slo-burn` — through a
multi-batch availableNow drain over time-ordered files, watermark
eviction / state plateau instrumented per batch.

The aggregation bodies mirror the registry twins exactly
(`streaming/events.py`: q_events_streaming_heatmap's ≤168-cell matrix,
q_events_streaming_slo_burn's per-hour counters, streaming_rate_limit's
per-(user, minute) windows with eviction); only the source is swapped
for the staged time-ordered reader so the drain sees N real
micro-batches with an advancing watermark.

Writes the rows back into BENCH_STREAM.json under sf10-prefixed keys.

Usage: python scripts/bench_stream_sf10.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pandasqlite_spark.session import get_spark  # noqa: E402
from pandasqlite_spark.streaming.events import streaming_rate_limit  # noqa: E402

from bench_stream import (  # noqa: E402
    drain_and_measure,
    read_staged_stream,
    stage_time_ordered_files,
)


def heatmap_cells(stream):
    """q_events_streaming_heatmap's state: the ≤168-cell hour×weekday
    count matrix (complete mode — state constant forever)."""
    return stream.select(
        (
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) % 7
        ).alias("weekday"),
        F.hour("ts").alias("hour"),
    ).groupBy("weekday", "hour").agg(F.count(F.lit(1)).alias("n"))


def slo_hours(stream):
    """q_events_streaming_slo_burn's state: per-hour total/error
    counters (complete mode — bounded by the calendar)."""
    return stream.groupBy(
        F.floor(F.unix_micros("ts") / 3_600_000_000).cast("bigint").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_err"
        ),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10"
    n_batches = int(os.environ.get("STREAM_BATCHES", "12"))
    spark = get_spark("bench_stream_sf10")
    staging = os.path.join(
        os.environ.get("STREAM_STAGING_ROOT", "/tmp/stream_stage"),
        os.path.basename(os.path.normpath(sf_dir)) + f"_{n_batches}",
    )
    print(f"STAGING {n_batches} files -> {staging}", file=sys.stderr)
    stage_time_ordered_files(spark, sf_dir, n_batches, staging)
    src = lambda: read_staged_stream(spark, staging)  # noqa: E731

    benches = [
        (
            "sf10-streaming-heatmap",
            dict(build=lambda: heatmap_cells(src()), mode="complete"),
        ),
        (
            "sf10-streaming-slo-burn",
            dict(build=lambda: slo_hours(src()), mode="complete"),
        ),
        (
            "sf10-streaming-rate-limit",
            dict(
                build=lambda: streaming_rate_limit(src()),
                mode="append",  # watermark closes windows → eviction
                rocksdb=True,
            ),
        ),
    ]
    rows = {}
    for key, kw in benches:
        print(f"BENCH {key}", file=sys.stderr, flush=True)
        rows[key] = drain_and_measure(
            spark, **kw, meta={"files": n_batches, "sf_dir": sf_dir}
        )
        print(f"  {rows[key]}", file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_STREAM.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc.update(rows)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"merged {len(rows)} sf10 rows into {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
