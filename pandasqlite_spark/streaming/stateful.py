"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for stateful semantics Spark's built-in windowed
aggregations can't express (SURVEY.md §2.D): user-defined per-key state
machines with timeout-based eviction.  Example operator: a per-user
running profile (event count, value sum, last-seen) that emits an
updated row per micro-batch and evicts idle users via processing-time
timeout — the shape of sessionized feature-stores over event streams.

State is partitioned by key (one shuffle), bounded by eviction, and
Arrow-batched per group — the scalable form of "custom operator" when
(a) composition of built-ins and (b) stateless pandas UDFs don't fit.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total double, last_ms bigint"
STATE_SCHEMA = "n bigint, total double, last_ms bigint"


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_ms = max(last_ms, int(pdf["ms"].max()))
    state.update((n, total, last_ms))
    try:
        state.setTimeoutDuration(60 * 60 * 1000)  # evict after 1h idle
    except Exception:
        # NoTimeout runs (finite drains) reject timer registration —
        # eviction is a production-stream concern only
        pass
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total": [total], "last_ms": [last_ms]}
    )


def user_profiles_stream(events: DataFrame, evict: bool = True) -> DataFrame:
    """events (streaming, with ts) → per-user running profile rows.

    ``evict=True`` (production) registers a 1h-idle processing-time
    timeout so stale users leave the state store.  Pass ``evict=False``
    for FINITE drains: with processing-time timers armed, an
    availableNow query never self-terminates (the engine schedules
    empty batch after empty batch hoping to fire the timers — observed
    as the 120s-per-run cap-out in SWEEP_r05) and even
    ``processAllAvailable`` doesn't latch; with NoTimeout the drain
    completes in one data batch."""
    from pyspark.sql import functions as F

    from pandasqlite_spark.operators.common import ensure_package_on_workers

    ensure_package_on_workers(events.sparkSession)
    with_ms = events.withColumn("ms", F.unix_millis("ts"))
    return (
        with_ms.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout,
        )
    )
