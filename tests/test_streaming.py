"""Structured Streaming twins: the streaming session_window operator and
watermark plumbing run to completion on the finite events source."""

from __future__ import annotations

from pandasqlite_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    session_agg,
    streaming_session_window,
    streaming_tumbling,
)
from pandasqlite_spark.operators.common import load_events


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    agg = streaming_tumbling(read_events_stream(spark, sf_dir))
    name, _ = run_stream_to_memory(agg, mode="complete")
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["total"])
        for r in spark.table(name).collect()
    }
    from pandasqlite_spark.streaming.events import tumbling_agg

    want = {
        (r["hour"], r["event_type"]): (r["n"], r["total"])
        for r in tumbling_agg(load_events(spark, sf_dir)).collect()
    }
    assert got == want


def test_streaming_session_window_runs(spark, sf_dir):
    agg = streaming_session_window(read_events_stream(spark, sf_dir))
    name, _ = run_stream_to_memory(agg, mode="complete")
    rows = spark.table(name).collect()
    assert len(rows) > 0
    # session windows respect the gap: end >= start for every session
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_batch_sessionization_gap_semantics(spark, sf_dir):
    sessions = session_agg(load_events(spark, sf_dir)).collect()
    assert len(sessions) > 0
    by_user = {}
    for r in sessions:
        by_user.setdefault(r["user_id"], []).append(r)
    # within a user, sessions are disjoint and ordered
    for rs in by_user.values():
        rs.sort(key=lambda r: r["session_id"])
        for a, b in zip(rs, rs[1:]):
            assert b["start_ms"] - a["end_ms"] > 30 * 60 * 1000
