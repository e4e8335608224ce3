"""Edge-case tests for the winsorized mean and top-k user journeys."""

from __future__ import annotations

import datetime as dt

from pandasqlite_spark.functions.analytics import top_user_paths, winsorized_mean


def test_winsorized_mean_clips_outlier(spark):
    # 20 well-behaved values + one huge outlier: the raw mean is
    # dragged, the winsorized mean clips the outlier to the P95 bound.
    rows = [("A", float(i), i) for i in range(1, 21)] + [("A", 10000.0, 99)]
    orders = spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double, o_orderkey bigint"
    )
    out = winsorized_mean(orders).collect()[0]
    assert out.n_rows == 21
    # ceil(0.95*21) = 20 → P95 bound is the 20th smallest value (20.0)
    assert out.p95 == 20.0
    assert out.raw_mean > 480  # outlier dominates
    assert out.winsorized_mean < 15  # clipped to sane range
    # ceil(0.05*21) = 2 → low clip at the 2nd smallest value
    assert out.p5 == 2.0


def test_top_paths_counts_exact_journeys(spark):
    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = []
    eid = 0
    # 3 users follow view>click, 1 user follows click>view
    for uid, seq in [(1, "vc"), (2, "vc"), (3, "vc"), (4, "cv")]:
        for i, ch in enumerate(seq):
            rows.append(
                (uid, eid, t0 + i * s, "view" if ch == "v" else "click")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    out = top_user_paths(ev).collect()
    assert (out[0].path, out[0].n_users) == ("view>click", 3)
    assert (out[1].path, out[1].n_users) == ("click>view", 1)


def test_top_paths_truncates_at_depth(spark):
    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [(1, i, t0 + i * s, "view") for i in range(8)]  # 8 events, depth 5
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    out = top_user_paths(ev).collect()
    assert out[0].path == ">".join(["view"] * 5)
