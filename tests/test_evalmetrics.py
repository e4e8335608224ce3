"""Closed-form edge cases for the evaluation-metrics batch
(functions/evalmetrics.py).  The DuckDB-oracle sweep covers the
testdata distributions; these pin the values degenerate shapes must
produce."""

from __future__ import annotations

import datetime as dt
import math

import pyspark.sql.functions as F

from pandasqlite_spark.functions.evalmetrics import (
    calibration_bins,
    group_kfold_stats,
    substring_kgram_dup,
    theil_sen_daily_trend,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_theil_sen_ignores_one_outlier_day(spark):
    # counts 10, 20, 30, 1000, 50 on consecutive days: OLS would be
    # dragged far above 10/day by day 4; the pairwise-slope median
    # stays at the clean trend's 10.
    rows = []
    eid = 0
    for d, n in [(1, 10), (2, 20), (3, 30), (4, 1000), (5, 50)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, d, 12, 0), 1, "view"))
    out = theil_sen_daily_trend(_events(spark, rows)).collect()[0]
    assert out.n_days == 5
    assert out.n_pairs == 10
    assert out.slope == 10.0


def test_theil_sen_exact_line_recovers_slope_and_intercept(spark):
    # y = 5x + c exactly (daily counts 5, 10, 15): every pairwise slope
    # is 5 and every residual y - 5x equals the same intercept.
    rows = []
    eid = 0
    for d, n in [(1, 5), (2, 10), (3, 15)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, d, 12, 0), 1, "view"))
    out = theil_sen_daily_trend(_events(spark, rows)).collect()[0]
    assert out.slope == 5.0
    x1 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert out.intercept == round(5 - 5.0 * x1, 6)


def test_calibration_bins_rate_and_gap(spark):
    # event_ids 0..999 cover every hash residue exactly once, so each
    # of the 10 bins holds exactly 100 events with avg score centered
    # in the bin; labels make bin rates 0 or 1 per construction.
    rows = [
        (i, dt.datetime(2024, 1, 1), 1, "purchase" if i % 2 == 0 else "view")
        for i in range(1000)
    ]
    out = calibration_bins(_events(spark, rows)).collect()
    assert [r.bin for r in out] == list(range(10))
    assert all(r.n == 100 for r in out)
    # each bin's average score sits inside the bin's [b/10, (b+1)/10)
    for r in out:
        assert r.bin / 10 <= r.avg_score < (r.bin + 1) / 10
        assert r.abs_gap == round(abs(r.avg_score - r.rate), 6)


def test_group_kfold_is_user_pure_and_counts(spark):
    # 10 users × 3 events each: fold is a function of user_id, so each
    # fold's n_events must be 3 × its n_users.
    rows = []
    eid = 0
    for u in range(10):
        for j in range(3):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1), u, "view"))
    out = group_kfold_stats(_events(spark, rows)).collect()
    assert sum(r.n_users for r in out) == 10
    assert all(r.n_events == 3 * r.n_users for r in out)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_substring_kgram_flags_exact_copy_not_fresh_text(spark):
    shared = "A" * 25 + "B" * 25 + "C" * 25  # 75 chars, identical grams
    fresh = "".join(chr(ord("a") + (i * 7) % 26) for i in range(75))
    docs = _docs(spark, [(1, shared), (2, shared), (3, fresh)])
    out = {r.doc_id: r for r in substring_kgram_dup(docs).collect()}
    assert out[1].dup_frac == 1.0 and out[2].dup_frac == 1.0
    assert out[3].dup_frac == 0.0
    # stride-10 40-grams of a 75-char doc start at 1, 11, 21, 31
    # (1-based), but identical AAA...BBB windows collapse: count DISTINCT
    assert out[3].n_grams == 4


def test_substring_kgram_short_and_null_docs_excluded(spark):
    docs = _docs(spark, [(1, "short"), (2, None), (3, "x" * 40)])
    out = substring_kgram_dup(docs).collect()
    assert [r.doc_id for r in out] == [3]
    assert out[0].n_grams == 1 and out[0].n_dup == 0


def test_cuped_perfect_covariate_removes_all_variance(spark):
    # y = 2x exactly for every user: theta = cov/var = 2, rho^2 = 1,
    # and the adjusted diff collapses to 0 REGARDLESS of which md5 arm
    # each user lands in — the closed form every CUPED implementation
    # must reproduce.
    import datetime as dt

    rows = []
    eid = 0
    pre, post = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 20)
    for u in range(1, 21):
        x = u % 4  # pre-period purchase count 0..3
        for _ in range(x):
            eid += 1
            rows.append((eid, pre, u, "purchase"))
        for _ in range(2 * x):
            eid += 1
            rows.append((eid, post, u, "purchase"))
        eid += 1
        rows.append((eid, pre, u, "view"))  # every user observed
    from pandasqlite_spark.functions.evalmetrics import cuped_lift

    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    out = cuped_lift(ev).collect()[0]
    assert out.n_users == 20
    assert out.n_a + out.n_b == 20
    assert out.theta == 2.0
    assert out.rho2 == 1.0
    assert out.diff_cuped == 0.0
