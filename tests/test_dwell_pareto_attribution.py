"""Edge-case tests for state dwell, Pareto coverage, and last-touch
attribution (functions/analytics.py)."""

from __future__ import annotations

import datetime as dt

from pandasqlite_spark.functions.analytics import (
    last_touch_attribution,
    pareto_coverage,
    state_dwell_times,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )


def test_state_dwell_is_gap_to_next_event(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0, "view"),                                # dwells 10s in view
        (1, 2, t0 + dt.timedelta(seconds=10), "click"),    # dwells 50s in click
        (1, 3, t0 + dt.timedelta(seconds=60), "purchase"), # last: no dwell
    ]
    out = {r.event_type: r for r in state_dwell_times(_events(spark, rows)).collect()}
    assert set(out) == {"view", "click"}
    assert out["view"].total_us == 10_000_000 and out["view"].mean_dwell_s == 10.0
    assert out["click"].total_us == 50_000_000 and out["click"].mean_dwell_s == 50.0


def test_pareto_coverage_concentrated_revenue(spark):
    # one whale + nine minnows: decile 1 holds 10% of customers but
    # 100/109 of revenue; shares must sum to 1.
    rows = [(1, 100.0)] + [(k, 1.0) for k in range(2, 11)]
    orders = spark.createDataFrame(
        [(c, float(v)) for c, v in rows], "o_custkey bigint, o_totalprice double"
    )
    out = {r.decile: r for r in pareto_coverage(orders).collect()}
    assert len(out) == 10
    assert all(r.n_customers == 1 for r in out.values())
    assert out[1].rev_share == round(100 / 109, 6)
    assert out[10].cum_rev_share == 1.0


def test_attribution_respects_lookback_and_order(spark):
    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        (1, 1, t0, "click"),
        (1, 2, t0 + 2 * h, "click"),        # most recent click wins
        (1, 3, t0 + 3 * h, "purchase"),     # attributed to click 2, gap 1h
        (2, 4, t0, "click"),
        (2, 5, t0 + 100 * h, "purchase"),   # outside 72h lookback → null
        (3, 6, t0, "purchase"),             # no prior click → null
    ]
    out = {r.purchase_id: r for r in last_touch_attribution(_events(spark, rows)).collect()}
    assert out[3].attributed_click_id == 2 and out[3].gap_s == 3600
    assert out[5].attributed_click_id is None and out[5].gap_s is None
    assert out[6].attributed_click_id is None


def test_welch_ttest_zero_for_identical_cohorts(spark):
    import datetime as dt

    from pandasqlite_spark.functions.analytics import welch_ttest

    rows = []
    eid = 0
    for day, _grp in [(1, "a"), (25, "b")]:
        for v in (1.0, 2.0, 3.0, 4.0):
            rows.append((eid, dt.datetime(2024, 1, day), "purchase", v))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )
    out = welch_ttest(ev).collect()[0]
    assert out.n_week1 == 4 and out.n_week4 == 4
    assert out.mean_diff_cents == 0.0 and out.t_stat == 0.0
    assert out.welch_df == 6.0  # equal n, equal var → df = n_a + n_b - 2


def test_class_balanced_sample_equalizes_counts(spark):
    from pandasqlite_spark.functions.analytics import class_balanced_sample

    rows = [(i, "en") for i in range(10)] + [(100 + i, "fr") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = class_balanced_sample(docs).collect()
    by = {}
    for r in out:
        by.setdefault(r.label, []).append(r.doc_id)
    assert len(by["en"]) == 3 and len(by["fr"]) == 3
    # deterministic: same pick on re-run
    again = class_balanced_sample(docs).collect()
    assert sorted((r.doc_id, r.label) for r in out) == sorted(
        (r.doc_id, r.label) for r in again
    )


def test_feature_matrix_one_wide_row_per_user(spark):
    import datetime as dt

    from pandasqlite_spark.functions.analytics import user_feature_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "view"),
        (1, 2, t0 + dt.timedelta(days=2), "click"),
        (1, 3, t0 + dt.timedelta(days=2, hours=1), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    out = user_feature_matrix(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_total == 3 and r.n_view == 1 and r.n_click == 1 and r.n_purchase == 1
    assert r.n_error == 0 and r.active_days == 2 and r.tenure_days == 2


def test_peak_detect_requires_strict_dominance_over_both_sides(spark):
    import datetime as dt

    from pandasqlite_spark.functions.analytics import hourly_peaks

    t0 = dt.datetime(2024, 1, 1)
    counts = [1, 1, 5, 1, 1, 3, 3, 1, 1]  # index 2 is a peak; the 3,3 plateau is not
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, t0 + dt.timedelta(hours=h)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id bigint, ts timestamp")
    out = hourly_peaks(ev).collect()
    assert len(out) == 1 and out[0].x == 5
