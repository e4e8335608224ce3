"""Edge-case unit tests for the distribution/dependence statistics
batch (functions/stats.py, BM25 in functions/text.py).  The
DuckDB-oracle sweep covers the testdata distributions; these pin the
closed-form values degenerate shapes must produce."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from pandasqlite_spark.functions.stats import (
    chisq_residuals,
    hourly_acf,
    moment_shape_by_group,
    pmi_cells,
    rolling_daily_median,
)
from pandasqlite_spark.functions.text import bm25_scores


def _vals(spark, xs):
    return spark.createDataFrame([("g", int(x)) for x in xs], "grp string, x bigint")


def test_skewness_zero_for_symmetric(spark):
    out = moment_shape_by_group(_vals(spark, [1, 2, 3]), "grp", F.col("x")).collect()
    assert out[0].skewness == 0.0
    assert out[0].mean_x == 2.0


def test_skewness_positive_for_right_tail(spark):
    out = moment_shape_by_group(
        _vals(spark, [1, 1, 1, 10]), "grp", F.col("x")
    ).collect()
    assert out[0].skewness > 1.0


def test_kurtosis_excess_of_two_point_mass_is_minus_two(spark):
    # A symmetric two-point distribution is the minimum-kurtosis shape:
    # excess kurtosis = -2 exactly.
    out = moment_shape_by_group(
        _vals(spark, [0, 0, 10, 10]), "grp", F.col("x")
    ).collect()
    assert out[0].kurtosis_ex == -2.0


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_pmi_zero_when_independent(spark):
    # 2 types × 2 day-parts with identical column profiles → every cell
    # has c_xy·n == c_x·c_y → pmi = ln(1) = 0.
    t_am = dt.datetime(2024, 1, 1, 3, 0)   # hour 3 → bucket 0
    t_pm = dt.datetime(2024, 1, 1, 15, 0)  # hour 15 → bucket 2
    rows = []
    for ty in ("a", "b"):
        rows += [(ty, t_am)] * 2 + [(ty, t_pm)] * 2
    out = pmi_cells(_events(spark, rows)).collect()
    assert len(out) == 4
    assert all(r.pmi == 0.0 and r.mi_term == 0.0 for r in out)


def test_chisq_residuals_zero_when_independent(spark):
    mon = dt.datetime(2024, 1, 1, 12, 0)  # dow 0
    tue = dt.datetime(2024, 1, 2, 12, 0)  # dow 1
    rows = []
    for ty in ("a", "b"):
        rows += [(ty, mon)] * 3 + [(ty, tue)] * 3
    out = chisq_residuals(_events(spark, rows)).collect()
    assert len(out) == 4
    assert all(r.std_resid == 0.0 and r.expected == 3.0 for r in out)


def test_acf_lag1_of_alternating_series(spark):
    # x = 2,1,2,1,... over n=8 hours: dev = ±n/2, so
    # acf(1) = -(n-1)/n = -0.875 exactly.
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(8):
        cnt = 2 if h % 2 == 0 else 1
        rows += [("e", base + dt.timedelta(hours=h))] * cnt
    out = {r.lag: r.acf for r in hourly_acf(_events(spark, rows), max_lag=2).collect()}
    assert out[1] == -0.875
    # lag 2 pairs are same-parity: all products positive, 6 of 8 terms.
    assert out[2] == 0.75


def test_rolling_median_resists_spike(spark):
    base = dt.datetime(2024, 1, 1, 12, 0)
    counts = [5, 5, 5, 100, 5, 5, 5]
    rows = []
    for d, c in enumerate(counts):
        rows += [("e", base + dt.timedelta(days=d))] * c
    out = rolling_daily_median(_events(spark, rows)).collect()
    spike_day = out[3]
    assert spike_day.cnt == 100
    assert spike_day.med == 5.0  # the median ignores the one spiky day


def test_bm25_term_frequency_orders_equal_length_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark pad"),
            (2, "spark pad pad pad"),
            (3, "pad pad pad pad"),
        ],
        "doc_id bigint, text string",
    )
    out = bm25_scores(docs, terms=("spark",)).collect()
    assert [r.doc_id for r in out] == [1, 2]  # doc 3 never matches
    assert out[0].bm25 > out[1].bm25  # higher tf at equal dl wins
