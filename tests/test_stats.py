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


def test_bm25_null_semantics_pinned_vs_reference(spark):
    """Pin bm25_scores against an inline copy of its formulation on the
    edge cases any future restructuring must preserve (round 9 tried a
    single-tokenize-pass rewrite — measured slower at sf1 AND sf10, see
    OPTIMIZATION_r09.md C2 — and these are the semantics that rewrite
    almost silently changed): a NULL-doc_id doc containing a query term
    feeds df and sum_dl but is excluded from output by the tf⋈dl inner
    join; a NULL-text doc counts only toward n_docs; an empty-text doc
    has one ""-token, so dl=1."""
    from pyspark.sql import functions as F
    from pandasqlite_spark.functions.text import tokens

    docs = spark.createDataFrame(
        [
            (1, "spark window spark pad"),
            (2, "window pad"),
            (3, "pad pad pad"),
            (None, "spark window"),
            (4, None),
            (5, ""),
        ],
        "doc_id bigint, text string",
    )
    terms, k1, b = ("spark", "window"), 1.2, 0.75

    # original formulation, verbatim
    toks = docs.select("doc_id", F.explode(tokens()).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("tok").isin(*terms))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    corpus = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        F.broadcast(dl.agg(F.sum("dl").alias("sum_dl")))
    )
    nd = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / nd
    idf = F.log(
        F.lit(1.0)
        + (nd - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    )
    term_score = idf * ((tfd * F.lit(k1 + 1.0)) / (tfd + norm))
    ref = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
        .collect()
    )
    got = bm25_scores(docs, terms=terms, k1=k1, b=b).collect()
    assert [(r.doc_id, r.bm25) for r in got] == [
        (r.doc_id, r.bm25) for r in ref
    ]
    # the null-id doc must be absent yet have fed df/sum_dl
    assert all(r.doc_id is not None for r in got)
