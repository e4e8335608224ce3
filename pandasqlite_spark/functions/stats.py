"""Distribution / dependence / autocorrelation statistics (SURVEY.md
§2.D extensions).

The moment-based and information-theoretic statistics every corpus or
product-analytics triage runs before training: shape of a numeric
distribution (skewness/kurtosis), dependence between two categorical
columns (pointwise mutual information, chi-square residuals), serial
dependence of a counting process (autocorrelation function), and a
robust trend smoother (rolling median).

Reference parity note: the reference (IBM/pandasqlite) delegates all
analytics to SQLite (`pandasqlite/pandasqlite.py:231-266` executes
arbitrary generated SQL); these keys extend that delegated surface with
the statistics its users would ask the LLM for, re-expressed as
Catalyst-friendly Spark plans.

Cross-engine determinism (driver value-hash contract):

- **Exact integer/decimal accumulation, double only at the end.**
  Every SUM here is over BIGINT/DECIMAL(38,0) — order-free and
  bit-exact in any engine at any partitioning.  The final formula is a
  fixed, fully-parenthesized sequence of IEEE double ops evaluated on
  identical inputs, so both engines produce identical bits (`sqrt`,
  `+`, `*`, `/` are exactly rounded; the only libm call is ``ln`` in
  PMI, absorbed by ROUND(…, 6) like the entropy/lift keys).
- **`m2*sqrt(m2)` instead of `pow(m2, 1.5)`** — `pow` is NOT
  exactly-rounded and differs between Java's Math.pow and libm;
  multiply and sqrt are exact.
- **Marginals via window sums over the aggregated cell table**, not
  scalar-subquery broadcasts: the contingency table is ≤ |types|×|buckets|
  rows, so the unpartitioned window is a constant-size post-aggregation
  step, and the plan has no nested-loop join to allowlist.

Scale notes (100 TB):

- skew-kurtosis: ONE partial-aggregated groupBy; the map side reduces
  every partition to 5 numbers per group before the shuffle — the
  classic one-pass moment sketch.  Power sums accumulate in
  DECIMAL(38,0): exact at 10^12 rows (x ≤ 50 ⇒ Σx⁴ ≤ 6.25e18 ≪ 1e38),
  where a raw BIGINT would sit near its 9.2e18 edge.
- pmi / chi-square: the raw stream collapses to a bounded contingency
  table (|event types| × |buckets| cells) in one partial-aggregated
  groupBy; marginals + total are window sums over those few rows.
- acf: the series is an AGGREGATE (one row per hour) — even 10 years
  of 100 TB telemetry is < 10^5 hours, so the unpartitioned lag window
  runs on a trivially small post-shuffle frame.  Deviations are scaled
  by n (``n·x − S``) to stay integral: no float sums anywhere.
- rolling-median: same shape — the window runs over one row per day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load, load_events, load_events_timeline


# ------------------------------------------------- skewness / kurtosis

def moment_shape_by_group(
    df: DataFrame, group_col: str, value_col
) -> DataFrame:
    """Per-group skewness and excess kurtosis from exact power sums.

    One groupBy computes (n, Σx, Σx², Σx³, Σx⁴) with map-side partial
    aggregation; the central moments come from the standard expansions
    m₂ = r₂−m², m₃ = r₃−3m·r₂+2m³, m₄ = r₄−4m·r₃+6m²·r₂−3m⁴ evaluated
    in double on the exact sums."""
    base = df.select(F.col(group_col).alias("grp"), value_col.alias("x"))
    x = F.col("x")
    agg = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(x.cast("decimal(38,0)")).alias("s1"),
        F.sum((x * x).cast("decimal(38,0)")).alias("s2"),
        F.sum((x * x * x).cast("decimal(38,0)")).alias("s3"),
        F.sum((x * x * x * x).cast("decimal(38,0)")).alias("s4"),
    )
    n = F.col("cnt").cast("double")
    m = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m2 = r2 - m * m
    m3 = (r3 - (F.lit(3.0) * m) * r2) + F.lit(2.0) * ((m * m) * m)
    m4 = ((r4 - (F.lit(4.0) * m) * r3) + (F.lit(6.0) * (m * m)) * r2) - F.lit(
        3.0
    ) * ((m * m) * (m * m))
    return (
        agg.select(
            F.col("grp"),
            F.col("cnt").alias("n_rows"),
            F.round(m, 6).alias("mean_x"),
            F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
            F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("kurtosis_ex"),
        )
        .orderBy("grp")
    )


def q_agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = moment_shape_by_group(
        li, "l_returnflag", F.col("l_quantity").cast("bigint")
    )
    return out.withColumnRenamed("grp", "l_returnflag")


# ------------------------------------------- pointwise mutual information

def pmi_cells(events: DataFrame) -> DataFrame:
    """PMI of (event_type × day-part) — the dependence probe between a
    categorical label and a derived bucket (do errors cluster at
    night?).  Cell/marginal counts are exact; the log ratio is taken on
    a DECIMAL-exact rational, rounded."""
    e = events.select(
        "event_type", F.expr("hour(ts) div 6").cast("int").alias("day_part")
    )
    cells = e.groupBy("event_type", "day_part").agg(F.count(F.lit(1)).alias("c_xy"))
    wx = Window.partitionBy("event_type")
    wy = Window.partitionBy("day_part")
    w0 = Window.partitionBy()
    cells = (
        cells.withColumn("c_x", F.sum("c_xy").over(wx))
        .withColumn("c_y", F.sum("c_xy").over(wy))
        .withColumn("n", F.sum("c_xy").over(w0))
    )
    dec = "decimal(19,0)"
    num = (F.col("c_xy").cast(dec) * F.col("n").cast(dec)).cast("double")
    den = (F.col("c_x").cast(dec) * F.col("c_y").cast(dec)).cast("double")
    p_xy = F.col("c_xy").cast("double") / F.col("n").cast("double")
    pmi = F.log(num / den)
    return cells.select(
        "event_type",
        "day_part",
        "c_xy",
        F.round(pmi, 6).alias("pmi"),
        F.round(p_xy * pmi, 6).alias("mi_term"),
    ).orderBy("event_type", "day_part")


def q_events_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pmi_cells(load_events(spark, sf_dir))


# ------------------------------------------------- chi-square residuals

def chisq_residuals(events: DataFrame) -> DataFrame:
    """Standardized residuals (obs−exp)/√exp of the event_type × weekday
    contingency table — the per-cell view of the χ² independence test
    (|resid| > 2 flags the anomalous cells).  Weekday is
    ``datediff(anchor) % 7`` — pure integer arithmetic, identical in
    any engine/timezone."""
    dow = (
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) % 7
    ).alias("dow")
    cells = (
        events.select("event_type", dow)
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    cells = (
        cells.withColumn("rt", F.sum("obs").over(Window.partitionBy("event_type")))
        .withColumn("ct", F.sum("obs").over(Window.partitionBy("dow")))
        .withColumn("n", F.sum("obs").over(Window.partitionBy()))
    )
    dec = "decimal(19,0)"
    exp = (F.col("rt").cast(dec) * F.col("ct").cast(dec)).cast("double") / F.col(
        "n"
    ).cast("double")
    resid = (F.col("obs").cast("double") - exp) / F.sqrt(exp)
    return cells.select(
        "event_type",
        "dow",
        "obs",
        F.round(exp, 6).alias("expected"),
        F.round(resid, 6).alias("std_resid"),
    ).orderBy("event_type", "dow")


def q_events_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chisq_residuals(load_events(spark, sf_dir))


# ------------------------------------------------------ autocorrelation

ACF_MAX_LAG = 6


def hourly_acf(events: DataFrame, max_lag: int = ACF_MAX_LAG) -> DataFrame:
    """ACF of the hourly event-count series at lags 1..``max_lag`` —
    the seasonality detector (a daily cycle shows as a bump at lag 24).

    Deviations are scaled integral: ``dev_t = n·x_t − S`` (so no float
    mean is ever subtracted); numerators Σ dev_t·dev_{t−k} and the
    denominator Σ dev² accumulate in DECIMAL(38,0), and only the final
    ratio is a double."""
    hc = (
        events.select(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w0 = Window.partitionBy()
    hc = hc.withColumn(
        "dev",
        (F.sum(F.lit(1)).over(w0) * F.col("x") - F.sum("x").over(w0)).cast(
            "decimal(18,0)"
        ),
    )
    wlag = Window.orderBy("hr")
    for k in range(1, max_lag + 1):
        hc = hc.withColumn(f"lag{k}", F.lag("dev", k).over(wlag))
    aggs = [F.sum(F.col("dev") * F.col("dev")).alias("den")]
    for k in range(1, max_lag + 1):
        aggs.append(F.sum(F.col("dev") * F.col(f"lag{k}")).alias(f"num{k}"))
    one = hc.agg(*aggs)
    pairs = ", ".join(
        f"{k}, round(cast(num{k} as double) / cast(den as double), 6)"
        for k in range(1, max_lag + 1)
    )
    return one.selectExpr(f"stack({max_lag}, {pairs}) as (lag, acf)").orderBy("lag")


def q_events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_acf(load_events(spark, sf_dir))


# ------------------------------------------------------- rolling median

def rolling_daily_median(events: DataFrame, half_window: int = 3) -> DataFrame:
    """Centered 7-day rolling median of the daily event count — the
    robust trend line (one spiky day cannot drag it, unlike a moving
    average).  Median over ≤ 7 integer-valued doubles is selection + at
    most one exact midpoint interpolation: bit-identical anywhere.
    Spark disallows ``median()`` over a framed window, so the frame is
    materialized with ``collect_list`` (≤ 2·half_window+1 values — a
    constant-size row-local array) and the midpoint picked exactly."""
    daily = (
        events.select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("day").rowsBetween(-half_window, half_window)
    arr = F.array_sort(F.collect_list(F.col("cnt").cast("double")).over(w))
    med = F.expr(
        "CASE WHEN size(win) % 2 = 1 THEN win[CAST(size(win) / 2 AS INT)] "
        "ELSE (win[CAST(size(win) / 2 AS INT) - 1] "
        "      + win[CAST(size(win) / 2 AS INT)]) / 2.0 END"
    )
    return (
        daily.withColumn("win", arr)
        .withColumn("med", med)
        .select(F.col("day").cast("string").alias("day"), "cnt", "med")
        .orderBy("day")
    )


def q_events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_daily_median(load_events_timeline(spark, sf_dir))


QUERIES = {
    "agg-skew-kurtosis": q_agg_skew_kurtosis,
    "events-pmi-cells": q_events_pmi,
    "events-chisq-residuals": q_events_chisq,
    "events-acf-hourly": q_events_acf,
    "events-rolling-median": q_events_rolling_median,
}

ORACLES = {
    "agg-skew-kurtosis": """
        WITH b AS (
          SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS x
          FROM lineitem),
        a AS (
          SELECT grp, COUNT(*) AS cnt,
                 SUM(CAST(x AS DECIMAL(38,0))) AS s1,
                 SUM(CAST(x*x AS DECIMAL(38,0))) AS s2,
                 SUM(CAST(x*x*x AS DECIMAL(38,0))) AS s3,
                 SUM(CAST(x*x*x*x AS DECIMAL(38,0))) AS s4
          FROM b GROUP BY grp),
        d AS (
          SELECT grp, cnt,
                 CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE) AS m,
                 CAST(s2 AS DOUBLE) / CAST(cnt AS DOUBLE) AS r2,
                 CAST(s3 AS DOUBLE) / CAST(cnt AS DOUBLE) AS r3,
                 CAST(s4 AS DOUBLE) / CAST(cnt AS DOUBLE) AS r4
          FROM a),
        c AS (
          SELECT grp, cnt, m,
                 r2 - m*m AS m2,
                 (r3 - (3.0*m)*r2) + 2.0*((m*m)*m) AS m3,
                 ((r4 - (4.0*m)*r3) + (6.0*(m*m))*r2) - 3.0*((m*m)*(m*m)) AS m4
          FROM d)
        SELECT grp AS l_returnflag, cnt AS n_rows,
               ROUND(m, 6) AS mean_x,
               ROUND(m3 / (m2 * sqrt(m2)), 6) AS skewness,
               ROUND(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_ex
        FROM c ORDER BY grp
    """,
    "events-pmi-cells": """
        WITH e AS (
          SELECT event_type, CAST(hour(ts) // 6 AS INTEGER) AS day_part
          FROM events),
        cells AS (
          SELECT event_type, day_part, COUNT(*) AS c_xy
          FROM e GROUP BY 1, 2),
        m AS (
          SELECT event_type, day_part, c_xy,
                 SUM(c_xy) OVER (PARTITION BY event_type) AS c_x,
                 SUM(c_xy) OVER (PARTITION BY day_part) AS c_y,
                 SUM(c_xy) OVER () AS n
          FROM cells)
        SELECT event_type, day_part, c_xy,
               ROUND(ln(CAST(CAST(c_xy AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)) AS DOUBLE)
                        / CAST(CAST(c_x AS DECIMAL(19,0)) * CAST(c_y AS DECIMAL(19,0)) AS DOUBLE)), 6)
                 AS pmi,
               ROUND((CAST(c_xy AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln(CAST(CAST(c_xy AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)) AS DOUBLE)
                          / CAST(CAST(c_x AS DECIMAL(19,0)) * CAST(c_y AS DECIMAL(19,0)) AS DOUBLE)), 6)
                 AS mi_term
        FROM m ORDER BY event_type, day_part
    """,
    "events-chisq-residuals": """
        WITH e AS (
          SELECT event_type,
                 datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS dow
          FROM events),
        cells AS (
          SELECT event_type, dow, COUNT(*) AS obs FROM e GROUP BY 1, 2),
        m AS (
          SELECT event_type, dow, obs,
                 SUM(obs) OVER (PARTITION BY event_type) AS rt,
                 SUM(obs) OVER (PARTITION BY dow) AS ct,
                 SUM(obs) OVER () AS n
          FROM cells),
        x AS (
          SELECT event_type, dow, obs,
                 CAST(CAST(rt AS DECIMAL(19,0)) * CAST(ct AS DECIMAL(19,0)) AS DOUBLE)
                   / CAST(n AS DOUBLE) AS exp
          FROM m)
        SELECT event_type, dow, obs,
               ROUND(exp, 6) AS expected,
               ROUND((CAST(obs AS DOUBLE) - exp) / sqrt(exp), 6) AS std_resid
        FROM x ORDER BY event_type, dow
    """,
    "events-acf-hourly": """
        WITH hc AS (
          SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS x
          FROM events GROUP BY 1),
        d AS (
          SELECT hr,
                 CAST(SUM(1) OVER () * x - SUM(x) OVER () AS DECIMAL(18,0)) AS dev
          FROM hc),
        l AS (
          SELECT dev,
                 LAG(dev, 1) OVER (ORDER BY hr) AS lag1,
                 LAG(dev, 2) OVER (ORDER BY hr) AS lag2,
                 LAG(dev, 3) OVER (ORDER BY hr) AS lag3,
                 LAG(dev, 4) OVER (ORDER BY hr) AS lag4,
                 LAG(dev, 5) OVER (ORDER BY hr) AS lag5,
                 LAG(dev, 6) OVER (ORDER BY hr) AS lag6
          FROM d),
        a AS (
          SELECT SUM(dev * dev) AS den,
                 SUM(dev * lag1) AS num1, SUM(dev * lag2) AS num2,
                 SUM(dev * lag3) AS num3, SUM(dev * lag4) AS num4,
                 SUM(dev * lag5) AS num5, SUM(dev * lag6) AS num6
          FROM l)
        SELECT v.lag,
               ROUND(CAST(CASE v.lag
                            WHEN 1 THEN num1 WHEN 2 THEN num2 WHEN 3 THEN num3
                            WHEN 4 THEN num4 WHEN 5 THEN num5 WHEN 6 THEN num6
                          END AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
        FROM a, (VALUES (1),(2),(3),(4),(5),(6)) AS v(lag)
        ORDER BY v.lag
    """,
    "events-rolling-median": """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
          FROM events WHERE ts IS NOT NULL GROUP BY 1)
        SELECT CAST(day AS VARCHAR) AS day, cnt,
               median(CAST(cnt AS DOUBLE)) OVER (
                 ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS med
        FROM daily ORDER BY day
    """,
}


# ------------------------------------------------- lagged cross-correlation

CCF_MAX_LAG = 3


def crosscorr_hourly(events: DataFrame, max_lag: int = CCF_MAX_LAG) -> DataFrame:
    """Lagged cross-correlation between the hourly PURCHASE and ERROR
    count series (lags −3..+3) — "do errors lead or lag purchases?",
    the root-cause screening companion of ``events-acf-hourly``.

    Same exactness discipline as the ACF key: both series live on the
    gap-filled hourly grid (so lags align through quiet hours), the
    deviations are INTEGRAL (``n·x − S`` — no float mean), every
    lag-product sum is an exact DECIMAL(38,0), and the only floating
    ops are one double division + sqrt per lag, 6-dp-rounded.  One
    groupBy collapse, one calendar-bounded window chain — the shuffle
    moves |hours| rows."""
    us_per_hour = 3_600_000_000
    hourly = (
        events.select(
            (F.unix_micros("ts") / us_per_hour).cast("bigint").alias("hb"),
            "event_type",
        )
        .groupBy("hb")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("p"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("e"),
        )
    )
    bounds = hourly.agg(F.min("hb").alias("mn"), F.max("hb").alias("mx"))
    grid = bounds.select(F.explode(F.sequence("mn", "mx")).alias("hb"))
    g = grid.join(hourly, "hb", "left").select(
        "hb",
        F.coalesce("p", F.lit(0)).alias("p"),
        F.coalesce("e", F.lit(0)).alias("e"),
    )
    wall = Window.partitionBy()
    dec = "decimal(18,0)"
    d = g.select(
        "hb",
        (F.count(F.lit(1)).over(wall) * F.col("p") - F.sum("p").over(wall))
        .cast(dec)
        .alias("dp"),
        (F.count(F.lit(1)).over(wall) * F.col("e") - F.sum("e").over(wall))
        .cast(dec)
        .alias("de"),
    )
    wo = Window.orderBy("hb")
    lag_cols = [
        F.lead("de", k).over(wo).alias(f"le_{k}") if k >= 0
        else F.lag("de", -k).over(wo).alias(f"le_m{-k}")
        for k in range(-max_lag, max_lag + 1)
    ]
    l = d.select("dp", "de", *lag_cols)
    big = "decimal(38,0)"
    aggs = [
        F.sum((F.col("dp") * F.col("dp")).cast(big)).alias("sdp2"),
        F.sum((F.col("de") * F.col("de")).cast(big)).alias("sde2"),
    ]
    for k in range(-max_lag, max_lag + 1):
        c = f"le_{k}" if k >= 0 else f"le_m{-k}"
        aggs.append(F.sum((F.col("dp") * F.col(c)).cast(big)).alias(f"num_{k + max_lag}"))
    one = l.agg(*aggs)
    den = F.sqrt(F.col("sdp2").cast("double") * F.col("sde2").cast("double"))
    pairs = ", ".join(
        f"{k}, ROUND(CAST(num_{k + max_lag} AS DOUBLE) / den, 6)"
        for k in range(-max_lag, max_lag + 1)
    )
    n_lags = 2 * max_lag + 1
    return (
        one.withColumn("den", den)
        .selectExpr(f"stack({n_lags}, {pairs}) as (lag, ccf)")
        .orderBy("lag")
    )


def q_events_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return crosscorr_hourly(load_events(spark, sf_dir))


QUERIES["events-crosscorr-lagged"] = q_events_crosscorr

ORACLES["events-crosscorr-lagged"] = """
    WITH hourly AS (
      SELECT epoch_us(ts) // 3600000000 AS hb,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS p,
             COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS e
      FROM events GROUP BY 1),
    b AS (SELECT MIN(hb) AS mn, MAX(hb) AS mx FROM hourly),
    grid AS (SELECT unnest(range(mn, mx + 1)) AS hb FROM b),
    g AS (
      SELECT grid.hb, COALESCE(p, 0) AS p, COALESCE(e, 0) AS e
      FROM grid LEFT JOIN hourly USING (hb)),
    d AS (
      SELECT hb,
             CAST(COUNT(*) OVER () * p - SUM(p) OVER () AS DECIMAL(18,0)) AS dp,
             CAST(COUNT(*) OVER () * e - SUM(e) OVER () AS DECIMAL(18,0)) AS de
      FROM g),
    l AS (
      SELECT dp, de,
             LAG(de, 3)  OVER w AS le_m3,
             LAG(de, 2)  OVER w AS le_m2,
             LAG(de, 1)  OVER w AS le_m1,
             de          AS le_0,
             LEAD(de, 1) OVER w AS le_1,
             LEAD(de, 2) OVER w AS le_2,
             LEAD(de, 3) OVER w AS le_3
      FROM d WINDOW w AS (ORDER BY hb)),
    a AS (
      SELECT SUM(CAST(dp * dp AS DECIMAL(38,0))) AS sdp2,
             SUM(CAST(de * de AS DECIMAL(38,0))) AS sde2,
             SUM(CAST(dp * le_m3 AS DECIMAL(38,0))) AS n0,
             SUM(CAST(dp * le_m2 AS DECIMAL(38,0))) AS n1,
             SUM(CAST(dp * le_m1 AS DECIMAL(38,0))) AS n2,
             SUM(CAST(dp * le_0  AS DECIMAL(38,0))) AS n3,
             SUM(CAST(dp * le_1  AS DECIMAL(38,0))) AS n4,
             SUM(CAST(dp * le_2  AS DECIMAL(38,0))) AS n5,
             SUM(CAST(dp * le_3  AS DECIMAL(38,0))) AS n6
      FROM l)
    SELECT v.lag,
           ROUND(CAST(CASE v.lag
                        WHEN -3 THEN n0 WHEN -2 THEN n1 WHEN -1 THEN n2
                        WHEN 0 THEN n3
                        WHEN 1 THEN n4 WHEN 2 THEN n5 WHEN 3 THEN n6
                      END AS DOUBLE)
                 / sqrt(CAST(sdp2 AS DOUBLE) * CAST(sde2 AS DOUBLE)), 6) AS ccf
    FROM a, (VALUES (-3),(-2),(-1),(0),(1),(2),(3)) AS v(lag)
    ORDER BY v.lag
"""


# ------------------------------------------------- Markov entropy rate

def markov_entropy_rate(events: DataFrame) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain:
    ``H = −Σ_{s,t} (c_st/total)·ln(c_st/c_s)`` over observed transition
    counts — how predictable the NEXT event is given the current one
    (journey regularity; also the compressibility bound for sequence
    logs).  Perplexity ``e^H`` is the branching-factor readout.

    Scale shape: one user-partitioned lead window (the same single
    exchange every sequence key shares), then a partial-aggregated
    groupBy onto the ≤|types|² transition cells; the log arithmetic
    runs on those ≤25 rows.  Counts are exact longs; per-cell terms
    follow the ``events-user-entropy`` libm discipline (ROUND at the
    scalar end)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id", "ts", "event_id",
            F.col("event_type").alias("s"),
            F.lead("event_type").over(w).alias("t"),
        )
        .filter(F.col("t").isNotNull())
    )
    cells = pairs.groupBy("s", "t").agg(F.count(F.lit(1)).alias("c_st"))
    rows = cells.groupBy("s").agg(F.sum("c_st").alias("c_s"))
    tot = cells.agg(F.sum("c_st").alias("total"))
    term = (
        F.col("c_st").cast("double") / F.col("total")
    ) * F.log(F.col("c_st").cast("double") / F.col("c_s"))
    h = (
        cells.join(rows, "s")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("total").alias("n_transitions"),
            F.round(-F.sum(term), 6).alias("entropy_rate"),
        )
    )
    return h.select(
        "n_transitions",
        "entropy_rate",
        F.round(F.exp("entropy_rate"), 6).alias("perplexity"),
    )


def q_events_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return markov_entropy_rate(load_events_timeline(spark, sf_dir))


QUERIES["events-markov-entropy-rate"] = q_events_markov_entropy

ORACLES["events-markov-entropy-rate"] = """
    WITH pairs AS (
      SELECT event_type AS s,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
      FROM events WHERE ts IS NOT NULL),
    cells AS (
      SELECT s, t, COUNT(*) AS c_st FROM pairs WHERE t IS NOT NULL GROUP BY 1, 2),
    rs AS (SELECT s, CAST(SUM(c_st) AS BIGINT) AS c_s FROM cells GROUP BY 1),
    tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS total FROM cells),
    h AS (
      SELECT MAX(total) AS n_transitions,
             ROUND(-SUM((CAST(c_st AS DOUBLE) / total)
                        * ln(CAST(c_st AS DOUBLE) / c_s)), 6) AS entropy_rate
      FROM cells JOIN rs USING (s), tot)
    SELECT n_transitions, entropy_rate,
           ROUND(exp(entropy_rate), 6) AS perplexity
    FROM h
"""


def poisson_dispersion(events: DataFrame) -> DataFrame:
    """Index-of-dispersion test on the gap-filled hourly count series:
    ``D = var/mean`` with ``D ≈ 1`` under a Poisson process — the
    formal "is the arrival process actually Poisson?" check behind the
    burst detector's emission model, plus the chi-square-based z
    standardization ``(D·(n−1) − (n−1))/√(2(n−1))`` for a threshold.

    All moments come from exact integer sums over the |hours| grid
    (``var/mean = (n·Σx² − S²)/(n·S)`` — one integer expression, one
    division), so the single output row is engine-exact."""
    us_per_hour = 3_600_000_000
    hourly = (
        events.select((F.unix_micros("ts") / us_per_hour).cast("bigint").alias("hb"))
        .groupBy("hb")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    bounds = hourly.agg(F.min("hb").alias("mn"), F.max("hb").alias("mx"))
    grid = bounds.select(F.explode(F.sequence("mn", "mx")).alias("hb"))
    g = grid.join(hourly, "hb", "left").select(
        F.coalesce("x", F.lit(0)).alias("x")
    )
    a = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    n, s, s2 = F.col("n"), F.col("s"), F.col("s2")
    mean = s.cast("double") / n
    varp = (n * s2 - s * s).cast("double") / (n * n)
    disp = (n * s2 - s * s).cast("double") / (n * s)
    z = (disp * (n - 1).cast("double") - (n - 1).cast("double")) / F.sqrt(
        F.lit(2.0) * (n - 1).cast("double")
    )
    return a.select(
        F.col("n").alias("n_hours"),
        F.round(mean, 6).alias("mean"),
        F.round(varp, 6).alias("variance"),
        F.round(disp, 6).alias("dispersion"),
        # z is undefined below 2 grid hours (sqrt of a non-positive):
        # Spark would emit NaN where DuckDB raises — both sides guard
        F.when(n >= 2, F.round(z, 6)).alias("z_stat"),
    )


def q_events_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return poisson_dispersion(load_events(spark, sf_dir))


QUERIES["events-poisson-dispersion"] = q_events_poisson_dispersion

ORACLES["events-poisson-dispersion"] = """
    WITH hourly AS (
      SELECT epoch_us(ts) // 3600000000 AS hb, COUNT(*) AS x
      FROM events GROUP BY 1),
    b AS (SELECT MIN(hb) AS mn, MAX(hb) AS mx FROM hourly),
    grid AS (SELECT unnest(range(mn, mx + 1)) AS hb FROM b),
    g AS (SELECT COALESCE(x, 0) AS x FROM grid LEFT JOIN hourly USING (hb)),
    a AS (
      SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS s2
      FROM g)
    SELECT n AS n_hours,
           ROUND(CAST(s AS DOUBLE) / n, 6) AS mean,
           ROUND(CAST(n * s2 - s * s AS DOUBLE) / (n * n), 6) AS variance,
           ROUND(CAST(n * s2 - s * s AS DOUBLE) / (n * s), 6) AS dispersion,
           CASE WHEN n >= 2 THEN
             ROUND((CAST(n * s2 - s * s AS DOUBLE) / (n * s) * CAST(n - 1 AS DOUBLE)
                    - CAST(n - 1 AS DOUBLE)) / sqrt(2.0 * CAST(n - 1 AS DOUBLE)),
                   6)
           END AS z_stat
    FROM a
"""


def ols_trend_weekend(events: DataFrame) -> DataFrame:
    """Exact 2-predictor OLS on the daily count series — ``y = β₀ +
    β₁·t + β₂·weekend`` (linear trend + weekend effect) solved in
    closed form via Cramer's rule on the 3×3 normal equations, no MLlib
    and no iterative solver: every X'X / X'y entry is an exact integer
    aggregate, each determinant is exact integer arithmetic, and the
    only floating ops are the three β divisions and the R² ratio.
    The multi-feature upgrade of ``agg-linreg-exact``.

    Scale shape: ONE partial-aggregated pass over the |days| grid
    collapses everything to 10 integers; the algebra runs on that
    single row.  At 100 TB the same closed form fits any p≪n regression
    whose moment matrix fits a row — the groupBy is the whole cost."""
    daily = (
        events.select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    anchor = F.lit("2024-01-01").cast("date")
    d = daily.select(
        F.datediff(F.col("day"), anchor).alias("t"),
        (F.datediff(F.col("day"), anchor) % 7 >= 5).cast("bigint").alias("w"),
        F.col("y").cast("bigint").alias("y"),
    )
    a = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("w").alias("sw"),
        F.sum(F.col("t") * F.col("t")).alias("st2"),
        F.sum(F.col("t") * F.col("w")).alias("stw"),
        F.sum(F.col("w") * F.col("w")).alias("sw2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("w") * F.col("y")).alias("swy"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    n, st, sw = F.col("n"), F.col("st"), F.col("sw")
    st2, stw, sw2 = F.col("st2"), F.col("stw"), F.col("sw2")
    sy, sty, swy, sy2 = F.col("sy"), F.col("sty"), F.col("swy"), F.col("sy2")
    det = (
        n * (st2 * sw2 - stw * stw)
        - st * (st * sw2 - stw * sw)
        + sw * (st * stw - st2 * sw)
    )
    det0 = (
        sy * (st2 * sw2 - stw * stw)
        - st * (sty * sw2 - stw * swy)
        + sw * (sty * stw - st2 * swy)
    )
    det1 = (
        n * (sty * sw2 - stw * swy)
        - sy * (st * sw2 - stw * sw)
        + sw * (st * swy - sty * sw)
    )
    det2 = (
        n * (st2 * swy - sty * stw)
        - st * (st * swy - sty * sw)
        + sy * (st * stw - st2 * sw)
    )
    sse_num = det * sy2 - (det0 * sy + det1 * sty + det2 * swy)
    sst_num = n * sy2 - sy * sy
    r2 = F.lit(1.0) - (n * sse_num).cast("double") / (det * sst_num).cast("double")
    return a.select(
        F.col("n").alias("n_days"),
        F.round(det0.cast("double") / det.cast("double"), 6).alias("beta0"),
        F.round(det1.cast("double") / det.cast("double"), 6).alias("beta1_trend"),
        F.round(det2.cast("double") / det.cast("double"), 6).alias("beta2_weekend"),
        F.round(r2, 6).alias("r2"),
    )


def q_events_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ols_trend_weekend(load_events(spark, sf_dir))


QUERIES["events-ols-trend-weekend"] = q_events_ols

ORACLES["events-ols-trend-weekend"] = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y FROM events GROUP BY 1),
    d AS (
      SELECT date_diff('day', DATE '2024-01-01', day) AS t,
             CAST(date_diff('day', DATE '2024-01-01', day) % 7 >= 5 AS BIGINT) AS w,
             CAST(y AS BIGINT) AS y
      FROM daily),
    a AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(w) AS BIGINT) AS sw,
             CAST(SUM(t*t) AS BIGINT) AS st2, CAST(SUM(t*w) AS BIGINT) AS stw,
             CAST(SUM(w*w) AS BIGINT) AS sw2,
             CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(t*y) AS BIGINT) AS sty,
             CAST(SUM(w*y) AS BIGINT) AS swy, CAST(SUM(y*y) AS BIGINT) AS sy2
      FROM d),
    k AS (
      SELECT *,
             n*(st2*sw2 - stw*stw) - st*(st*sw2 - stw*sw) + sw*(st*stw - st2*sw) AS det,
             sy*(st2*sw2 - stw*stw) - st*(sty*sw2 - stw*swy) + sw*(sty*stw - st2*swy) AS det0,
             n*(sty*sw2 - stw*swy) - sy*(st*sw2 - stw*sw) + sw*(st*swy - sty*sw) AS det1,
             n*(st2*swy - sty*stw) - st*(st*swy - sty*sw) + sy*(st*stw - st2*sw) AS det2
      FROM a)
    SELECT n AS n_days,
           ROUND(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS beta0,
           ROUND(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS beta1_trend,
           ROUND(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS beta2_weekend,
           ROUND(1.0 - CAST(n * (det*sy2 - (det0*sy + det1*sty + det2*swy)) AS DOUBLE)
                       / CAST(det * (n*sy2 - sy*sy) AS DOUBLE), 6) AS r2
    FROM k
"""


KS_CUT = "2024-01-16"


def ks_two_sample(events: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test on purchase values,
    first half-month vs second — the distribution-FREE companion to the
    binned PSI and the mean-only Welch t: ``D = max|F₁(v) − F₂(v)|``
    over the pooled support, sensitive to any shape change.

    Exactness: the sup runs over DISTINCT pooled values with cumulative
    tie-inclusive counts, and the argmax compares the INTEGER
    cross-product ``|c₁·n₂ − c₂·n₁|`` — no float ever enters the max;
    D and the scaled statistic are single divisions off the exact
    integer winner.  Scale shape: one groupBy on value (the collapse),
    one ordered window over the \\|distinct values\\| rows."""
    cut = F.lit(KS_CUT).cast("date")
    p = events.filter(F.col("event_type") == "purchase").select(
        (F.to_date("ts") < cut).alias("is_pre"),
        F.col("value").cast("decimal(10,2)").alias("v"),
    )
    per_v = p.groupBy("v").agg(
        F.count(F.when(F.col("is_pre"), 1)).alias("a"),
        F.count(F.when(~F.col("is_pre"), 1)).alias("b"),
    )
    wall = Window.partitionBy()
    word = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = per_v.select(
        "v",
        F.sum("a").over(word).alias("c1"),
        F.sum("b").over(word).alias("c2"),
        F.sum("a").over(wall).alias("n1"),
        F.sum("b").over(wall).alias("n2"),
    )
    c = c.withColumn(
        "gap", F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    ).withColumn("mx", F.max("gap").over(wall))
    d = F.col("mx").cast("double") / (F.col("n1") * F.col("n2")).cast("double")
    scaled = d * F.sqrt(
        (F.col("n1") * F.col("n2")).cast("double")
        / (F.col("n1") + F.col("n2")).cast("double")
    )
    return (
        c.filter(F.col("gap") == F.col("mx"))
        .groupBy("n1", "n2", "mx")
        .agg(F.min("v").alias("at_value"))
        .select(
            F.col("n1").cast("bigint").alias("n_pre"),
            F.col("n2").cast("bigint").alias("n_post"),
            F.col("at_value").cast("double").alias("at_value"),
            F.round(d, 6).alias("d_stat"),
            F.round(scaled, 6).alias("ks_scaled"),
        )
    )


def q_events_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ks_two_sample(load_events(spark, sf_dir))


QUERIES["events-drift-ks"] = q_events_ks

ORACLES["events-drift-ks"] = """
    WITH p AS (
      SELECT CAST(ts AS DATE) < DATE '2024-01-16' AS is_pre,
             CAST(value AS DECIMAL(10,2)) AS v
      FROM events WHERE event_type = 'purchase'),
    per_v AS (
      SELECT v,
             COUNT(CASE WHEN is_pre THEN 1 END) AS a,
             COUNT(CASE WHEN NOT is_pre THEN 1 END) AS b
      FROM p GROUP BY 1),
    c AS (
      SELECT v,
             SUM(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c1,
             SUM(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c2,
             SUM(a) OVER () AS n1, SUM(b) OVER () AS n2
      FROM per_v),
    g AS (
      SELECT *, abs(c1 * n2 - c2 * n1) AS gap, MAX(abs(c1 * n2 - c2 * n1)) OVER () AS mx
      FROM c)
    SELECT CAST(n1 AS BIGINT) AS n_pre, CAST(n2 AS BIGINT) AS n_post,
           CAST(MIN(v) AS DOUBLE) AS at_value,
           ROUND(CAST(mx AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat,
           ROUND(CAST(mx AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                        / CAST(n1 + n2 AS DOUBLE)), 6) AS ks_scaled
    FROM g WHERE gap = mx
    GROUP BY n1, n2, mx
"""


def mann_whitney_u(events: DataFrame) -> DataFrame:
    """Mann-Whitney U (rank-sum) test comparing purchase values pre/post
    the mid-month cut — the rank-based two-sample test that pairs with
    ``events-drift-ks`` (KS: any shape change; MWU: stochastic
    dominance) and needs no normality, completing the nonparametric
    drift kit.

    Exactness: tie-averaged ranks are exact half-integers (DECIMAL —
    ``(2·cum_before + t + 1)/2`` from integer tie-group counts), the
    rank sum is an exact decimal aggregate, U derives by integer
    algebra, and the tie-corrected normal z is one fixed IEEE
    expression over those integers.  Scale shape: one groupBy on value
    (the collapse), one window over \\|distinct values\\| rows — same
    shape as the KS key."""
    cut = F.lit(KS_CUT).cast("date")
    p = events.filter(F.col("event_type") == "purchase").select(
        (F.to_date("ts") < cut).alias("is_pre"),
        F.col("value").cast("decimal(10,2)").alias("v"),
    )
    per_v = p.groupBy("v").agg(
        F.count(F.when(F.col("is_pre"), 1)).alias("a"),
        F.count(F.lit(1)).alias("t"),
    )
    word = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    r = per_v.select(
        "v", "a", "t",
        F.coalesce(F.sum("t").over(word), F.lit(0)).alias("cum"),
        F.sum("a").over(wall).alias("n1"),
        F.sum("t").over(wall).alias("n"),
        F.sum((F.col("t") * F.col("t") * F.col("t") - F.col("t"))).over(wall).alias(
            "tie3"
        ),
    )
    # tie-averaged rank of every member of this value group, ×2 to stay
    # integral: 2·rank = 2·cum + t + 1
    rank2 = 2 * F.col("cum") + F.col("t") + 1
    agg = r.agg(
        F.sum(F.col("a") * rank2).alias("r1x2"),
        F.max("n1").alias("n1"),
        F.max("n").alias("n"),
        F.max("tie3").alias("tie3"),
    )
    n1, n, r1x2, tie3 = F.col("n1"), F.col("n"), F.col("r1x2"), F.col("tie3")
    n2 = n - n1
    u1x2 = 2 * n1 * n2 + n1 * (n1 + 1) - r1x2  # 2·U1
    mu_x2 = n1 * n2  # 2·mean(U) = n1·n2 ... (mean U = n1n2/2)
    var = (
        (n1 * n2).cast("double")
        / 12.0
        * ((n + 1).cast("double") - tie3.cast("double") / (n * (n - 1)).cast("double"))
    )
    z = (u1x2 - mu_x2).cast("double") / (F.lit(2.0) * F.sqrt(var))
    return agg.select(
        n1.cast("bigint").alias("n_pre"),
        n2.cast("bigint").alias("n_post"),
        (u1x2.cast("double") / 2).alias("u_stat"),
        F.round(z, 6).alias("z_stat"),
    )


def q_events_mwu(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mann_whitney_u(load_events(spark, sf_dir))


QUERIES["events-mann-whitney"] = q_events_mwu

ORACLES["events-mann-whitney"] = """
    WITH p AS (
      SELECT CAST(ts AS DATE) < DATE '2024-01-16' AS is_pre,
             CAST(value AS DECIMAL(10,2)) AS v
      FROM events WHERE event_type = 'purchase'),
    per_v AS (
      SELECT v,
             COUNT(CASE WHEN is_pre THEN 1 END) AS a,
             COUNT(*) AS t
      FROM p GROUP BY 1),
    r AS (
      SELECT v, a, t,
             COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cum,
             SUM(a) OVER () AS n1, SUM(t) OVER () AS n,
             SUM(t * t * t - t) OVER () AS tie3
      FROM per_v),
    agg AS (
      SELECT CAST(SUM(a * (2 * cum + t + 1)) AS BIGINT) AS r1x2,
             CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(tie3) AS BIGINT) AS tie3
      FROM r)
    SELECT n1 AS n_pre, (n - n1) AS n_post,
           CAST(2 * n1 * (n - n1) + n1 * (n1 + 1) - r1x2 AS DOUBLE) / 2 AS u_stat,
           ROUND(CAST((2 * n1 * (n - n1) + n1 * (n1 + 1) - r1x2) - n1 * (n - n1) AS DOUBLE)
                 / (2.0 * sqrt(CAST(n1 * (n - n1) AS DOUBLE) / 12.0
                               * (CAST(n + 1 AS DOUBLE)
                                  - CAST(tie3 AS DOUBLE)
                                    / CAST(n * (n - 1) AS DOUBLE)))), 6) AS z_stat
    FROM agg
"""


def interarrival_burstiness(events: DataFrame) -> DataFrame:
    """Goh–Barabási burstiness of the event arrival process, per event
    type: ``B = (σ − μ)/(σ + μ)`` over interarrival times (B = −1
    periodic, 0 Poisson, → 1 bursty) — the interarrival-domain
    companion to ``events-poisson-dispersion``'s count-domain check.

    Scale shape: one lag window per type (the sequence-key exchange),
    then exact integer microsecond gaps feed one moment aggregate per
    type; σ/μ/B are fixed IEEE expressions over those integers."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # millisecond gaps: hour-scale microsecond gaps squared overflow
    # INT64; floor-division is identical in both engines
    ms = (F.unix_micros("ts") / 1000).cast("bigint")
    gaps = (
        events.select(
            "event_type",
            (ms - F.lag(ms).over(w)).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    m = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("s"),
        F.sum(F.col("g") * F.col("g")).alias("s2"),
    )
    dec = "decimal(38,0)"
    n, s, s2 = F.col("n"), F.col("s").cast(dec), F.col("s2").cast(dec)
    mu = s.cast("double") / F.col("n")
    sigma = (
        F.sqrt((F.col("n") * s2 - s * s).cast("double")) / F.col("n").cast("double")
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.round(mu / 1e3, 6).alias("mean_gap_s"),
        F.round(sigma / 1e3, 6).alias("std_gap_s"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    ).orderBy("event_type")


def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interarrival_burstiness(load_events(spark, sf_dir))


QUERIES["events-interarrival-burstiness"] = q_events_burstiness

ORACLES["events-interarrival-burstiness"] = """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) // 1000 - LAG(epoch_us(ts) // 1000) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS g
      FROM events),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(g) AS DECIMAL(38,0)) AS s,
             CAST(SUM(g*g) AS DECIMAL(38,0)) AS s2
      FROM gaps WHERE g IS NOT NULL GROUP BY 1)
    SELECT event_type, n AS n_gaps,
           ROUND(CAST(s AS DOUBLE) / n / 1e3, 6) AS mean_gap_s,
           ROUND(sqrt(CAST(n * s2 - s * s AS DOUBLE)) / CAST(n AS DOUBLE) / 1e3, 6)
             AS std_gap_s,
           ROUND((sqrt(CAST(n * s2 - s * s AS DOUBLE)) / CAST(n AS DOUBLE)
                  - CAST(s AS DOUBLE) / n)
                 / (sqrt(CAST(n * s2 - s * s AS DOUBLE)) / CAST(n AS DOUBLE)
                    + CAST(s AS DOUBLE) / n), 6) AS burstiness
    FROM m ORDER BY event_type
"""


CI_CUT = "2024-01-22"


def q_events_causal_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CausalImpact-lite: fit the exact trend+weekend OLS
    (``events-ols-trend-weekend``'s closed form) on PRE-period days
    only, project it over the POST period as the counterfactual, and
    emit per-day actual − predicted plus the running cumulative effect
    — the structural version of DiD when there is no control arm.

    Determinism: βs are Cramer ratios of exact integer determinants
    from the pre-period collapse; each prediction is one fixed IEEE
    expression per day; the cumulative effect is an ORDERED running sum
    (same order both engines).  Scale shape: one |days| collapse, a
    1-row model broadcast, one calendar window."""
    daily = (
        load_events(spark, sf_dir)
        .select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    anchor = F.lit("2024-01-01").cast("date")
    cut = F.lit(CI_CUT).cast("date")
    d = daily.select(
        "day",
        F.datediff(F.col("day"), anchor).alias("t"),
        (F.datediff(F.col("day"), anchor) % 7 >= 5).cast("bigint").alias("wk"),
        F.col("y").cast("bigint").alias("y"),
    )
    pre = d.filter(F.col("day") < cut)
    a = pre.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("wk").alias("sw"),
        F.sum(F.col("t") * F.col("t")).alias("st2"),
        F.sum(F.col("t") * F.col("wk")).alias("stw"),
        F.sum(F.col("wk") * F.col("wk")).alias("sw2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("wk") * F.col("y")).alias("swy"),
    )
    n, st, sw = F.col("n"), F.col("st"), F.col("sw")
    st2, stw, sw2 = F.col("st2"), F.col("stw"), F.col("sw2")
    sy, sty, swy = F.col("sy"), F.col("sty"), F.col("swy")
    det = (
        n * (st2 * sw2 - stw * stw)
        - st * (st * sw2 - stw * sw)
        + sw * (st * stw - st2 * sw)
    )
    det0 = (
        sy * (st2 * sw2 - stw * stw)
        - st * (sty * sw2 - stw * swy)
        + sw * (sty * stw - st2 * swy)
    )
    det1 = (
        n * (sty * sw2 - stw * swy)
        - sy * (st * sw2 - stw * sw)
        + sw * (st * swy - sty * sw)
    )
    det2 = (
        n * (st2 * swy - sty * stw)
        - st * (st * swy - sty * sw)
        + sy * (st * stw - st2 * sw)
    )
    model = a.select(
        (det0.cast("double") / det.cast("double")).alias("b0"),
        (det1.cast("double") / det.cast("double")).alias("b1"),
        (det2.cast("double") / det.cast("double")).alias("b2"),
    )
    post = d.filter(F.col("day") >= cut).crossJoin(F.broadcast(model))
    pred = F.col("b0") + F.col("b1") * F.col("t") + F.col("b2") * F.col("wk")
    eff = F.col("y").cast("double") - pred
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    scored = post.select(
        F.col("day").cast("string").alias("day"),
        "y",
        F.round(pred, 6).alias("predicted"),
        F.round(eff, 6).alias("effect"),
        F.round(F.sum(eff).over(wcum), 6).alias("cum_effect"),
    )
    return scored.orderBy("day")


QUERIES["events-causal-impact"] = q_events_causal_impact

ORACLES["events-causal-impact"] = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y FROM events GROUP BY 1),
    d AS (
      SELECT day,
             date_diff('day', DATE '2024-01-01', day) AS t,
             CAST(date_diff('day', DATE '2024-01-01', day) % 7 >= 5 AS BIGINT) AS wk,
             CAST(y AS BIGINT) AS y
      FROM daily),
    a AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(wk) AS BIGINT) AS sw,
             CAST(SUM(t*t) AS BIGINT) AS st2, CAST(SUM(t*wk) AS BIGINT) AS stw,
             CAST(SUM(wk*wk) AS BIGINT) AS sw2,
             CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(t*y) AS BIGINT) AS sty,
             CAST(SUM(wk*y) AS BIGINT) AS swy
      FROM d WHERE day < DATE '2024-01-22'),
    k AS (
      SELECT
        CAST(sy*(st2*sw2 - stw*stw) - st*(sty*sw2 - stw*swy) + sw*(sty*stw - st2*swy)
             AS DOUBLE)
          / CAST(n*(st2*sw2 - stw*stw) - st*(st*sw2 - stw*sw) + sw*(st*stw - st2*sw)
                 AS DOUBLE) AS b0,
        CAST(n*(sty*sw2 - stw*swy) - sy*(st*sw2 - stw*sw) + sw*(st*swy - sty*sw)
             AS DOUBLE)
          / CAST(n*(st2*sw2 - stw*stw) - st*(st*sw2 - stw*sw) + sw*(st*stw - st2*sw)
                 AS DOUBLE) AS b1,
        CAST(n*(st2*swy - sty*stw) - st*(st*swy - sty*sw) + sy*(st*stw - st2*sw)
             AS DOUBLE)
          / CAST(n*(st2*sw2 - stw*stw) - st*(st*sw2 - stw*sw) + sw*(st*stw - st2*sw)
                 AS DOUBLE) AS b2
      FROM a),
    post AS (
      SELECT d.day, d.y,
             k.b0 + k.b1 * d.t + k.b2 * d.wk AS pred,
             CAST(d.y AS DOUBLE) - (k.b0 + k.b1 * d.t + k.b2 * d.wk) AS eff
      FROM d, k WHERE d.day >= DATE '2024-01-22')
    SELECT CAST(day AS VARCHAR) AS day, y,
           ROUND(pred, 6) AS predicted,
           ROUND(eff, 6) AS effect,
           ROUND(SUM(eff) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 6)
             AS cum_effect
    FROM post ORDER BY day
"""
