"""Time-series downsampling and interpolation over the events table
(SURVEY.md §2.D extensions).

Two operators every metrics / sensor / training-telemetry pipeline
needs but plain groupBy can't express:

- **OHLC bars** (`events-ohlc`): per-user hourly open/high/low/close
  downsampling.  Open/close need *positional* selection (first/last
  event in the bucket), done with a single min/max over a
  ``struct(us, event_id, value)`` — the (us, event_id) prefix is a
  unique total order, so the struct extreme IS the first/last row,
  deterministically, in ONE partial-aggregated groupBy (no window, no
  second shuffle, no nondeterministic ``first()``).
- **Linear interpolation** (`events-interpolate-linear`): dense hourly
  grid per user for one day where missing hours get the straight-line
  value between the neighbouring observed hours — the standard gap
  repair before feeding a model.  Builds on the same grid technique as
  :func:`pandasqlite_spark.streaming.events.gapfill_hourly` but
  replaces carry-forward with two-sided interpolation.

Reference parity: the reference (IBM/pandasqlite) delegates all SQL to
SQLite (`pandasqlite/pandasqlite.py:231-266`); neither op is
expressible in its delegated surface without window functions, which
its LLM does emit — these keys give that surface a native, scale-safe
implementation.

Cross-engine determinism (driver value-hash contract):

- OHLC selects *existing* double bits (no float arithmetic at all):
  min/max/first/last of stored values are bit-identical across engines.
- Interpolation computes ``prev + (next - prev) * (hr - prev_hr) /
  (next_hr - prev_hr)`` on identical doubles in the same order in both
  engines, then rounds to 6 dp to absorb any last-ulp division drift.
- Knot value per hour is MAX(value) — order-independent selection, not
  an order-dependent AVG over doubles.

Scale notes (100 TB):

- events-ohlc: one shuffle on (user_id, hour-bucket); map-side combine
  reduces each bucket to a single struct before the exchange, so the
  shuffle moves O(|buckets|), not O(|events|).  Skewed users are
  still split across *buckets* (the key includes the hour), which is
  what caps per-reducer state.
- events-interpolate-linear: grid is |users|×24 (tiny next to the
  event table); the two windows per user are 24 rows deep — bounded
  frames, no mega-partition risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pandasqlite_spark.operators.common import load_events, load_events_timeline


def ohlc_hourly(events: DataFrame) -> DataFrame:
    """Per-user hourly OHLC bars over the full table.

    ``hr_bucket`` is the integer hour index ``floor(unix_micros /
    3_600_000_000)`` — an epoch-based integer, immune to session
    time-zone configuration on either engine.
    """
    us_per_hour = 3_600_000_000
    ev = events.select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros("ts").alias("us"),
    ).withColumn("hr_bucket", (F.col("us") / us_per_hour).cast("bigint"))
    # (us, event_id) is a unique total order within a bucket, so the
    # struct min/max pick the first/last event deterministically.
    first_s = F.min(F.struct("us", "event_id", "value"))
    last_s = F.max(F.struct("us", "event_id", "value"))
    return (
        ev.groupBy("user_id", "hr_bucket")
        .agg(
            first_s.getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last_s.getField("value").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "hr_bucket")
    )


def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlc_hourly(load_events(spark, sf_dir))


def interpolate_hourly(events: DataFrame, day: str = "2024-01-15") -> DataFrame:
    """Dense hourly grid per user for one day; missing hours get the
    linear interpolation between the neighbouring observed hours.

    The per-hour knot is MAX(value) (order-independent selection —
    see module docstring).  Hours before the first / after the last
    knot carry the nearest knot (no extrapolation).
    """
    ev = events.filter(F.to_date("ts") == F.lit(day).cast("date")).select(
        "user_id", F.hour("ts").alias("hr"), "value"
    )
    knots = ev.groupBy("user_id", "hr").agg(F.max("value").alias("knot"))
    hours = F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hr")
    grid = knots.select("user_id").distinct().select("user_id", hours)
    g = grid.join(knots, ["user_id", "hr"], "left")
    fwd = W.partitionBy("user_id").orderBy("hr").rowsBetween(W.unboundedPreceding, W.currentRow)
    bwd = W.partitionBy("user_id").orderBy("hr").rowsBetween(W.currentRow, W.unboundedFollowing)
    known_hr = F.when(F.col("knot").isNotNull(), F.col("hr"))
    g = g.select(
        "user_id",
        "hr",
        "knot",
        F.last("knot", ignorenulls=True).over(fwd).alias("pv"),
        F.last(known_hr, ignorenulls=True).over(fwd).alias("ph"),
        F.first("knot", ignorenulls=True).over(bwd).alias("nv"),
        F.first(known_hr, ignorenulls=True).over(bwd).alias("nh"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("hr") - F.col("ph")) / (F.col("nh") - F.col("ph"))
    )
    filled = (
        F.when(F.col("knot").isNotNull(), F.col("knot"))
        .when(F.col("ph").isNull(), F.col("nv"))
        .when(F.col("nh").isNull(), F.col("pv"))
        .otherwise(interp)
    )
    return grid.join(
        g.select("user_id", "hr", F.round(filled, 6).alias("filled_value")),
        ["user_id", "hr"],
    ).orderBy("user_id", "hr")


def q_events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interpolate_hourly(load_events(spark, sf_dir))


def rate_limit_first(events: DataFrame, window_s: int = 60) -> DataFrame:
    """Throttle to the first event per (user, type, window): the kept
    event's id plus how many were suppressed — the dedup/sampling
    primitive for alert streams and telemetry downsampling.

    Same deterministic-positional-pick trick as :func:`ohlc_hourly`:
    ``min(struct(us, event_id))`` inside the one partial-aggregated
    groupBy selects the earliest event (total order, no window, no
    nondeterministic ``first()``).  The shuffle moves one struct per
    bucket; a hot user splits across time buckets.
    """
    us_per_win = window_s * 1_000_000
    ev = events.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
    ).withColumn("win_bucket", (F.col("us") / us_per_win).cast("bigint"))
    return (
        ev.groupBy("user_id", "event_type", "win_bucket")
        .agg(
            F.min(F.struct("us", "event_id")).getField("event_id").alias("kept_event_id"),
            (F.count(F.lit(1)) - 1).alias("n_suppressed"),
        )
        .orderBy("user_id", "event_type", "win_bucket")
    )


def q_events_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rate_limit_first(load_events(spark, sf_dir))


def ewma_hourly(events: DataFrame, half_life_hours: int = 1, span: int = 8) -> DataFrame:
    """Exponentially-weighted moving average of hourly volume per user
    — the trend/smoothing primitive (pandas ``ewm``, monitoring
    dashboards, anomaly baselines).

    True EWMA is a sequential recurrence (state_t = α·x_t +
    (1-α)·state_{t-1}) — hostile to distributed evaluation.  With
    half-life decay the weights are powers of two, so truncating the
    tail at ``span`` hours makes the whole thing a *bounded windowed
    fold*: weight ``2^(span - Δhours)`` per observed hour, numerator
    and denominator both **exact integers/decimals** (a power-of-two
    weight times a DECIMAL is exact; the sum is order-independent), one
    double division at the end.  No recurrence, no sequential scan —
    each output row folds ≤ span window rows, and the only shuffle is
    the per-user hour aggregation (same Exchange the OHLC bars use).
    Rows more than ``span`` hours back carry weight < 2⁰ of the 2⁸
    current-hour weight — below the truncation error a float EWMA
    accumulates anyway.
    """
    us_per_hour = 3_600_000_000
    hourly = (
        events.select(
            "user_id",
            (F.unix_micros("ts") / us_per_hour).cast("bigint").alias("hb"),
            F.col("value").cast("decimal(18,4)").alias("v"),
        )
        .groupBy("user_id", "hb")
        .agg(F.sum("v").alias("v"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hb")
        .rangeBetween(-(span - 1), 0)
    )
    arr = F.collect_list(F.struct("hb", "v")).over(w)
    # 2^(span - Δ), Δ ∈ [0, span-1] — pow(2, k) is IEEE-exact for
    # small integer k, so the bigint weight is deterministic
    weight = lambda s: F.pow(  # noqa: E731
        F.lit(2.0), (F.lit(span) - (F.col("hb") - s.hb)).cast("double")
    ).cast("bigint")
    num = F.aggregate(
        arr,
        F.lit(0).cast("decimal(30,4)"),
        lambda acc, s: (acc + s.v * weight(s)).cast("decimal(30,4)"),
    )
    den = F.aggregate(
        arr, F.lit(0).cast("bigint"), lambda acc, s: acc + weight(s)
    )
    return hourly.select(
        "user_id",
        F.col("hb").alias("hr_bucket"),
        (num.cast("double") / den.cast("double")).alias("ewma"),
    )


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_hourly(load_events_timeline(spark, sf_dir))


def trajectory_topk(
    events: DataFrame, query_user: int = 1, day: str = "2024-01-15", k: int = 5
) -> DataFrame:
    """Top-k users whose daily activity *trajectory* is closest to a
    query user's (cf. REPOSE, ICDE 2021 — distributed top-k trajectory
    similarity; here the trajectory is the 24-point hourly volume
    profile for one day and similarity is exact squared-L2).

    Spark shape: trajectories never materialize as arrays — the
    distance Σ(vₐ−v_b)² computes on the LONG (user, hour, volume) form
    by broadcasting the query user's 24 rows, joining on hour
    (zero-filled via the dense grid, so missing hours count), and one
    partial-aggregated groupBy(user).  Decimal volumes ⇒ exact integer
    distances ⇒ deterministic TakeOrderedAndProject top-k.  At 100 TB
    the per-user profile aggregation is the only big shuffle; the
    query side is O(24) rows."""
    ev = events.filter(F.to_date("ts") == F.lit(day).cast("date")).select(
        "user_id",
        F.hour("ts").alias("hr"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    vol = ev.groupBy("user_id", "hr").agg(F.sum("v").alias("v"))
    users = vol.select("user_id").distinct()
    grid = users.crossJoin(
        F.broadcast(
            vol.sparkSession.range(0, 24).select(F.col("id").cast("int").alias("hr"))
        )
    )
    dense = grid.join(vol, ["user_id", "hr"], "left").select(
        "user_id", "hr", F.coalesce("v", F.lit(0).cast("decimal(18,4)")).alias("v")
    )
    q = dense.filter(F.col("user_id") == query_user).select(
        "hr", F.col("v").alias("qv")
    )
    return (
        dense.filter(F.col("user_id") != query_user)
        .join(F.broadcast(q), "hr")
        .groupBy("user_id")
        .agg(
            F.sum((F.col("v") - F.col("qv")) * (F.col("v") - F.col("qv")))
            .cast("double")
            .alias("dist_sq")
        )
        .orderBy("dist_sq", "user_id")
        .limit(k)
    )


def q_events_trajectory_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trajectory_topk(load_events(spark, sf_dir))


def sliding_distinct_users(events: DataFrame) -> DataFrame:
    """Exact distinct users per sliding 2-hour window (1-hour slide) —
    the overlapping-window COUNT(DISTINCT) that naive
    ``groupBy(window(...)).countDistinct`` answers by replaying every
    EVENT into every window it touches.  The scale-correct composition
    dedups first at the finest granularity: events collapse to
    distinct (user, hour) pairs (the big shuffle, but heavily
    combinable map-side), each pair fans out to the window/slide = 2
    windows containing it (row-local explode), and a second distinct
    + count runs over the tiny pair set.  Every window covers hours
    {ws, ws+1}; ``ws`` is the epoch-hour index of the window start."""
    us_per_hour = 3_600_000_000
    uh = (
        events.select(
            "user_id",
            (F.unix_micros("ts") / us_per_hour).cast("bigint").alias("hr"),
        )
        .distinct()
    )
    fan = uh.select(
        "user_id", F.explode(F.array(F.col("hr"), F.col("hr") - 1)).alias("ws")
    )
    return (
        fan.distinct()
        .groupBy("ws")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("ws")
    )


def q_events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_distinct_users(load_events(spark, sf_dir))


def forecast_backtest(events: DataFrame) -> DataFrame:
    """Seasonal-naive forecast with an honest backtest — the baseline
    every demand/traffic forecasting pipeline starts from: per
    event_type, predict each test-week day's event count as the mean of
    the same weekday over the 3 training weeks, then score MAPE on the
    held-out week.

    Scale shape: the raw stream collapses to (day, type) counts in one
    partial-aggregated groupBy; the model is |types|×7 rows and
    broadcasts onto the 7-day test slice; weekday is computed as
    ``datediff(anchor) % 7`` — pure integer arithmetic, identical in
    any engine/timezone (vs dayofweek()'s engine-specific numbering)."""
    daily = (
        events.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dow = (F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) % 7).alias("dow")
    split = F.lit("2024-01-22").cast("date")
    model = (
        daily.filter(F.col("day") < split)
        .select("event_type", dow, "n")
        .groupBy("event_type", "dow")
        .agg((F.sum("n") / F.count(F.lit(1))).alias("pred"))
    )
    test = daily.filter(
        (F.col("day") >= split) & (F.col("day") < F.lit("2024-01-29").cast("date"))
    ).select("event_type", dow, "n")
    return (
        test.join(F.broadcast(model), ["event_type", "dow"])
        .groupBy("event_type")
        .agg(
            F.round(F.avg(F.abs(F.col("n") - F.col("pred")) / F.col("n")), 6).alias(
                "mape"
            ),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("event_type")
    )


def q_events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return forecast_backtest(load_events(spark, sf_dir))


def incremental_agg_merge(events: DataFrame) -> DataFrame:
    """Incremental view maintenance for additive aggregates — the
    pattern that keeps a 100 TB rollup fresh without re-scanning
    history: the BASE window (days ≤ 20) materializes per-(day, type)
    partials (count + decimal sum), the DELTA (days > 20) computes the
    same partials over new data only, and the merged view is the
    union's re-aggregation — touching |partials| rows, never base
    events.  Count/sum/avg are all derivable from the merged partials;
    the oracle recomputes the whole window directly, so the value-hash
    match proves merge(partials(base), partials(delta)) ≡ full
    recompute."""
    per_day = (
        events.select(
            F.to_date("ts").alias("day"),
            "event_type",
            F.col("value").cast("decimal(18,4)").alias("v"),
        )
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    cut = F.lit("2024-01-21").cast("date")
    # null-pin: a partial with NO day (null event time) satisfies
    # neither window predicate and would silently vanish from the
    # merge; route it to the base branch so merge ≡ full recompute
    # holds on nullable timestamps too
    base = per_day.filter((F.col("day") <= cut) | F.col("day").isNull())
    delta = per_day.filter(F.col("day") > cut)
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("s").alias("sum_v"))
    )
    return merged.select(
        "event_type",
        "n_events",
        F.round(F.col("sum_v").cast("double"), 4).alias("sum_v"),
        F.round((F.col("sum_v") / F.col("n_events")).cast("double"), 6).alias("avg_v"),
    ).orderBy("event_type")


def q_agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incremental_agg_merge(load_events(spark, sf_dir))


def cusum_changepoint(events: DataFrame) -> DataFrame:
    """CUSUM changepoint detection over the daily event-count series:
    cumulative sum of deviations from the global daily mean; the day
    where |CUSUM| peaks is the level-shift candidate.  The classic
    offline changepoint screen, composed scale-safe: the raw stream
    collapses to |days| rows first, the mean is a 1-row broadcast, and
    the running sum is a window over the calendar-bounded series.
    Deviations are exact decimals (counts minus a 6-dp-rounded mean),
    so the running sums — and the argmax — are order-independent."""
    daily = (
        events.select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mean = daily.agg(
        (F.sum("n") / F.count(F.lit(1))).cast("decimal(18,6)").alias("mu")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    cs = (
        daily.crossJoin(F.broadcast(mean))
        .withColumn("dev", F.col("n").cast("decimal(18,6)") - F.col("mu"))
        .withColumn("cusum", F.sum("dev").over(w))
    )
    return cs.select(
        F.col("day").cast("string").alias("day"),
        "n",
        F.round(F.col("cusum").cast("double"), 6).alias("cusum"),
        (
            F.abs(F.col("cusum"))
            == F.max(F.abs(F.col("cusum"))).over(
                W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
            )
        ).alias("is_peak"),
    ).orderBy("day")


def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cusum_changepoint(load_events_timeline(spark, sf_dir))


def haar_decompose(events: DataFrame, day: str = "2024-01-15") -> DataFrame:
    """Haar wavelet decomposition of each user's 16-point hourly volume
    profile (hours 0-15 of one day, zero-filled) — multi-resolution
    signal features: the level-4 approximation is the day's "DC"
    component, per-level detail ENERGIES localize activity bursts in
    scale (which resolution carries the variance) — the classic
    pre-deep-learning time-series fingerprint.

    Uses the UNNORMALIZED Haar transform (pairwise sums/differences,
    no ÷2) so every coefficient is an exact decimal — no halving, no
    float drift; energies are decimal sums of squares.  The level-4
    "approx" is then simply the profile total, and energies are scaled
    by 4^level relative to the orthonormal basis (a fixed relabeling —
    fine for features).

    Scale shape: the profile collapse is the only corpus-scale shuffle;
    each of the 4 unrolled levels is a groupBy on (user, idx div 2)
    over the shrinking profile (16 → 8 → 4 → 2 → 1 rows/user)."""
    ev = events.filter(
        (F.to_date("ts") == F.lit(day).cast("date")) & (F.hour("ts") < 16)
    ).select("user_id", F.hour("ts").alias("idx"), F.col("value").cast("decimal(18,4)").alias("v"))
    vol = ev.groupBy("user_id", "idx").agg(F.sum("v").alias("v"))
    users = vol.select("user_id").distinct()
    grid = users.crossJoin(
        F.broadcast(
            vol.sparkSession.range(0, 16).select(F.col("id").cast("int").alias("idx"))
        )
    )
    cur = grid.join(vol, ["user_id", "idx"], "left").select(
        "user_id", "idx",
        F.coalesce("v", F.lit(0).cast("decimal(18,4)")).alias("v"),
    )
    energies = []
    for level in range(1, 5):
        half = (F.col("idx") - (F.col("idx") % 2)) / 2
        paired = cur.groupBy("user_id", half.cast("int").alias("idx")).agg(
            F.sum("v").cast("decimal(18,4)").alias("a"),
            F.sum(
                F.when(F.col("idx") % 2 == 0, F.col("v")).otherwise(-F.col("v"))
            ).cast("decimal(18,4)").alias("d"),
        )
        e = paired.groupBy("user_id").agg(
            F.sum((F.col("d") * F.col("d")).cast("decimal(38,8)"))
            .cast("double")
            .alias(f"e{level}")
        )
        energies.append(e)
        cur = paired.select("user_id", "idx", F.col("a").alias("v"))
    out = cur.select("user_id", F.col("v").cast("double").alias("approx"))
    for e in energies:
        out = out.join(e, "user_id")
    return out.select(
        "user_id",
        F.round("approx", 6).alias("approx"),
        *[F.round(f"e{i}", 6).alias(f"e{i}") for i in range(1, 5)],
    ).orderBy("user_id")


def q_events_haar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return haar_decompose(load_events(spark, sf_dir))



def _haar_oracle(day: str = "2024-01-15") -> str:
    """Programmatically unrolled 4-level unnormalized Haar oracle."""
    lvls, energies = [], []
    prev = "l0"
    for i in range(1, 5):
        lvls.append(f"""l{i} AS (
          SELECT user_id, idx // 2 AS idx,
                 CAST(SUM(v) AS DECIMAL(18,4)) AS v,
                 CAST(SUM(CASE WHEN idx % 2 = 0 THEN v ELSE -v END)
                      AS DECIMAL(18,4)) AS d
          FROM {prev} GROUP BY user_id, idx // 2)""")
        energies.append(
            f"e{i} AS (SELECT user_id, CAST(SUM(CAST(d * d AS DECIMAL(38,8)))"
            f" AS DOUBLE) AS e{i} FROM l{i} GROUP BY user_id)"
        )
        prev = f"l{i}"
    lvl_block = ",\n        ".join(lvls + energies)
    return f"""
        WITH vol AS (
          SELECT user_id, hour(ts) AS idx,
                 CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
          FROM events
          WHERE CAST(ts AS DATE) = DATE '{day}' AND hour(ts) < 16
          GROUP BY 1, 2),
        users AS (SELECT DISTINCT user_id FROM vol),
        grid AS (
          SELECT u.user_id, CAST(i.range AS INTEGER) AS idx
          FROM users u CROSS JOIN range(0, 16) i),
        l0 AS (
          SELECT g.user_id, g.idx,
                 COALESCE(v.v, CAST(0 AS DECIMAL(18,4))) AS v
          FROM grid g LEFT JOIN vol v USING (user_id, idx)),
        {lvl_block}
        SELECT l4.user_id,
               ROUND(CAST(l4.v AS DOUBLE), 6) AS approx,
               ROUND(e1.e1, 6) AS e1, ROUND(e2.e2, 6) AS e2,
               ROUND(e3.e3, 6) AS e3, ROUND(e4.e4, 6) AS e4
        FROM l4 JOIN e1 USING (user_id) JOIN e2 USING (user_id)
                JOIN e3 USING (user_id) JOIN e4 USING (user_id)
        ORDER BY l4.user_id
    """

LTTB_BUCKETS = 100


def lttb_downsample(events: DataFrame, buckets: int = LTTB_BUCKETS) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling of the (ts, value)
    stream to ``buckets`` representative points — the standard
    shape-preserving reduction for plotting million-point series.

    The strict LTTB recurrence is sequential (each pick depends on the
    previous); this is the parallel anchor variant every distributed
    implementation uses: the triangle anchors are the NEIGHBOR BUCKET
    AVERAGES, so every bucket's argmax is independent.  First and last
    points are kept exactly (the LTTB contract for the edges).

    Cross-engine exactness: time rides as integral micros relative to
    min (1-row broadcast bounds), values as integral cents; the
    triangle area is compared by its cross-product NUMERATOR — the
    rational area scaled by n_prev·n_next — in DECIMAL(38,0), so no
    division or float enters the argmax, and the picked point per
    bucket hash-matches any engine.

    Scale shape: one pass assigns buckets by integer arithmetic, one
    B-row stats aggregate broadcasts to the candidate scoring, and the
    per-bucket argmax is a rank window partitioned on the bucket key
    (B partitions — raise ``buckets`` with data size to bound
    per-bucket rows)."""
    pts = events.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    bounds = pts.agg(
        F.min("us").alias("min_us"),
        (F.max("us") - F.min("us") + F.lit(1)).alias("span"),
    )
    pb = (
        pts.crossJoin(F.broadcast(bounds))
        .withColumn("rel", F.col("us") - F.col("min_us"))
        .withColumn("bucket", F.expr(f"(rel * {buckets}) div span"))
        .select("event_id", "rel", "cents", "bucket")
    )
    dec = "decimal(19,0)"
    stats = pb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("rel").cast(dec)).alias("sx"),
        F.sum(F.col("cents").cast(dec)).alias("sy"),
    )
    prev = stats.select(
        (F.col("bucket") + 1).alias("bucket"),
        F.col("cnt").alias("pn"),
        F.col("sx").alias("psx"),
        F.col("sy").alias("psy"),
    )
    nxt = stats.select(
        (F.col("bucket") - 1).alias("bucket"),
        F.col("cnt").alias("nn"),
        F.col("sx").alias("nsx"),
        F.col("sy").alias("nsy"),
    )
    interior = (
        pb.filter((F.col("bucket") > 0) & (F.col("bucket") < buckets - 1))
        .join(F.broadcast(prev), "bucket")
        .join(F.broadcast(nxt), "bucket")
    )
    f1 = (F.col("psx") - (F.col("pn") * F.col("rel")).cast(dec)).cast(dec)
    f2 = (F.col("nsy") - (F.col("nn") * F.col("cents")).cast(dec)).cast(dec)
    f3 = (F.col("nsx") - (F.col("nn") * F.col("rel")).cast(dec)).cast(dec)
    f4 = (F.col("psy") - (F.col("pn") * F.col("cents")).cast(dec)).cast(dec)
    scored = interior.withColumn("num", F.abs(f1 * f2 - f3 * f4))
    w = W.partitionBy("bucket").orderBy(F.col("num").desc(), F.col("event_id"))
    picked = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("bucket", "event_id", "rel", "cents")
    )
    w_first = W.partitionBy("bucket").orderBy("rel", "event_id")
    w_last = W.partitionBy("bucket").orderBy(F.col("rel").desc(), F.col("event_id").desc())
    edges = (
        pb.filter(F.col("bucket") == 0)
        .withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select("bucket", "event_id", "rel", "cents")
        .unionByName(
            pb.filter(F.col("bucket") == buckets - 1)
            .withColumn("rn", F.row_number().over(w_last))
            .filter(F.col("rn") == 1)
            .select("bucket", "event_id", "rel", "cents")
        )
    )
    return (
        picked.unionByName(edges)
        .select(
            "bucket",
            "event_id",
            F.col("rel").alias("rel_us"),
            (F.col("cents").cast("double") / F.lit(100.0)).alias("value"),
        )
        .orderBy("bucket")
    )


def q_events_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lttb_downsample(load_events(spark, sf_dir))


QUERIES = {
    "events-downsample-lttb": q_events_lttb,
    "events-haar-wavelet": q_events_haar,
    "agg-incremental-merge": q_agg_incremental_merge,
    "events-changepoint-cusum": q_events_changepoint,
    "events-forecast-backtest": q_events_forecast_backtest,
    "events-sliding-distinct": q_events_sliding_distinct,
    "events-trajectory-topk": q_events_trajectory_topk,
    "events-ohlc": q_events_ohlc,
    "events-interpolate-linear": q_events_interpolate,
    "events-rate-limit": q_events_rate_limit,
    "events-ewma": q_events_ewma,
}

ORACLES = {
    "events-downsample-lttb": """
        WITH pts AS (
          SELECT event_id, epoch_us(ts) AS us,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events),
        bounds AS (
          SELECT MIN(us) AS min_us, MAX(us) - MIN(us) + 1 AS span FROM pts),
        pb AS (
          SELECT event_id, us - min_us AS rel, cents,
                 ((us - min_us) * 100) // span AS bucket
          FROM pts, bounds),
        stats AS (
          SELECT bucket, COUNT(*) AS cnt,
                 SUM(CAST(rel AS DECIMAL(19,0))) AS sx,
                 SUM(CAST(cents AS DECIMAL(19,0))) AS sy
          FROM pb GROUP BY 1),
        scored AS (
          SELECT p.bucket, p.event_id, p.rel, p.cents,
                 abs(CAST(pr.sx - CAST(pr.cnt * p.rel AS DECIMAL(19,0)) AS DECIMAL(19,0))
                     * CAST(nx.sy - CAST(nx.cnt * p.cents AS DECIMAL(19,0)) AS DECIMAL(19,0))
                     - CAST(nx.sx - CAST(nx.cnt * p.rel AS DECIMAL(19,0)) AS DECIMAL(19,0))
                       * CAST(pr.sy - CAST(pr.cnt * p.cents AS DECIMAL(19,0)) AS DECIMAL(19,0)))
                   AS num
          FROM pb p
          JOIN stats pr ON pr.bucket = p.bucket - 1
          JOIN stats nx ON nx.bucket = p.bucket + 1
          WHERE p.bucket > 0 AND p.bucket < 99),
        picked AS (
          SELECT bucket, event_id, rel, cents FROM (
            SELECT bucket, event_id, rel, cents,
                   ROW_NUMBER() OVER (PARTITION BY bucket
                                      ORDER BY num DESC, event_id) AS rn
            FROM scored) WHERE rn = 1),
        edges AS (
          SELECT bucket, event_id, rel, cents FROM (
            SELECT bucket, event_id, rel, cents,
                   ROW_NUMBER() OVER (PARTITION BY bucket
                                      ORDER BY rel, event_id) AS rn
            FROM pb WHERE bucket = 0) WHERE rn = 1
          UNION ALL
          SELECT bucket, event_id, rel, cents FROM (
            SELECT bucket, event_id, rel, cents,
                   ROW_NUMBER() OVER (PARTITION BY bucket
                                      ORDER BY rel DESC, event_id DESC) AS rn
            FROM pb WHERE bucket = 99) WHERE rn = 1)
        SELECT bucket, event_id, rel AS rel_us,
               CAST(cents AS DOUBLE) / 100.0 AS value
        FROM (SELECT * FROM picked UNION ALL SELECT * FROM edges)
        ORDER BY bucket
    """,
    "events-haar-wavelet": None,  # filled below from the generator
    "agg-incremental-merge": """
        WITH pd AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 COUNT(*) AS n,
                 SUM(CAST(value AS DECIMAL(18,4))) AS s
          FROM events GROUP BY 1, 2)
        SELECT event_type,
               CAST(SUM(n) AS BIGINT) AS n_events,
               ROUND(CAST(SUM(s) AS DOUBLE), 4) AS sum_v,
               ROUND(CAST(SUM(s) / SUM(n) AS DOUBLE), 6) AS avg_v
        FROM pd GROUP BY event_type ORDER BY event_type
    """,
    "events-changepoint-cusum": """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
          FROM events WHERE ts IS NOT NULL GROUP BY 1),
        m AS (SELECT CAST(SUM(n) / COUNT(*) AS DECIMAL(18,6)) AS mu FROM daily),
        cs AS (
          SELECT day, n,
                 SUM(CAST(n AS DECIMAL(18,6)) - mu) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
          FROM daily, m)
        SELECT CAST(day AS VARCHAR) AS day, n,
               ROUND(CAST(cusum AS DOUBLE), 6) AS cusum,
               ABS(cusum) = MAX(ABS(cusum)) OVER () AS is_peak
        FROM cs ORDER BY day
    """,
    "events-forecast-backtest": """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        model AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01', day) % 7 AS dow,
                 SUM(n) / COUNT(*) AS pred
          FROM daily WHERE day < DATE '2024-01-22'
          GROUP BY 1, 2),
        test AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01', day) % 7 AS dow, n
          FROM daily
          WHERE day >= DATE '2024-01-22' AND day < DATE '2024-01-29')
        SELECT t.event_type,
               ROUND(AVG(ABS(t.n - m.pred) / t.n), 6) AS mape,
               COUNT(*) AS n_days
        FROM test t JOIN model m USING (event_type, dow)
        GROUP BY t.event_type ORDER BY t.event_type
    """,
    "events-sliding-distinct": """
        WITH uh AS (
          SELECT DISTINCT user_id,
                 CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hr
          FROM events),
        fan AS (
          SELECT user_id, hr - o.x AS ws
          FROM uh, (VALUES (0), (1)) o(x))
        SELECT ws, COUNT(DISTINCT user_id) AS n_users
        FROM fan GROUP BY ws ORDER BY ws
    """,
    "events-trajectory-topk": """
        WITH ev AS (
          SELECT user_id, hour(ts) AS hr, CAST(value AS DECIMAL(18,4)) AS v
          FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'),
        vol AS (
          SELECT user_id, hr, SUM(v) AS v FROM ev GROUP BY 1, 2),
        grid AS (
          SELECT u.user_id, h.range AS hr
          FROM (SELECT DISTINCT user_id FROM vol) u, range(0, 24) h),
        dense AS (
          SELECT g.user_id, g.hr,
                 COALESCE(vol.v, CAST(0 AS DECIMAL(18,4))) AS v
          FROM grid g LEFT JOIN vol ON vol.user_id = g.user_id
                                   AND vol.hr = g.hr),
        q AS (SELECT hr, v AS qv FROM dense WHERE user_id = 1)
        SELECT d.user_id,
               CAST(SUM((d.v - q.qv) * (d.v - q.qv)) AS DOUBLE) AS dist_sq
        FROM dense d JOIN q USING (hr)
        WHERE d.user_id <> 1
        GROUP BY d.user_id
        ORDER BY dist_sq, d.user_id LIMIT 5
    """,
    # the bounded-window fold is a plain range self-join in SQL: every
    # (user, hour) pulls its ≤8 trailing hours; power-of-two weights
    # keep both sums exact, one double division at the end
    "events-ewma": """
        WITH hourly AS (
          SELECT user_id,
                 CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hb,
                 SUM(CAST(value AS DECIMAL(18,4))) AS v
          FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
        SELECT a.user_id, a.hb AS hr_bucket,
               CAST(CAST(SUM(b.v * (CAST(1 AS BIGINT) << CAST(8 - (a.hb - b.hb) AS INTEGER))) AS DOUBLE)
                    / CAST(SUM(CAST(1 AS BIGINT) << CAST(8 - (a.hb - b.hb) AS INTEGER)) AS DOUBLE)
                    AS DOUBLE) AS ewma
        FROM hourly a JOIN hourly b
          ON a.user_id = b.user_id AND b.hb BETWEEN a.hb - 7 AND a.hb
        GROUP BY a.user_id, a.hb
    """,
    "events-rate-limit": """
        WITH ev AS (
          SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
                 CAST(FLOOR(epoch_us(ts) / 60000000) AS BIGINT) AS win_bucket
          FROM events),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type, win_bucket
            ORDER BY us, event_id) AS rn
          FROM ev)
        SELECT user_id, event_type, win_bucket,
               MIN(CASE WHEN rn = 1 THEN event_id END) AS kept_event_id,
               COUNT(*) - 1 AS n_suppressed
        FROM ranked GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "events-ohlc": """
        WITH ev AS (
          SELECT user_id, event_id, value, epoch_us(ts) AS us,
                 CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hr_bucket
          FROM events),
        w AS (
          SELECT user_id, hr_bucket, value,
                 FIRST_VALUE(value) OVER (
                   PARTITION BY user_id, hr_bucket ORDER BY us, event_id) AS open,
                 LAST_VALUE(value) OVER (
                   PARTITION BY user_id, hr_bucket ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close
          FROM ev)
        SELECT user_id, hr_bucket,
               MIN(open) AS open, MAX(value) AS high, MIN(value) AS low,
               MIN(close) AS close, COUNT(*) AS n_events
        FROM w GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "events-interpolate-linear": """
        WITH ev AS (
          SELECT user_id, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr, value
          FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'),
        knots AS (
          SELECT user_id, hr, MAX(value) AS knot FROM ev GROUP BY 1, 2),
        grid AS (
          SELECT u.user_id, g.hr
          FROM (SELECT DISTINCT user_id FROM knots) u,
               (SELECT CAST(unnest(generate_series(0, 23)) AS INTEGER) AS hr) g),
        j AS (
          SELECT g.user_id, g.hr, k.knot,
                 LAST_VALUE(k.knot IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                 LAST_VALUE(CASE WHEN k.knot IS NOT NULL THEN g.hr END IGNORE NULLS)
                   OVER (PARTITION BY g.user_id ORDER BY g.hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
                 FIRST_VALUE(k.knot IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hr
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                 FIRST_VALUE(CASE WHEN k.knot IS NOT NULL THEN g.hr END IGNORE NULLS)
                   OVER (PARTITION BY g.user_id ORDER BY g.hr
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
          FROM grid g LEFT JOIN knots k
            ON k.user_id = g.user_id AND k.hr = g.hr)
        SELECT user_id, hr,
               ROUND(CASE
                 WHEN knot IS NOT NULL THEN knot
                 WHEN ph IS NULL THEN nv
                 WHEN nh IS NULL THEN pv
                 ELSE pv + (nv - pv) * (hr - ph) / (nh - ph)
               END, 6) AS filled_value
        FROM j ORDER BY user_id, hr
    """,
}

ORACLES["events-haar-wavelet"] = _haar_oracle()


def seasonal_decompose_daily(events: DataFrame) -> DataFrame:
    """Classical additive seasonal decomposition of the daily event-count
    series: ``trend`` = centered 7-day moving average (full windows
    only), ``seasonal`` = per-day-of-week mean of the detrended series,
    ``residual`` = detrended − seasonal.  The moving-average + seasonal-
    means formulation is the decomposition step of STL-style monitoring
    (capacity dashboards, anomaly baselines).

    Scale shape: the raw stream collapses to |days| rows FIRST (one
    partial-aggregated groupBy), so the unpartitioned calendar window is
    bounded by contract; the 7-row day-of-week seasonal table joins back
    as a broadcast.  Every aggregate stays integer (counts and 7-day
    count sums), and trend/seasonal/residual derive from those integers
    through the identical IEEE expression in both engines — the division
    happens once, after all sums, so no float is ever accumulated."""
    daily = (
        events.select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    win = W.orderBy("day").rowsBetween(-3, 3)
    d = daily.select(
        "day",
        "n",
        F.sum("n").over(win).alias("s7"),
        F.count(F.lit(1)).over(win).alias("c7"),
        (F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) % 7).alias("dow"),
    )
    seas = (
        d.filter(F.col("c7") == 7)
        .groupBy("dow")
        .agg(
            F.sum("n").alias("sn"),
            F.sum("s7").alias("ss7"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "dow",
            (
                F.col("sn").cast("double") / F.col("cnt")
                - F.col("ss7").cast("double") / (F.lit(7.0) * F.col("cnt"))
            ).alias("seasonal_raw"),
        )
    )
    trend = F.when(F.col("c7") == 7, F.col("s7").cast("double") / F.lit(7.0))
    detrended = F.col("n").cast("double") - F.col("s7").cast("double") / F.lit(7.0)
    return (
        d.join(F.broadcast(seas), "dow")
        .select(
            F.col("day").cast("string").alias("day"),
            "n",
            F.round(trend, 6).alias("trend"),
            F.round(F.col("seasonal_raw"), 6).alias("seasonal"),
            F.round(
                F.when(F.col("c7") == 7, detrended - F.col("seasonal_raw")), 6
            ).alias("residual"),
        )
        .orderBy("day")
    )


def q_events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_decompose_daily(load_events_timeline(spark, sf_dir))


QUERIES["events-seasonal-decompose"] = q_events_seasonal_decompose

ORACLES["events-seasonal-decompose"] = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events WHERE ts IS NOT NULL GROUP BY 1),
    w AS (
      SELECT day, n,
             SUM(n) OVER win AS s7,
             COUNT(*) OVER win AS c7,
             date_diff('day', DATE '2024-01-01', day) % 7 AS dow
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    seas AS (
      SELECT dow,
             CAST(SUM(n) AS DOUBLE) / COUNT(*)
               - CAST(SUM(s7) AS DOUBLE) / (7.0 * COUNT(*)) AS seasonal_raw
      FROM w WHERE c7 = 7 GROUP BY 1)
    SELECT CAST(w.day AS VARCHAR) AS day, w.n,
           ROUND(CASE WHEN c7 = 7 THEN CAST(s7 AS DOUBLE) / 7.0 END, 6) AS trend,
           ROUND(seasonal_raw, 6) AS seasonal,
           ROUND(CASE WHEN c7 = 7
                 THEN (CAST(w.n AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0) - seasonal_raw
                 END, 6) AS residual
    FROM w JOIN seas USING (dow)
    ORDER BY day
"""


HOLT_ALPHA = 0.5  # exact binary fractions keep the recurrence products clean
HOLT_BETA = 0.5


def holt_linear_daily(events: DataFrame) -> DataFrame:
    """Holt double exponential smoothing (level + trend) of the daily
    event-count series — the forecasting upgrade of ``events-ewma``
    when the series drifts: ``l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1})``,
    ``b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}``, seeded with ``l_1 = y_1``,
    ``b_1 = y_2 − y_1``.

    The recurrence is inherently sequential, but the SERIES is bounded:
    the raw stream collapses to |days| rows first (one partial-
    aggregated groupBy), so the whole recurrence folds over a calendar-
    bounded array in one task — the same bounded-by-contract shape as
    the CUSUM/changepoint keys, with the distributed work in the
    collapse.  The Spark fold (``aggregate`` with a struct accumulator)
    and the DuckDB recursive CTE execute the IDENTICAL double-precision
    step expression left-to-right, so every (level, trend) pair is
    bit-reproducible across engines."""
    daily = (
        events.select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("s")
    ).select(
        F.expr("transform(s, r -> CAST(r.n AS DOUBLE))").alias("ys"),
        F.expr("transform(s, r -> r.day)").alias("days"),
        F.expr("transform(s, r -> r.n)").alias("ns"),
    ).filter(
        # the linear model seeds (l0, b0) from the first two days —
        # fewer than 2 days (single-row / post-pruning input) emits
        # nothing, like the oracle's day-3+ recursion with no anchor
        F.expr("size(ys) >= 2")
    )
    hist = F.expr(f"""
        aggregate(
          slice(ys, 3, size(ys) - 2),
          named_struct(
            'l', CAST(0.5 * ys[1] + 0.5 * (ys[0] + (ys[1] - ys[0])) AS DOUBLE),
            'b', CAST(0.5 * ((0.5 * ys[1] + 0.5 * (ys[0] + (ys[1] - ys[0]))) - ys[0])
                      + 0.5 * (ys[1] - ys[0]) AS DOUBLE),
            'hist', array(
              named_struct('l', CAST(ys[0] AS DOUBLE), 'b', CAST(ys[1] - ys[0] AS DOUBLE)),
              named_struct(
                'l', CAST(0.5 * ys[1] + 0.5 * (ys[0] + (ys[1] - ys[0])) AS DOUBLE),
                'b', CAST(0.5 * ((0.5 * ys[1] + 0.5 * (ys[0] + (ys[1] - ys[0]))) - ys[0])
                          + 0.5 * (ys[1] - ys[0]) AS DOUBLE)))),
          (acc, y) -> named_struct(
            'l', CAST(0.5 * y + 0.5 * (acc.l + acc.b) AS DOUBLE),
            'b', CAST(0.5 * ((0.5 * y + 0.5 * (acc.l + acc.b)) - acc.l)
                      + 0.5 * acc.b AS DOUBLE),
            'hist', array_append(acc.hist, named_struct(
              'l', CAST(0.5 * y + 0.5 * (acc.l + acc.b) AS DOUBLE),
              'b', CAST(0.5 * ((0.5 * y + 0.5 * (acc.l + acc.b)) - acc.l)
                        + 0.5 * acc.b AS DOUBLE)))),
          acc -> acc.hist)
    """)
    rows = series.select(
        F.posexplode(F.expr(
            "zip_with(days, ys, (d, y) -> named_struct('day', d, 'y', y))"
        )).alias("i", "r"),
        hist.alias("h"),
        F.col("ns"),
    )
    return rows.select(
        F.col("r.day").cast("string").alias("day"),
        F.expr("element_at(ns, i + 1)").alias("n"),
        F.round(F.expr("element_at(h, i + 1).l"), 6).alias("level"),
        F.round(F.expr("element_at(h, i + 1).b"), 6).alias("trend"),
    ).orderBy("day")


def q_events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    return holt_linear_daily(load_events_timeline(spark, sf_dir))


QUERIES["events-holt-linear"] = q_events_holt_linear

ORACLES["events-holt-linear"] = """
    WITH RECURSIVE daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events WHERE ts IS NOT NULL GROUP BY 1),
    idx AS (
      SELECT day, n, CAST(n AS DOUBLE) AS y,
             ROW_NUMBER() OVER (ORDER BY day) AS i
      FROM daily),
    rec(i, l, b) AS (
      SELECT 2,
             0.5 * (SELECT y FROM idx WHERE i = 2)
               + 0.5 * ((SELECT y FROM idx WHERE i = 1)
                        + ((SELECT y FROM idx WHERE i = 2)
                           - (SELECT y FROM idx WHERE i = 1))),
             0.5 * ((0.5 * (SELECT y FROM idx WHERE i = 2)
                     + 0.5 * ((SELECT y FROM idx WHERE i = 1)
                              + ((SELECT y FROM idx WHERE i = 2)
                                 - (SELECT y FROM idx WHERE i = 1))))
                    - (SELECT y FROM idx WHERE i = 1))
               + 0.5 * ((SELECT y FROM idx WHERE i = 2)
                        - (SELECT y FROM idx WHERE i = 1))
      UNION ALL
      SELECT r.i + 1,
             0.5 * x.y + 0.5 * (r.l + r.b),
             0.5 * ((0.5 * x.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      FROM rec r JOIN idx x ON x.i = r.i + 1),
    path AS (
      -- anchored only when a 2nd day exists: the linear model seeds
      -- (l0, b0) from the first two days, so a 1-day series emits
      -- nothing (engine parity — its series filter is size >= 2)
      SELECT 1 AS i,
             (SELECT y FROM idx WHERE i = 1) AS l,
             (SELECT y FROM idx WHERE i = 2) - (SELECT y FROM idx WHERE i = 1) AS b
      WHERE EXISTS (SELECT 1 FROM idx WHERE i = 2)
      UNION ALL
      SELECT i, l, b FROM rec)
    SELECT CAST(x.day AS VARCHAR) AS day, x.n,
           ROUND(p.l, 6) AS level, ROUND(p.b, 6) AS trend
    FROM idx x JOIN path p USING (i)
    ORDER BY day
"""


ANOM_K = 2.0


def q_events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection: flag days whose
    decomposition RESIDUAL exceeds ``k``× the MAD of all residuals —
    the STL-residual monitoring pass that catches a spike on a quiet
    weekday that a raw-count threshold (``events-anomaly-mad``'s
    per-user cousin) would miss, and ignores the weekly swing it would
    false-positive on.

    Composes :func:`seasonal_decompose_daily` (|days|-bounded, integer
    partials) with a 1-row MAD broadcast; residuals are 6-dp-rounded
    before the median, so the threshold comparison sees identical
    doubles in both engines."""
    dec = seasonal_decompose_daily(load_events_timeline(spark, sf_dir))
    r = dec.filter(F.col("residual").isNotNull()).select("day", "n", "residual")
    mad = r.agg(F.round(F.median(F.abs(F.col("residual"))), 6).alias("mad"))
    return (
        r.crossJoin(F.broadcast(mad))
        .select(
            "day",
            "n",
            "residual",
            "mad",
            (F.abs(F.col("residual")) > F.lit(ANOM_K) * F.col("mad")).alias("is_anomaly"),
        )
        .orderBy("day")
    )


QUERIES["events-anomaly-seasonal"] = q_events_anomaly_seasonal

ORACLES["events-anomaly-seasonal"] = f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events WHERE ts IS NOT NULL GROUP BY 1),
    w AS (
      SELECT day, n,
             SUM(n) OVER win AS s7,
             COUNT(*) OVER win AS c7,
             date_diff('day', DATE '2024-01-01', day) % 7 AS dow
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    seas AS (
      SELECT dow,
             CAST(SUM(n) AS DOUBLE) / COUNT(*)
               - CAST(SUM(s7) AS DOUBLE) / (7.0 * COUNT(*)) AS seasonal_raw
      FROM w WHERE c7 = 7 GROUP BY 1),
    r AS (
      SELECT CAST(w.day AS VARCHAR) AS day, w.n,
             ROUND((CAST(w.n AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0) - seasonal_raw,
                   6) AS residual
      FROM w JOIN seas USING (dow) WHERE c7 = 7),
    m AS (SELECT ROUND(median(abs(residual)), 6) AS mad FROM r)
    SELECT day, n, residual, mad,
           abs(residual) > {ANOM_K} * mad AS is_anomaly
    FROM r, m ORDER BY day
"""


BURST_GAMMA = 4.0   # state-entry cost (discourages flip-flopping)
BURST_SCALE = 3     # burst rate = BURST_SCALE × base rate


def q_events_burst_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg-style burst detection on the hourly event-count
    series: a two-state automaton (base rate λ₀ = grid mean, burst rate
    λ₁ = 3λ₀) with Poisson emission costs ``λⱼ − x·ln λⱼ`` and an entry
    penalty γ for switching into the burst state; the minimum-cost
    state PATH (Viterbi) labels each hour 0/1.  The standard "find the
    bursty intervals" primitive for trending-topic and incident
    detection.

    Scale shape: the stream collapses to a gap-filled |hours| grid
    first (one partial-aggregated groupBy + a sequence join — 720 rows
    for the 30-day window, calendar-bounded by contract), and the DP
    folds over that bounded array in one task carrying
    (cost₀, cost₁, path₀, path₁) — the same bounded sequential-fold
    shape as ``events-holt-linear``.  λ₀ and the two ``ln λ`` constants
    are 6-dp-rounded ONCE, so every emission cost, running cost, and
    comparison is the identical IEEE double sequence in both engines
    (the DuckDB twin is a recursive CTE carrying the same four
    accumulators), and the emitted (hour, count, state) rows are all
    integers — nothing floating reaches the hash."""
    us_per_hour = 3_600_000_000
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.select((F.unix_micros("ts") / us_per_hour).cast("bigint").alias("hb"))
        .groupBy("hb")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    bounds = hourly.agg(F.min("hb").alias("mn"), F.max("hb").alias("mx"))
    grid = bounds.select(F.explode(F.sequence("mn", "mx")).alias("hb"))
    g = grid.join(hourly, "hb", "left").select(
        "hb", F.coalesce("x", F.lit(0)).alias("x")
    )
    row = (
        g.agg(F.array_sort(F.collect_list(F.struct("hb", "x"))).alias("s"))
        .select(
            F.expr("transform(s, r -> r.hb)").alias("hbs"),
            F.expr("transform(s, r -> r.x)").alias("xs"),
        )
        # zero-hour grid (empty/post-pruning input): no series, no path
        # — matches the oracle recursion, which has no anchor row
        .filter(F.expr("size(xs) >= 1"))
        .withColumn(
            "l0",
            F.round(
                F.expr("aggregate(xs, CAST(0 AS BIGINT), (a, x) -> a + x)").cast(
                    "double"
                )
                / F.size("xs"),
                6,
            ),
        )
        .withColumn("l1", F.lit(float(BURST_SCALE)) * F.col("l0"))
        .withColumn("l0r", F.round(F.log("l0"), 6))
        .withColumn("l1r", F.round(F.log("l1"), 6))
    )
    gam = f"{BURST_GAMMA!r}D"
    path = F.expr(f"""
        aggregate(
          slice(xs, 2, size(xs) - 1),
          named_struct(
            'c0', l0 - CAST(xs[0] AS DOUBLE) * l0r,
            'c1', {gam} + l1 - CAST(xs[0] AS DOUBLE) * l1r,
            'p0', array(0),
            'p1', array(1)),
          (acc, x) -> named_struct(
            'c0', (l0 - CAST(x AS DOUBLE) * l0r) + least(acc.c0, acc.c1),
            'c1', (l1 - CAST(x AS DOUBLE) * l1r) + least(acc.c1, acc.c0 + {gam}),
            'p0', array_append(
              CASE WHEN acc.c0 <= acc.c1 THEN acc.p0 ELSE acc.p1 END, 0),
            'p1', array_append(
              CASE WHEN acc.c1 <= acc.c0 + {gam} THEN acc.p1 ELSE acc.p0 END, 1)),
          acc -> CASE WHEN acc.c0 <= acc.c1 THEN acc.p0 ELSE acc.p1 END)
    """)
    # the path fold is zipped INTO the generator input so it is
    # evaluated ONCE per (single) input row — carrying it as a separate
    # projected column lets CollapseProject inline the whole fold into
    # the per-output-row element_at (measured 12 s for 720 rows)
    zipped = F.explode(
        F.arrays_zip(F.col("hbs"), F.col("xs"), path.alias("st"))
    ).alias("r")
    return (
        row.select(zipped)
        .select(
            F.col("r.hbs").alias("hb"),
            F.col("r.xs").alias("x"),
            F.col("r.st").alias("state"),
        )
        .orderBy("hb")
    )


QUERIES["events-burst-viterbi"] = q_events_burst_viterbi

ORACLES["events-burst-viterbi"] = f"""
    WITH RECURSIVE hourly AS (
      SELECT epoch_us(ts) // 3600000000 AS hb, COUNT(*) AS x
      FROM events GROUP BY 1),
    b AS (SELECT MIN(hb) AS mn, MAX(hb) AS mx FROM hourly),
    grid AS (SELECT unnest(range(mn, mx + 1)) AS hb FROM b),
    g AS (
      SELECT grid.hb, COALESCE(x, 0) AS x,
             ROW_NUMBER() OVER (ORDER BY grid.hb) AS i
      FROM grid LEFT JOIN hourly USING (hb)),
    k AS (
      SELECT l0, {BURST_SCALE} * l0 AS l1,
             ROUND(ln(l0), 6) AS l0r, ROUND(ln({BURST_SCALE} * l0), 6) AS l1r
      FROM (SELECT ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS l0 FROM g)),
    rec(i, c0, c1, p0, p1) AS (
      SELECT 1,
             l0 - CAST(x AS DOUBLE) * l0r,
             {BURST_GAMMA} + l1 - CAST(x AS DOUBLE) * l1r,
             [0], [1]
      FROM g, k WHERE i = 1
      UNION ALL
      SELECT r.i + 1,
             (k.l0 - CAST(g.x AS DOUBLE) * k.l0r) + least(r.c0, r.c1),
             (k.l1 - CAST(g.x AS DOUBLE) * k.l1r)
               + least(r.c1, r.c0 + {BURST_GAMMA}),
             list_append(CASE WHEN r.c0 <= r.c1 THEN r.p0 ELSE r.p1 END, 0),
             list_append(CASE WHEN r.c1 <= r.c0 + {BURST_GAMMA} THEN r.p1 ELSE r.p0 END, 1)
      FROM rec r JOIN g ON g.i = r.i + 1, k),
    fin AS (
      SELECT CASE WHEN c0 <= c1 THEN p0 ELSE p1 END AS path
      FROM rec ORDER BY i DESC LIMIT 1)
    SELECT g.hb, g.x, path[g.i] AS state
    FROM g, fin ORDER BY g.hb
"""


HW_PERIOD = 7


def q_events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing of the daily
    event-count series (α=β=γ=0.5, weekly period) — level + trend +
    seasonal state with one-step-ahead fitted values, completing the
    smoothing family (``events-ewma`` → ``events-holt-linear`` →
    seasonal).  Seeds: ``l₀ = mean(y₁..₇)``, ``b₀ = (mean(y₈..₁₄) −
    mean(y₁..₇))/7``, ``sᵢ = yᵢ − l₀``; emits t ≥ 8.

    Same bounded-recurrence contract as ``events-holt-linear``: the
    stream collapses to the |days| grid first, the fold carries
    (level, trend, 7-slot seasonal ring, history) over that calendar-
    bounded array in one task, and the DuckDB twin is a recursive CTE
    executing the IDENTICAL double-precision step expressions — seed
    means come from exact integer sums, so every state is
    bit-reproducible across engines."""
    daily = (
        events_daily(load_events_timeline(spark, sf_dir))
    )
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("s")
    ).select(
        F.expr("transform(s, r -> CAST(r.n AS BIGINT))").alias("xs"),
        F.expr("transform(s, r -> r.day)").alias("days"),
    ).filter(
        # the additive model is defined only past its 14-day seed
        # window (l0 from days 1-7, b0 from 8-14); a shorter series —
        # including the zero-day post-pruning case — emits nothing,
        # like the oracle's day-8+ recursion with no anchor
        F.expr("size(xs) >= 14")
    )
    row = series.withColumn(
        "l0",
        F.expr("CAST(xs[0]+xs[1]+xs[2]+xs[3]+xs[4]+xs[5]+xs[6] AS DOUBLE)/7.0"),
    ).withColumn(
        "b0",
        F.expr(
            "(CAST(xs[7]+xs[8]+xs[9]+xs[10]+xs[11]+xs[12]+xs[13] AS DOUBLE)/7.0 - l0)/7.0"
        ),
    )
    LN = "(0.5 * (CAST(y AS DOUBLE) - acc.s[0]) + 0.5 * (acc.l + acc.b))"
    BN = f"(0.5 * ({LN} - acc.l) + 0.5 * acc.b)"
    SN = f"(0.5 * (CAST(y AS DOUBLE) - {LN}) + 0.5 * acc.s[0])"
    seed_s = ", ".join(f"CAST(xs[{i}] AS DOUBLE) - l0" for i in range(7))
    hist = F.expr(f"""
        aggregate(
          slice(xs, 8, size(xs) - 7),
          named_struct(
            'l', l0, 'b', b0,
            's', array({seed_s}),
            'h', CAST(array() AS ARRAY<STRUCT<l: DOUBLE, b: DOUBLE, sn: DOUBLE, fit: DOUBLE>>)),
          (acc, y) -> named_struct(
            'l', {LN},
            'b', {BN},
            's', concat(slice(acc.s, 2, 6), array({SN})),
            'h', array_append(acc.h, named_struct(
              'l', {LN}, 'b', {BN}, 'sn', {SN},
              'fit', acc.l + acc.b + acc.s[0]))),
          acc -> acc.h)
    """)
    out = row.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(days, 8, size(days) - 7)").alias("day"),
                F.expr("slice(xs, 8, size(xs) - 7)").alias("n"),
                hist.alias("st"),
            )
        ).alias("r")
    )
    return out.select(
        F.col("r.day").cast("string").alias("day"),
        F.col("r.n").alias("n"),
        F.round(F.col("r.st.l"), 6).alias("level"),
        F.round(F.col("r.st.b"), 6).alias("trend"),
        F.round(F.col("r.st.sn"), 6).alias("seasonal"),
        F.round(F.col("r.st.fit"), 6).alias("fitted"),
    ).orderBy("day")


def events_daily(events: DataFrame) -> DataFrame:
    """Shared |days|-grid collapse used by the smoothing keys."""
    return (
        events.select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )


QUERIES["events-holt-winters"] = q_events_holt_winters

_HW_LN = "(0.5 * (CAST(x.y AS DOUBLE) - r.s[1]) + 0.5 * (r.l + r.b))"
_HW_BN = f"(0.5 * ({_HW_LN} - r.l) + 0.5 * r.b)"
_HW_SN = f"(0.5 * (CAST(x.y AS DOUBLE) - {_HW_LN}) + 0.5 * r.s[1])"

ORACLES["events-holt-winters"] = f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events WHERE ts IS NOT NULL GROUP BY 1),
    idx AS (
      SELECT day, n, CAST(n AS DOUBLE) AS y,
             ROW_NUMBER() OVER (ORDER BY day) AS i
      FROM daily),
    seed AS (
      SELECT
        CAST((SELECT SUM(n) FROM idx WHERE i BETWEEN 1 AND 7) AS DOUBLE) / 7.0 AS l0,
        (CAST((SELECT SUM(n) FROM idx WHERE i BETWEEN 8 AND 14) AS DOUBLE) / 7.0
         - CAST((SELECT SUM(n) FROM idx WHERE i BETWEEN 1 AND 7) AS DOUBLE) / 7.0) / 7.0 AS b0,
        (SELECT list(CAST(n AS DOUBLE)
                     - CAST((SELECT SUM(n) FROM idx WHERE i BETWEEN 1 AND 7) AS DOUBLE) / 7.0
                     ORDER BY i)
         FROM idx WHERE i BETWEEN 1 AND 7) AS s0),
    rec(i, l, b, s, sn, fit) AS (
      -- anchor only when the full 14-day seed window exists, matching
      -- the engine's size(xs) >= 14 gate: for 8-13-day series the
      -- model's b0 seed (days 8..14) is undefined, so BOTH sides emit
      -- zero rows (round-6 ADVICE: the anchor otherwise fires from
      -- day 8 with a partial b0 sum and diverges from the engine)
      SELECT 7, l0, b0, s0, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM seed
      WHERE EXISTS (SELECT 1 FROM idx WHERE i = 14)
      UNION ALL
      SELECT r.i + 1,
             {_HW_LN},
             {_HW_BN},
             list_append(r.s[2:7], {_HW_SN}),
             {_HW_SN},
             r.l + r.b + r.s[1]
      FROM rec r JOIN idx x ON x.i = r.i + 1)
    SELECT CAST(x.day AS VARCHAR) AS day, x.n,
           ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
           ROUND(r.sn, 6) AS seasonal, ROUND(r.fit, 6) AS fitted
    FROM rec r JOIN idx x ON x.i = r.i
    WHERE r.i >= 8
    ORDER BY day
"""


def q_events_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint detection (2 levels): the global
    CUSUM peak splits the daily series, then each half is re-screened
    with its OWN local mean — the classic recursive changepoint search,
    unrolled one level beyond ``events-changepoint-cusum`` so nested
    level shifts surface.

    Fully distributed — no driver pull: each level is integral
    deviations (``n_seg·x − S_seg``, exact decimals) + a running-sum
    window per segment, the split day is the windowed argmax (earliest
    day on ties, exact decimal compare), and halves are assigned by
    comparing to the 1-row level-0 split broadcast.  Peaks are emitted
    as ``|cusum|/n_seg`` (mean-deviation units) — one decimal→double
    division each."""
    daily = (
        load_events_timeline(spark, sf_dir)
        .select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    dec = "decimal(18,0)"

    def seg_screen(df: DataFrame, part: list[str]):
        """Within-segment CUSUM screen; returns per-row frame with
        segment stats, |cusum|, its segment max, and segment bounds."""
        wall = W.partitionBy(*part)
        word = W.partitionBy(*part).orderBy("day").rowsBetween(
            W.unboundedPreceding, 0
        )
        d = df.withColumn("n_seg", F.count(F.lit(1)).over(wall)).withColumn(
            "s_seg", F.sum("x").over(wall)
        )
        d = d.withColumn(
            "dev", (F.col("n_seg") * F.col("x") - F.col("s_seg")).cast(dec)
        )
        d = d.withColumn("cusum", F.sum("dev").over(word))
        d = d.withColumn("acu", F.abs("cusum"))
        return (
            d.withColumn("mx", F.max("acu").over(wall))
            .withColumn("seg_start", F.min("day").over(wall))
            .withColumn("seg_end", F.max("day").over(wall))
        )

    l0 = seg_screen(daily.withColumn("seg", F.lit(0)), ["seg"])
    split0 = (
        l0.filter(F.col("acu") == F.col("mx"))
        .groupBy("seg_start", "seg_end", "n_seg")
        .agg(F.min("day").alias("split_day"), F.max("mx").alias("peak"))
        .select(
            F.lit(0).alias("level"),
            F.col("seg_start").cast("string").alias("seg_start"),
            F.col("seg_end").cast("string").alias("seg_end"),
            F.col("split_day").cast("string").alias("split_day"),
            F.round(
                F.col("peak").cast("double") / F.col("n_seg"), 6
            ).alias("peak_mean_dev"),
        )
    )
    d0 = (
        l0.filter(F.col("acu") == F.col("mx"))
        .agg(F.min("day").alias("d0"))
    )
    halves = daily.crossJoin(F.broadcast(d0)).withColumn(
        "half", F.when(F.col("day") <= F.col("d0"), F.lit("L")).otherwise(F.lit("R"))
    )
    l1 = seg_screen(halves, ["half"])
    split1 = (
        l1.filter(F.col("acu") == F.col("mx"))
        .groupBy("half", "seg_start", "seg_end", "n_seg")
        .agg(F.min("day").alias("split_day"), F.max("mx").alias("peak"))
        .select(
            F.lit(1).alias("level"),
            F.col("seg_start").cast("string").alias("seg_start"),
            F.col("seg_end").cast("string").alias("seg_end"),
            F.col("split_day").cast("string").alias("split_day"),
            F.round(
                F.col("peak").cast("double") / F.col("n_seg"), 6
            ).alias("peak_mean_dev"),
        )
    )
    return split0.unionByName(split1).orderBy("level", "seg_start")


QUERIES["events-changepoint-binseg"] = q_events_changepoint_binseg

ORACLES["events-changepoint-binseg"] = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x FROM events WHERE ts IS NOT NULL GROUP BY 1),
    l0 AS (
      SELECT day, x,
             COUNT(*) OVER () AS n_seg,
             SUM(x) OVER () AS s_seg,
             MIN(day) OVER () AS seg_start,
             MAX(day) OVER () AS seg_end
      FROM daily),
    c0 AS (
      SELECT *,
             abs(SUM(CAST(n_seg * x - s_seg AS DECIMAL(18,0)))
                 OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)) AS acu
      FROM l0),
    m0 AS (SELECT *, MAX(acu) OVER () AS mx FROM c0),
    s0 AS (
      SELECT CAST(0 AS INTEGER) AS level,
             CAST(seg_start AS VARCHAR) AS seg_start,
             CAST(seg_end AS VARCHAR) AS seg_end,
             CAST(MIN(day) AS VARCHAR) AS split_day,
             ROUND(CAST(MAX(mx) AS DOUBLE) / n_seg, 6) AS peak_mean_dev
      FROM m0 WHERE acu = mx GROUP BY seg_start, seg_end, n_seg),
    d0 AS (SELECT MIN(day) AS d0 FROM m0 WHERE acu = mx),
    halves AS (
      SELECT day, x, CASE WHEN day <= d0 THEN 'L' ELSE 'R' END AS half
      FROM daily, d0),
    l1 AS (
      SELECT day, x, half,
             COUNT(*) OVER w AS n_seg,
             SUM(x) OVER w AS s_seg,
             MIN(day) OVER w AS seg_start,
             MAX(day) OVER w AS seg_end
      FROM halves WINDOW w AS (PARTITION BY half)),
    c1 AS (
      SELECT *,
             abs(SUM(CAST(n_seg * x - s_seg AS DECIMAL(18,0)))
                 OVER (PARTITION BY half ORDER BY day ROWS UNBOUNDED PRECEDING)) AS acu
      FROM l1),
    m1 AS (SELECT *, MAX(acu) OVER (PARTITION BY half) AS mx FROM c1),
    s1 AS (
      SELECT CAST(1 AS INTEGER) AS level,
             CAST(seg_start AS VARCHAR) AS seg_start,
             CAST(seg_end AS VARCHAR) AS seg_end,
             CAST(MIN(day) AS VARCHAR) AS split_day,
             ROUND(CAST(MAX(mx) AS DOUBLE) / n_seg, 6) AS peak_mean_dev
      FROM m1 WHERE acu = mx GROUP BY half, seg_start, seg_end, n_seg)
    SELECT * FROM s0
    UNION ALL
    SELECT * FROM s1
    ORDER BY level, seg_start
"""


DTW_INF = 10 ** 15
DTW_N = 24  # hour-of-day profile length


def q_events_dtw_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance between the PURCHASE and ERROR
    hour-of-day count profiles — "do errors follow the same daily shape
    as purchases, allowing phase shift?"  DTW aligns the two 24-hour
    curves with elastic time steps, so a profile that is the same shape
    two hours later scores close (where Euclidean/CCF penalize it).

    The DP is a bounded 24×24 grid: the distributed work is the two
    hour-of-day collapses (one partial-aggregated groupBy each); the
    625-cell DP then folds row-major in one task — the same
    bounded-fold ≡ recursive-CTE twin pattern as the Viterbi key, and
    because costs are |int − int| and the fold is min/add over BIGINTs,
    every cell (and the emitted distance) is INTEGER-exact in both
    engines."""
    us_per_hour = 3_600_000_000
    ev = load_events(spark, sf_dir)
    hod = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .select(
            ((F.unix_micros("ts") / us_per_hour).cast("bigint") % 24).alias("h"),
            "event_type",
        )
        .groupBy("h")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("p"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("e"),
        )
    )
    grid = spark.range(24).select(F.col("id").alias("h"))
    g = grid.join(hod, "h", "left").select(
        "h",
        F.coalesce("p", F.lit(0)).alias("p"),
        F.coalesce("e", F.lit(0)).alias("e"),
    )
    row = g.agg(F.array_sort(F.collect_list(F.struct("h", "p", "e"))).alias("s")).select(
        F.expr("transform(s, r -> r.p)").alias("pa"),
        F.expr("transform(s, r -> r.e)").alias("pe"),
    )
    n1 = DTW_N + 1
    dp = F.expr(f"""
        aggregate(
          sequence(0, {n1 * n1 - 1}),
          CAST(array() AS ARRAY<BIGINT>),
          (dp, t) -> array_append(dp,
            CASE
              WHEN t = 0 THEN CAST(0 AS BIGINT)
              WHEN t < {n1} OR t % {n1} = 0 THEN CAST({DTW_INF} AS BIGINT)
              ELSE CAST(abs(pa[CAST(t / {n1} AS INT) - 1]
                            - pe[t % {n1} - 1]) AS BIGINT)
                   + least(element_at(dp, t - {n1}),
                           element_at(dp, t - {n1} + 1),
                           element_at(dp, t))
            END),
          dp -> element_at(dp, {n1 * n1}))
    """)
    return row.select(
        dp.alias("dtw_distance"),
        F.round(dp.cast("double") / (2 * DTW_N), 6).alias("dtw_per_step"),
    )


QUERIES["events-dtw-profiles"] = q_events_dtw_profiles

ORACLES["events-dtw-profiles"] = f"""
    WITH RECURSIVE hod AS (
      SELECT (epoch_us(ts) // 3600000000) % 24 AS h,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS p,
             COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS e
      FROM events WHERE event_type IN ('purchase', 'error') GROUP BY 1),
    grid AS (SELECT unnest(range(0, 24)) AS h),
    prof AS (
      SELECT list(COALESCE(p, 0) ORDER BY grid.h) AS pa,
             list(COALESCE(e, 0) ORDER BY grid.h) AS pe
      FROM grid LEFT JOIN hod USING (h)),
    rec(t, dp) AS (
      SELECT 0, [CAST(0 AS BIGINT)] FROM prof
      UNION ALL
      SELECT r.t + 1,
             list_append(r.dp,
               CASE
                 WHEN r.t + 1 < {DTW_N + 1} OR (r.t + 1) % {DTW_N + 1} = 0
                   THEN CAST({DTW_INF} AS BIGINT)
                 ELSE CAST(abs(prof.pa[(r.t + 1) // {DTW_N + 1}]
                               - prof.pe[(r.t + 1) % {DTW_N + 1}]) AS BIGINT)
                      + least(r.dp[r.t + 1 - {DTW_N + 1}],
                              r.dp[r.t + 2 - {DTW_N + 1}],
                              r.dp[r.t + 1])
               END)
      FROM rec r, prof WHERE r.t < {(DTW_N + 1) ** 2 - 1})
    SELECT dp[{(DTW_N + 1) ** 2}] AS dtw_distance,
           ROUND(CAST(dp[{(DTW_N + 1) ** 2}] AS DOUBLE) / {2 * DTW_N}, 6) AS dtw_per_step
    FROM rec WHERE t = {(DTW_N + 1) ** 2 - 1}
"""


LCS_N = 24  # per-user sequence truncation


def q_events_lcs_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-common-subsequence similarity between the two BUSIEST
    users' event-type journeys (first 24 events each) — order-aware
    behavioural similarity that tolerates insertions (a user who does
    extra clicks between the same milestones still matches), the
    companion to the order-free Markov/transition views.

    Scale shape: picking the users and building the two bounded
    sequences is distributed (one count groupBy + one
    lead-window-free sort-collapse per user via filtered collect_list);
    the (N+1)² integer DP then folds row-major in one task — the DTW
    pattern with a max/equality recurrence instead of min/add.  The
    emitted LCS length and sequence lengths are integers."""
    ev = load_events_timeline(spark, sf_dir)
    top2 = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user_id")
        .limit(2)
    )
    tagged = ev.join(F.broadcast(top2), "user_id").select(
        "user_id", "ts", "event_id", "event_type"
    )
    seqs = (
        tagged.groupBy("user_id")
        .agg(
            F.slice(
                F.expr(
                    "transform(array_sort(collect_list(struct(ts, event_id, event_type))),"
                    " r -> r.event_type)"
                ),
                1,
                LCS_N,
            ).alias("seq")
        )
    )
    w = W.orderBy("user_id")
    two = (
        seqs.withColumn("rn", F.row_number().over(w))
        .groupBy()
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("user_id"))).alias("user_a"),
            F.max(F.when(F.col("rn") == 1, F.col("seq"))).alias("sa"),
            F.max(F.when(F.col("rn") == 2, F.col("user_id"))).alias("user_b"),
            F.max(F.when(F.col("rn") == 2, F.col("seq"))).alias("sb"),
        )
    )
    n1 = LCS_N + 1
    dp = F.expr(f"""
        aggregate(
          sequence(0, {n1 * n1 - 1}),
          CAST(array() AS ARRAY<INT>),
          (dp, t) -> array_append(dp,
            CASE
              WHEN t < {n1} OR t % {n1} = 0 THEN 0
              WHEN CAST(t / {n1} AS INT) > size(sa) OR t % {n1} > size(sb)
                THEN greatest(element_at(dp, t - {n1} + 1), element_at(dp, t))
              WHEN sa[CAST(t / {n1} AS INT) - 1] = sb[t % {n1} - 1]
                THEN element_at(dp, t - {n1}) + 1
              ELSE greatest(element_at(dp, t - {n1} + 1), element_at(dp, t))
            END),
          dp -> element_at(dp, {n1 * n1}))
    """)
    return two.select(
        "user_a",
        "user_b",
        # guard the null-journey case (empty events after pruning):
        # size(NULL) is -1 under the parity session's legacy conf, but
        # an absent journey has NULL length, as the oracle reports
        F.when(F.col("sa").isNotNull(), F.size("sa")).alias("len_a"),
        F.when(F.col("sb").isNotNull(), F.size("sb")).alias("len_b"),
        dp.alias("lcs_len"),
    )


QUERIES["events-lcs-journeys"] = q_events_lcs_journeys

ORACLES["events-lcs-journeys"] = f"""
    WITH RECURSIVE top2 AS (
      SELECT user_id FROM (
        SELECT user_id, COUNT(*) AS n FROM events WHERE ts IS NOT NULL GROUP BY 1
        ORDER BY n DESC, user_id LIMIT 2)),
    seqs AS (
      SELECT user_id,
             (list(event_type ORDER BY ts, event_id))[1:{LCS_N}] AS seq
      FROM events WHERE ts IS NOT NULL AND user_id IN (SELECT user_id FROM top2)
      GROUP BY 1),
    two AS (
      SELECT MAX(CASE WHEN rn = 1 THEN user_id END) AS user_a,
             MAX(CASE WHEN rn = 1 THEN seq END) AS sa,
             MAX(CASE WHEN rn = 2 THEN user_id END) AS user_b,
             MAX(CASE WHEN rn = 2 THEN seq END) AS sb
      FROM (SELECT user_id, seq,
                   ROW_NUMBER() OVER (ORDER BY user_id) AS rn FROM seqs)),
    rec(t, dp) AS (
      SELECT 0, [CAST(0 AS INTEGER)] FROM two
      UNION ALL
      SELECT r.t + 1,
             list_append(r.dp,
               CASE
                 WHEN r.t + 1 < {LCS_N + 1} OR (r.t + 1) % {LCS_N + 1} = 0 THEN 0
                 WHEN (r.t + 1) // {LCS_N + 1} > len(two.sa)
                      OR (r.t + 1) % {LCS_N + 1} > len(two.sb)
                   THEN GREATEST(r.dp[r.t + 2 - {LCS_N + 1}], r.dp[r.t + 1])
                 WHEN two.sa[(r.t + 1) // {LCS_N + 1}]
                      = two.sb[(r.t + 1) % {LCS_N + 1}]
                   THEN r.dp[r.t + 1 - {LCS_N + 1}] + 1
                 ELSE GREATEST(r.dp[r.t + 2 - {LCS_N + 1}],
                               r.dp[r.t + 1])
               END)
      FROM rec r, two WHERE r.t < {(LCS_N + 1) ** 2 - 1})
    SELECT two.user_a, two.user_b,
           CAST(len(two.sa) AS INTEGER) AS len_a,
           CAST(len(two.sb) AS INTEGER) AS len_b,
           dp[{(LCS_N + 1) ** 2}] AS lcs_len
    FROM rec, two WHERE t = {(LCS_N + 1) ** 2 - 1}
"""
