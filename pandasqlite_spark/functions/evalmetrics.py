"""Retrieval / model-evaluation metrics and leakage-safe data splits
(SURVEY.md §2.D extensions, round 6).

A training-data pipeline does not stop at building a retrieval index or
a label column — it has to GRADE them.  This module adds the standard
evaluation surface that was missing from the registry:

- **NDCG@k / MRR@k** (`rank-ndcg-eval`, `rank-mrr-eval`): graded
  ranking quality of the exact cosine retriever against label-match
  relevance — the offline eval every retrieval stack runs per release.
- **Calibration bins** (`events-calibration-bins`): reliability table
  of a deterministic score vs the observed outcome rate — the
  fairness/quality gate before a score is used for filtering.
- **Theil–Sen trend** (`events-theil-sen-trend`): the robust
  median-of-pairwise-slopes daily trend — outlier days cannot drag it
  the way they drag the OLS twin (`events-ols-trend-weekend`).
- **Exact substring duplication** (`dedup-substring-kgram`): the
  k-character-gram signal behind exact-substring training-data dedup
  (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
  Better") — per-document duplicated-gram fraction via a shared-gram
  group-by, no pairwise comparison anywhere.
- **Group-aware k-fold** (`split-group-kfold`): fold assignment that
  is a pure function of ``user_id``, so a user can never leak across
  folds, with per-fold balance stats.

Reference parity note: the reference (IBM/pandasqlite) delegates all
analytics to generated SQLite SQL (`pandasqlite/pandasqlite.py:231-266`);
these keys extend that delegated surface with the evaluation queries
its users would ask the LLM for, re-expressed as Catalyst-friendly
Spark plans.

Cross-engine determinism (driver value-hash contract):

- Cosine ranking reuses :func:`knn_join_exact`'s decimal(8,6)
  component contract — bit-identical scores on both engines, so tie
  order (cosine DESC, vec_id) is identical too.
- DCG/IDCG sum ≤ k doubles of the form 1/log2(r+1); the only libm
  call (log2) is absorbed by ROUND(…, 6) like the entropy/PMI keys.
- Calibration averages divide exact BIGINT sums as one double op per
  column (never engine-internal AVG accumulation).
- Scores/folds hash with the Knuth multiplier on BIGINT ids:
  ``(id * 2654435761) % m`` stays below 2^63 for any id the star
  schema reaches at sf1000, so ANSI mode never overflows.
- Theil–Sen medians use linear-interpolation percentile on BOTH
  engines (Spark ``percentile``, DuckDB ``quantile_cont``) over
  identical double multisets; ROUND(…, 6) absorbs the interpolation
  arithmetic.

Scale notes (100 TB):

- NDCG/MRR: the query batch is the broadcast side; the corpus-side
  dot products partial-aggregate before their one shuffle
  (:func:`knn_join_exact`); everything after the top-k filter is
  O(queries × k).
- Theil–Sen: the quadratic pair join runs over the DAILY AGGREGATE
  (|days|² pairs, bounded by the calendar, not the row count) — raw
  events reduce map-side first.
- substring-kgram: stride-10 40-grams cut gram volume 10× vs dense
  shingling; distinct (doc, gram) pairs partial-aggregate before the
  single gram shuffle; the per-doc fraction is one more partial agg.
  At 100 TB the gram string would be replaced by ``xxhash64(gram)``
  (same plan shape, 8-byte shuffle keys) — kept as the raw string here
  so the DuckDB oracle needs no hash-function parity.
- group-kfold: fold is computed row-local from ``user_id`` (no
  shuffle to assign); only the 5-row fold summary aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load, load_events, load_events_timeline
from pandasqlite_spark.functions.similarity import knn_join_exact

NDCG_K = 10
KNUTH = 2654435761  # Knuth multiplicative-hash constant (public domain)
KGRAM = 40
KSTRIDE = 10
KFOLDS = 5


# ---------------------------------------------------------------------------
# NDCG@k / MRR@k over the exact cosine retriever
# ---------------------------------------------------------------------------


def _retrieved_with_relevance(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Top-k cosine retrieval (queries = vec_id < 8, corpus = rest)
    joined with binary label-match relevance and per-query relevant
    counts.  Columns: query_id, rank, rel, n_rel."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    corpus = emb.filter(F.col("vec_id") >= 8)
    hits = knn_join_exact(corpus, queries.select("query_id", "qv"), k=k)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    ranked = hits.withColumn("rank", F.row_number().over(w))
    labeled = (
        ranked.join(corpus.select("vec_id", "label"), "vec_id")
        .join(F.broadcast(queries.select("query_id", "qlabel")), "query_id")
        .withColumn(
            "rel", F.when(F.col("label") == F.col("qlabel"), F.lit(1)).otherwise(F.lit(0))
        )
    )
    # total relevant per query in the CORPUS (true IDCG, not list-ideal)
    n_rel = (
        corpus.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_rel"))
        .join(F.broadcast(queries.select("query_id", "qlabel")),
              F.col("label") == F.col("qlabel"))
        .select("query_id", "n_rel")
    )
    return labeled.join(F.broadcast(n_rel), "query_id", "left").na.fill({"n_rel": 0})


def q_rank_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of exact cosine retrieval with label-match relevance.

    IDCG uses the corpus-true ideal (min(n_rel, k) leading ones), so a
    query whose label is rare is graded against what WAS achievable."""
    r = _retrieved_with_relevance(spark, sf_dir, NDCG_K)
    per_q = r.groupBy("query_id", "n_rel").agg(
        F.sum(
            F.col("rel").cast("double")
            / F.log2(F.col("rank").cast("double") + F.lit(1.0))
        ).alias("dcg")
    )
    m = F.least(F.col("n_rel"), F.lit(NDCG_K))
    idcg = F.when(
        m >= 1,
        F.expr(
            f"aggregate(sequence(1, least(n_rel, {NDCG_K})), cast(0 as double),"
            " (acc, r) -> acc + 1.0 / log2(cast(r as double) + 1.0))"
        ),
    ).otherwise(F.lit(0.0))
    return (
        per_q.withColumn("idcg", idcg)
        .select(
            "query_id",
            F.col("n_rel").cast("bigint").alias("n_rel"),
            F.round("dcg", 6).alias("dcg"),
            F.round(
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(0.0), 6
            ).alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )


def q_rank_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10: reciprocal rank of the first label match, 0 if the
    top-10 contains none; ``first_hit`` carries the rank (-1 = miss)."""
    r = _retrieved_with_relevance(spark, sf_dir, NDCG_K)
    per_q = r.groupBy("query_id").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_hit_raw"),
    )
    return per_q.select(
        "query_id",
        F.coalesce(F.col("first_hit_raw"), F.lit(-1)).cast("int").alias("first_hit"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_hit_raw").cast("double"), F.lit(0.0)),
            6,
        ).alias("reciprocal_rank"),
    ).orderBy("query_id")


_RANK_ORACLE_SCAFFOLD = """
        WITH allv AS (
          SELECT vec_id, label, t.i AS pos,
                 CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(8,6)) AS x
          FROM embeddings, generate_series(1, 64) t(i)),
        q AS (SELECT vec_id AS query_id, label AS qlabel, pos, x AS qx
              FROM allv WHERE vec_id < 8),
        e AS (SELECT vec_id, label, pos, x FROM allv WHERE vec_id >= 8),
        ne AS (SELECT vec_id, CAST(SUM(x * x) AS DOUBLE) AS ne FROM e GROUP BY 1),
        nq AS (SELECT query_id, CAST(SUM(qx * qx) AS DOUBLE) AS nq FROM q GROUP BY 1),
        d AS (
          SELECT q.query_id, e.vec_id, CAST(SUM(e.x * q.qx) AS DOUBLE) AS dot
          FROM e JOIN q ON e.pos = q.pos GROUP BY 1, 2),
        s AS (
          SELECT d.query_id, d.vec_id,
                 d.dot / (sqrt(ne.ne) * sqrt(nq.nq)) AS cosine
          FROM d JOIN ne ON ne.vec_id = d.vec_id
                 JOIN nq ON nq.query_id = d.query_id),
        ranked AS (
          SELECT query_id, vec_id, rank FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM s) WHERE rank <= 10),
        lv AS (SELECT DISTINCT vec_id, label FROM e),
        ql AS (SELECT DISTINCT query_id, qlabel FROM q),
        rels AS (
          SELECT r.query_id, r.rank,
                 CASE WHEN lv.label = ql.qlabel THEN 1 ELSE 0 END AS rel
          FROM ranked r JOIN lv ON lv.vec_id = r.vec_id
                        JOIN ql ON ql.query_id = r.query_id),
        nrel AS (
          SELECT ql.query_id, COUNT(*) AS n_rel
          FROM lv JOIN ql ON lv.label = ql.qlabel GROUP BY 1)
"""


def _ndcg_oracle() -> str:
    return (
        _RANK_ORACLE_SCAFFOLD
        + """
        , dcg AS (
          SELECT query_id,
                 SUM(CAST(rel AS DOUBLE) / log2(CAST(rank AS DOUBLE) + 1.0)) AS dcg
          FROM rels GROUP BY 1),
        base AS (
          SELECT d.query_id, COALESCE(n.n_rel, 0) AS n_rel, d.dcg
          FROM dcg d LEFT JOIN nrel n ON n.query_id = d.query_id),
        idcg AS (
          -- constant series + filter: this DuckDB build rejects
          -- column-parameterized generate_series bounds
          SELECT b.query_id,
                 SUM(1.0 / log2(CAST(t.r AS DOUBLE) + 1.0)) AS idcg
          FROM base b CROSS JOIN generate_series(1, 10) t(r)
          WHERE t.r <= LEAST(b.n_rel, 10) GROUP BY 1)
        SELECT b.query_id, CAST(b.n_rel AS BIGINT) AS n_rel,
               ROUND(b.dcg, 6) AS dcg,
               ROUND(CASE WHEN COALESCE(i.idcg, 0) > 0
                          THEN b.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg_at_10
        FROM base b LEFT JOIN idcg i ON i.query_id = b.query_id
        ORDER BY b.query_id
    """
    )


def _mrr_oracle() -> str:
    return (
        _RANK_ORACLE_SCAFFOLD
        + """
        , fh AS (
          SELECT query_id, MIN(CASE WHEN rel = 1 THEN rank END) AS first_hit_raw
          FROM rels GROUP BY 1)
        SELECT query_id,
               CAST(COALESCE(first_hit_raw, -1) AS INTEGER) AS first_hit,
               ROUND(COALESCE(1.0 / CAST(first_hit_raw AS DOUBLE), 0.0), 6)
                 AS reciprocal_rank
        FROM fh ORDER BY query_id
    """
    )


# ---------------------------------------------------------------------------
# Calibration bins (reliability table)
# ---------------------------------------------------------------------------


def calibration_bins(events: DataFrame) -> DataFrame:
    """10-bin reliability table of a deterministic [0,1) score vs the
    'purchase' outcome rate: bin, n, avg_score, rate, |gap|.  The gap
    column IS the per-bin expected-calibration-error contribution."""
    h = (F.col("event_id") * F.lit(KNUTH)) % F.lit(1000)
    scored = events.filter(F.col("event_id").isNotNull()).select(
        (h / F.lit(100)).cast("int").alias("bin"),
        h.alias("score_milli"),
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0))
        .alias("hit"),
    )
    g = scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("score_milli").alias("s_sum"),
        F.sum("hit").alias("k"),
    )
    avg_score = (
        F.col("s_sum").cast("double") / F.col("n").cast("double") / F.lit(1000.0)
    )
    rate = F.col("k").cast("double") / F.col("n").cast("double")
    return g.select(
        "bin",
        "n",
        F.round(avg_score, 6).alias("avg_score"),
        F.round(rate, 6).alias("rate"),
        F.round(F.abs(avg_score - rate), 6).alias("abs_gap"),
    ).orderBy("bin")


def q_events_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return calibration_bins(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Theil–Sen robust daily trend
# ---------------------------------------------------------------------------


def theil_sen_daily_trend(events: DataFrame) -> DataFrame:
    """Median-of-pairwise-slopes trend of the daily event count — the
    robust estimator an outlier day cannot drag (breakdown point 29%).
    One row: n_days, n_pairs, slope (events/day), intercept (at epoch
    day 0 — comparable across engines, unlike 'first day' anchors)."""
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.datediff("day", F.to_date(F.lit("1970-01-01"))).alias("x"), "n")
    )
    a = daily.select(F.col("x").alias("xa"), F.col("n").alias("na"))
    b = daily.select(F.col("x").alias("xb"), F.col("n").alias("nb"))
    pairs = a.join(b, F.col("xa") < F.col("xb")).select(
        (
            (F.col("nb") - F.col("na")).cast("double")
            / (F.col("xb") - F.col("xa")).cast("double")
        ).alias("slope")
    )
    slope_row = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile("slope", F.lit(0.5)).alias("slope_hat"),
    )
    resid = daily.crossJoin(F.broadcast(slope_row.select("slope_hat"))).select(
        (F.col("n").cast("double") - F.col("slope_hat") * F.col("x").cast("double"))
        .alias("r")
    )
    resid_row = resid.agg(F.percentile("r", F.lit(0.5)).alias("intercept_hat"))
    days_row = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        days_row.crossJoin(slope_row)
        .crossJoin(resid_row)
        .select(
            "n_days",
            "n_pairs",
            F.round("slope_hat", 6).alias("slope"),
            F.round("intercept_hat", 6).alias("intercept"),
        )
    )


def q_events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return theil_sen_daily_trend(load_events_timeline(spark, sf_dir))


# ---------------------------------------------------------------------------
# Exact-substring duplication signal (k-char grams)
# ---------------------------------------------------------------------------


def substring_kgram_dup(docs: DataFrame, k: int = KGRAM, stride: int = KSTRIDE,
                        top: int = 20) -> DataFrame:
    """Per-document duplicated-substring fraction: stride-sampled
    k-char grams, a gram is 'duplicated' when ≥2 DISTINCT docs contain
    it, fraction = dup distinct grams / total distinct grams.  Top-N
    docs by fraction — the removal shortlist of exact-substring dedup."""
    eligible = docs.filter(
        F.col("text").isNotNull() & (F.length("text") >= k)
    ).select("doc_id", "text")
    grams = eligible.select(
        "doc_id",
        F.explode(
            F.expr(f"transform(sequence(1, length(text) - {k - 1}, {stride}),"
                   f" i -> substring(text, i, {k}))")
        ).alias("gram"),
    ).distinct()
    gram_docs = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("nd")  # grams are distinct per doc already
    )
    dup = gram_docs.filter(F.col("nd") >= 2).select("gram")
    per_doc = (
        grams.join(dup.withColumn("is_dup", F.lit(1)), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_dup"),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            "n_grams",
            "n_dup",
            F.round(
                F.col("n_dup").cast("double") / F.col("n_grams").cast("double"), 6
            ).alias("dup_frac"),
        )
        .orderBy(F.desc("dup_frac"), "doc_id")
        .limit(top)
    )


def q_dedup_substring_kgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return substring_kgram_dup(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Group-aware k-fold split
# ---------------------------------------------------------------------------


def group_kfold_stats(events: DataFrame, folds: int = KFOLDS) -> DataFrame:
    """Per-fold balance stats for a user-keyed k-fold assignment.
    fold = hash(user_id) % k is a pure function of the group key, so a
    user CANNOT span folds — the leakage-free-by-construction split
    (contrast `split-temporal-leakage`, which must check)."""
    assigned = events.filter(F.col("user_id").isNotNull()).select(
        ((F.col("user_id") * F.lit(KNUTH)) % F.lit(folds)).cast("int").alias("fold"),
        "user_id",
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0))
        .alias("hit"),
    )
    g = assigned.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("hit").alias("k"),
    )
    return g.select(
        "fold",
        "n_events",
        "n_users",
        F.round(F.col("k").cast("double") / F.col("n_events").cast("double"), 6)
        .alias("purchase_share"),
    ).orderBy("fold")


def q_split_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    return group_kfold_stats(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B lift
# ---------------------------------------------------------------------------

CUPED_SPLIT = "2024-01-16"  # testdata spans 2024-01: days 1-15 pre, 16+ post


def cuped_lift(events: DataFrame) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data): the
    variance-reduction every experimentation platform applies before
    reading an A/B result.  Y = per-user post-period purchase count,
    X = the same user's PRE-period count, θ = cov(X,Y)/var(X) pooled;
    the adjusted lift subtracts θ·(mean_x_b − mean_x_a) from the raw
    arm difference, and ρ² = corr²(X,Y) is exactly the variance
    fraction CUPED removes.  Arms use `events-abtest-lift`'s md5-parity
    assignment.

    Determinism: every sufficient statistic (Σx, Σy, Σxy, Σx², Σy²,
    counts, per arm and pooled) accumulates in exact BIGINT; θ, the
    diffs, and ρ² are fixed fully-parenthesized double expressions on
    that one row — identical bits on both engines.  Scale shape: one
    per-user conditional aggregation (map-side combinable on user_id),
    then a single-row reduce; the closed forms mean NO per-user double
    arithmetic and no second pass for the adjusted metric."""
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    per_user = (
        events.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") < split), 1
                ).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= split), 1
                ).otherwise(0)
            ).alias("y"),
        )
    )
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % 2
    )
    pu = per_user.withColumn("arm", arm)
    g = pu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.count(F.when(F.col("arm") == 0, 1)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0)).alias("sx_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias("sy_a"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0)).alias("sx_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias("sy_b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_n = d("n") * d("sxy") - d("sx") * d("sy")  # n²·cov
    varx_n = d("n") * d("sxx") - d("sx") * d("sx")
    vary_n = d("n") * d("syy") - d("sy") * d("sy")
    theta = cov_n / F.nullif(varx_n, F.lit(0.0))
    diff_raw = d("sy_b") / F.nullif(d("n_b"), F.lit(0.0)) - d("sy_a") / F.nullif(
        d("n_a"), F.lit(0.0)
    )
    diff_x = d("sx_b") / F.nullif(d("n_b"), F.lit(0.0)) - d("sx_a") / F.nullif(
        d("n_a"), F.lit(0.0)
    )
    rho2 = (cov_n * cov_n) / F.nullif(varx_n * vary_n, F.lit(0.0))
    return g.select(
        F.col("n").alias("n_users"),
        "n_a",
        "n_b",
        F.round(theta, 6).alias("theta"),
        F.round(diff_raw, 6).alias("diff_raw"),
        F.round(diff_raw - theta * diff_x, 6).alias("diff_cuped"),
        F.round(rho2, 6).alias("rho2"),
    )


def q_events_cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cuped_lift(load_events(spark, sf_dir))


QUERIES = {
    "rank-ndcg-eval": q_rank_ndcg_eval,
    "rank-mrr-eval": q_rank_mrr_eval,
    "events-calibration-bins": q_events_calibration_bins,
    "events-theil-sen-trend": q_events_theil_sen_trend,
    "dedup-substring-kgram": q_dedup_substring_kgram,
    "split-group-kfold": q_split_group_kfold,
    "events-cuped-lift": q_events_cuped_lift,
}

ORACLES = {
    "rank-ndcg-eval": _ndcg_oracle(),
    "rank-mrr-eval": _mrr_oracle(),
    "events-calibration-bins": """
        WITH s AS (
          SELECT (event_id * 2654435761) % 1000 AS score_milli,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
          FROM events WHERE event_id IS NOT NULL),
        g AS (
          SELECT CAST(score_milli // 100 AS INTEGER) AS bin,
                 COUNT(*) AS n, SUM(score_milli) AS s_sum,
                 CAST(SUM(hit) AS BIGINT) AS k
          FROM s GROUP BY 1)
        SELECT bin, n,
               ROUND(CAST(s_sum AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0, 6)
                 AS avg_score,
               ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
               ROUND(ABS(CAST(s_sum AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0
                         - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS abs_gap
        FROM g ORDER BY bin
    """,
    "events-theil-sen-trend": """
        WITH daily AS (
          SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS x, COUNT(*) AS n
          FROM events WHERE ts IS NOT NULL GROUP BY 1),
        pairs AS (
          SELECT CAST(b.n - a.n AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
          FROM daily a JOIN daily b ON a.x < b.x),
        sl AS (
          SELECT COUNT(*) AS n_pairs, quantile_cont(slope, 0.5) AS slope_hat
          FROM pairs),
        res AS (
          SELECT quantile_cont(
                   CAST(d.n AS DOUBLE) - sl.slope_hat * CAST(d.x AS DOUBLE), 0.5)
                 AS intercept_hat
          FROM daily d, sl),
        nd AS (SELECT COUNT(*) AS n_days FROM daily)
        SELECT nd.n_days, sl.n_pairs,
               ROUND(sl.slope_hat, 6) AS slope,
               ROUND(res.intercept_hat, 6) AS intercept
        FROM nd, sl, res
    """,
    "dedup-substring-kgram": """
        WITH RECURSIVE grid(i) AS (
          -- stride grid bounded by the corpus' own max text length:
          -- generate_series rejects non-constant bounds in this DuckDB
          -- build, but a recursive CTE takes a scalar subquery — so a
          -- longer-doc corpus can never silently under-count grams
          -- (the old constant 4000 bound would have)
          SELECT 1
          UNION ALL
          SELECT i + 10 FROM grid
          WHERE i + 10 <= (SELECT COALESCE(MAX(length(text)), 0)
                           FROM documents)
        ),
        g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(grid.i AS INTEGER), 40) AS gram
          FROM documents CROSS JOIN grid
          WHERE text IS NOT NULL AND length(text) >= 40
            AND grid.i <= length(text) - 39),
        gd AS (SELECT gram, COUNT(*) AS nd FROM g GROUP BY 1),
        dup AS (SELECT gram FROM gd WHERE nd >= 2),
        per AS (
          SELECT g.doc_id, COUNT(*) AS n_grams,
                 CAST(SUM(CASE WHEN dup.gram IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_dup
          FROM g LEFT JOIN dup ON dup.gram = g.gram GROUP BY 1)
        SELECT doc_id, n_grams, n_dup,
               ROUND(CAST(n_dup AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS dup_frac
        FROM per ORDER BY dup_frac DESC, doc_id LIMIT 20
    """,
    "events-cuped-lift": """
        WITH pu AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                                AND ts < TIMESTAMP '2024-01-16'
                               THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                                AND ts >= TIMESTAMP '2024-01-16'
                               THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM events
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
          GROUP BY 1),
        a AS (
          SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 2
                   AS arm, x, y
          FROM pu),
        g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy,
                 CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
                 CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
                 CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n_b,
                 CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
                 CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b
          FROM a),
        e AS (
          SELECT n, n_a, n_b,
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS cov_n,
                 (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS varx_n,
                 (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS vary_n,
                 (CAST(sy_b AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0.0)
                  - CAST(sy_a AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0.0))
                   AS diff_raw,
                 (CAST(sx_b AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0.0)
                  - CAST(sx_a AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0.0))
                   AS diff_x
          FROM g)
        SELECT n AS n_users, n_a, n_b,
               ROUND(cov_n / NULLIF(varx_n, 0.0), 6) AS theta,
               ROUND(diff_raw, 6) AS diff_raw,
               ROUND(diff_raw - (cov_n / NULLIF(varx_n, 0.0)) * diff_x, 6)
                 AS diff_cuped,
               ROUND((cov_n * cov_n) / NULLIF(varx_n * vary_n, 0.0), 6) AS rho2
        FROM e
    """,
    "split-group-kfold": """
        WITH a AS (
          SELECT CAST((user_id * 2654435761) % 5 AS INTEGER) AS fold, user_id,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
          FROM events WHERE user_id IS NOT NULL),
        g AS (
          SELECT fold, COUNT(*) AS n_events,
                 COUNT(DISTINCT user_id) AS n_users,
                 CAST(SUM(hit) AS BIGINT) AS k
          FROM a GROUP BY 1)
        SELECT fold, n_events, n_users,
               ROUND(CAST(k AS DOUBLE) / CAST(n_events AS DOUBLE), 6)
                 AS purchase_share
        FROM g ORDER BY fold
    """,
}
