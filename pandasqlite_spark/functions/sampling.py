"""Deterministic corpus sampling for training-data pipelines.

Complements the row-level ``deterministic-sample`` key
(operators/extended.py): here the *rate varies per class* so the output
is class-balanced — the standard move when one language or source
dominates a pretraining corpus.

The sampler is hash-threshold based, not sort-based: each row computes
a uniform value from ``md5(id)`` and keeps itself iff
``value * n_class < 65536 * target``.  That is embarrassingly parallel
(no per-class sort, no window, no skewed rank shuffle — only the tiny
class-histogram aggregate, which broadcasts), reproducible across runs
and engines, and stable under re-partitioning — exactly what a 100 TB
corpus rebuild needs.  The trade-off vs rank-by-hash is binomial
jitter around the target size (~±sqrt(target)), which balance use
cases tolerate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load, load_events


def uniform_hash16(id_col) -> F.Column:
    """First 16 bits of md5(id) as a bigint in [0, 65536) — the same
    value DuckDB computes with ('0x' || substr(md5(id),1,4))::BIGINT,
    so sampling decisions are reproducible across engines."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10).cast(
        "bigint"
    )


def stratified_balanced_sample(
    df: DataFrame, cls_col: str, id_col: str
) -> DataFrame:
    """Downsample every class to ≈ the rarest class's size.

    Per-class keep-probability is ``target / n_class`` with
    ``target = min(n_class)``; membership is decided by the row's own
    hash, so the plan is scan → broadcast-join the class histogram →
    filter.  Integer-only comparison (``h * n_class < 65536 * target``)
    keeps the decision exact and engine-portable."""
    counts = df.groupBy(cls_col).agg(F.count(F.lit(1)).alias("n_g"))
    target = counts.agg(F.min("n_g").alias("t"))
    h = uniform_hash16(F.col(id_col))
    return (
        df.join(F.broadcast(counts), cls_col)
        .crossJoin(F.broadcast(target))
        .filter(h * F.col("n_g") < 65536 * F.col("t"))
        .select(id_col, cls_col)
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return stratified_balanced_sample(d, "lang", "doc_id")


# ≈98% / 1% / 1% of the 16-bit hash space
_TRAIN_CUT = 64225
_VAL_CUT = 64880


def split_assign(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic train/val/test assignment from the row's own id
    hash — no shuffle, no global state, stable when the corpus is
    rebuilt or re-partitioned, and a doc never migrates between splits
    as new data arrives (the property random splits lack)."""
    h = uniform_hash16(F.col(id_col))
    return df.select(
        id_col,
        F.when(h < _TRAIN_CUT, "train")
        .when(h < _VAL_CUT, "val")
        .otherwise("test")
        .alias("split"),
    )


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_assign(load(spark, sf_dir, "documents"), "doc_id")


def pack_sequences(
    df: DataFrame, seq_len: int = 512, n_buckets: int = 32
) -> DataFrame:
    """GPT-style concat-and-chunk packing: docs are laid out in a
    deterministic stream (hash bucket, then doc_id) and the stream is
    chunked every ``seq_len`` tokens; each doc gets its stream offset
    and chunk id.  The hash pre-bucketing is the scale lever — one
    shuffle keyed on bucket, then an independent running sum per
    bucket, so packing 100 TB parallelizes across buckets instead of
    one global sequential cumsum (pick n_buckets ≈ shards you intend
    to write)."""
    from pandasqlite_spark.functions.text import token_count
    from pyspark.sql import Window as W

    d = df.select(
        "doc_id",
        token_count().alias("n_tokens"),
        (uniform_hash16(F.col("doc_id")) % n_buckets).alias("bucket"),
    )
    w = (
        W.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "doc_id",
        "bucket",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / seq_len).alias("chunk_id"),
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load(spark, sf_dir, "documents"))


def token_weighted_mixture(df: DataFrame) -> DataFrame:
    """Equal-token data mixture: downsample every source to ≈ the
    smallest source's TOKEN total (not doc count — long-doc sources
    must shed more rows).  Same hash-threshold machinery as the
    stratified sampler; the decision compare runs in decimal so the
    integer products stay exact at 100 TB token counts."""
    from pandasqlite_spark.functions.text import token_count

    tok = df.select("doc_id", "source", token_count().alias("nt"))
    totals = tok.groupBy("source").agg(F.sum("nt").alias("tot"))
    tmin = totals.agg(F.min("tot").alias("t"))
    h = uniform_hash16(F.col("doc_id")).cast("decimal(20,0)")
    return (
        tok.join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(tmin))
        .filter(h * F.col("tot") < F.lit(65536).cast("decimal(20,0)") * F.col("t"))
        .select("doc_id", "source", "nt")
    )


def q_mixture_token_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_weighted_mixture(load(spark, sf_dir, "documents"))


def sqrt_temperature_mixture(df: DataFrame) -> DataFrame:
    """Temperature-scaled source mixture weights (τ = 0.5 ⇒ weight ∝
    √tokens) — the standard multilingual/multi-source rebalancing rule:
    big sources are damped, small sources up-weighted, without the
    winner-take-all of proportional sampling.

    Determinism: √ is IEEE-correctly-rounded in both engines (unlike
    `pow`, whose libm differs), the √ is rounded to a DECIMAL(18,6)
    weight so the normalizing sum is exact and order-independent, and
    the final share divides two bit-identical doubles.  One groupBy on
    `source` + one broadcast of the one-row normalizing sum — nothing here scales with corpus size."""
    from pandasqlite_spark.functions.text import token_count

    totals = (
        df.select("source", token_count().alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("total_tokens"))
    )
    w = F.round(F.sqrt(F.col("total_tokens").cast("double")), 6).cast(
        "decimal(18,6)"
    )
    weighted = totals.withColumn("w", w)
    denom = weighted.agg(F.sum("w").alias("denom"))
    return (
        weighted.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "total_tokens",
            F.round(
                F.col("w").cast("double") / F.col("denom").cast("double"), 9
            ).alias("share"),
        )
        .orderBy("source")
    )


def q_mixture_sqrt_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sqrt_temperature_mixture(load(spark, sf_dir, "documents"))


N_SHUFFLE_SHARDS = 64


def shuffle_assign(df: DataFrame, id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Deterministic training-order shuffle: every row gets a seeded
    pseudo-random ``sort_key = md5(seed:id)`` and a ``shard`` that is a
    RANGE of the key space (``floor(h16·N/65536)``, so shard is
    monotone in the key).  Writing ``partitionBy(shard)`` +
    ``sortWithinPartitions(sort_key)`` then reproduces ONE global
    pseudo-random order — (shard asc, key asc) ≡ key asc — without the
    single-partition global sort / row_number a naive ORDER BY
    rand() needs.  Reshuffling between epochs is a seed change, not a
    data move; the order is identical on any cluster size."""
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    h16 = F.conv(F.substring(key, 1, 4), 16, 10).cast("bigint")
    shard = F.floor(h16 * N_SHUFFLE_SHARDS / F.lit(65536)).cast("int")
    return df.select(id_col, shard.alias("shard"), key.alias("sort_key"))


def q_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shuffle_assign(load(spark, sf_dir, "documents"))


def reservoir_per_group(
    df: DataFrame, grp_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Exactly-k-per-group deterministic "reservoir" sample: rank rows
    within each group by ``md5(id)`` (id tie-break) and keep rank ≤ k.

    This is the fixed-size complement to the *rate*-based
    ``stratified_balanced_sample``: eval sets, human-review batches,
    and per-source "show me 5 examples" all want exactly k rows per
    group no matter how large the group is.  Classic reservoir sampling is
    a sequential algorithm; hashing replaces the RNG stream so the
    result is a pure function of the data — reproducible across runs,
    engines, cluster sizes, and re-partitioning.

    Scale: one hash-partitioned rank window per group.  A mega-group
    makes a hot window partition, but the window needs only a per-task
    top-k heap-equivalent sort; if a group is truly pathological,
    pre-filter with ``h16 < threshold`` (keep-probability ≫ k/n_group)
    to cut rows before the window — the same two-phase move as
    ``salted_join``."""
    from pyspark.sql import Window as W

    w = W.partitionBy(grp_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.select(grp_col, id_col)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def q_sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return reservoir_per_group(
        load(spark, sf_dir, "documents"), "lang", "doc_id", k=3
    )


def weighted_priority_sample(df: DataFrame, k: int = 50) -> DataFrame:
    """Weighted sample WITHOUT replacement, k of n, Efraimidis–Spirakis
    A-ES family: every row draws a uniform ``u`` from its md5 hash and
    gets priority ``-ln(u) / w`` (equivalent to ranking by ``u^(1/w)``);
    the k SMALLEST priorities win, so heavy rows (weight = ``n_chars``)
    are proportionally more likely — the standard one-pass weighted
    pick for "sample a review set favoring long documents".

    Scale: priority is a pure per-row expression (no RNG state, no
    sequential reservoir), and the global pick is an ascending top-k —
    ``TakeOrderedAndProject``, per-partition heaps + a k-row reduce, no
    full sort, no shuffle of the data itself.  Deterministic under any
    partitioning because the hash replaces the RNG stream.  Priorities
    are rounded to 9 decimals (doc_id tie-break) so the pick is stable
    across engines' libm."""
    h16 = uniform_hash16(F.col("doc_id"))
    u = (h16 + F.lit(0.5)) / F.lit(65536.0)
    pri = F.round(-F.log(u) / F.col("n_chars").cast("double"), 9)
    # null-pin: NULLS LAST — a null-weight row has no defined priority
    # and must not win the ascending top-k (Spark's ASC default would
    # put all null priorities FIRST; DuckDB's puts them last)
    return (
        df.select("doc_id", F.col("n_chars").alias("weight"), pri.alias("priority"))
        .orderBy(F.col("priority").asc_nulls_last(), "doc_id")
        .limit(k)
    )


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_priority_sample(load(spark, sf_dir, "documents"))


QUERIES = {
    "sample-weighted-topk": q_sample_weighted,
    "sample-stratified": q_sample_stratified,
    "split-assign": q_split_assign,
    "pack-sequences": q_pack_sequences,
    "mixture-token-weighted": q_mixture_token_weighted,
    "mixture-sqrt-temperature": q_mixture_sqrt_temperature,
    "shuffle-deterministic": q_shuffle_deterministic,
    "sample-reservoir-group": q_sample_reservoir_group,
}

ORACLES = {
    "sample-weighted-topk": """
        SELECT doc_id, n_chars AS weight,
               ROUND(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                          + 0.5) / 65536.0)
                     / CAST(n_chars AS DOUBLE), 9) AS priority
        FROM documents
        ORDER BY priority, doc_id
        LIMIT 50
    """,
    "sample-stratified": """
        WITH counts AS (SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY lang),
        tgt AS (SELECT MIN(n_g) AS t FROM counts)
        SELECT doc_id, lang
        FROM documents JOIN counts USING (lang) CROSS JOIN tgt
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT * n_g
              < 65536 * t
    """,
    "split-assign": """
        SELECT doc_id,
               CASE WHEN h < 64225 THEN 'train'
                    WHEN h < 64880 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS h
              FROM documents)
    """,
    "pack-sequences": r"""
        WITH d AS (
          SELECT doc_id,
                 CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INTEGER)
                   AS n_tokens,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 32
                   AS bucket
          FROM documents)
        SELECT doc_id, bucket, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                      PARTITION BY bucket ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS start_offset,
               CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                      PARTITION BY bucket ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    / 512.0) AS BIGINT) AS chunk_id
        FROM d
    """,
    "mixture-token-weighted": r"""
        WITH tok AS (
          SELECT doc_id, source,
                 CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INTEGER)
                   AS nt
          FROM documents),
        totals AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS tot
                   FROM tok GROUP BY source),
        tmin AS (SELECT MIN(tot) AS t FROM totals)
        SELECT k.doc_id, k.source, k.nt
        FROM tok k JOIN totals USING (source) CROSS JOIN tmin
        WHERE ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 4))::BIGINT
                * totals.tot < 65536 * tmin.t
    """,
    "mixture-sqrt-temperature": r"""
        WITH totals AS (
          SELECT source,
                 CAST(SUM(len(string_split_regex(trim(lower(text)), '\s+')))
                   AS BIGINT) AS total_tokens
          FROM documents GROUP BY source),
        weighted AS (
          SELECT source, total_tokens,
                 CAST(ROUND(sqrt(CAST(total_tokens AS DOUBLE)), 6)
                   AS DECIMAL(18,6)) AS w
          FROM totals)
        SELECT source, total_tokens,
               ROUND(CAST(w AS DOUBLE)
                     / CAST(SUM(w) OVER () AS DOUBLE), 9) AS share
        FROM weighted ORDER BY source
    """,
    "shuffle-deterministic": """
        SELECT doc_id,
               CAST(FLOOR(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                          * 64 / 65536) AS INTEGER) AS shard,
               md5('42:' || CAST(doc_id AS VARCHAR)) AS sort_key
        FROM documents
    """,
    "sample-reservoir-group": """
        SELECT lang, doc_id, CAST(rn AS INTEGER) AS rn FROM (
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
        WHERE rn <= 3
    """,
}


TEMPORAL_CUT = "2024-01-22"


def q_split_temporal_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal holdout split + leakage diagnostic: train = events
    before the cutoff, test = events at/after it, and the readout every
    temporal split needs BEFORE training — how many users (the entity a
    model memorizes) appear on BOTH sides.  High overlap means the
    "holdout" mostly re-tests seen users; user-level splits
    (``split-assign``) are the fix, and this key is the measurement
    that tells you.

    Scale shape: two partial-aggregated distinct-collapses on user_id
    (the same combinable shape as ``events-abtest-lift``) and a 1-row
    summary — counts are exact longs, the two share ratios one fixed
    IEEE division each."""
    ev = load_events(spark, sf_dir)
    cut = F.lit(TEMPORAL_CUT).cast("date")
    tagged = ev.select("user_id", (F.to_date("ts") >= cut).alias("is_test"))
    per_user = tagged.groupBy("user_id").agg(
        F.max(F.when(~F.col("is_test"), 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("is_test"), 1).otherwise(0)).alias("in_test"),
    )
    rows = tagged.agg(
        F.count(F.when(~F.col("is_test"), 1)).alias("n_train_rows"),
        F.count(F.when(F.col("is_test"), 1)).alias("n_test_rows"),
    )
    users = per_user.agg(
        F.sum("in_train").alias("n_train_users"),
        F.sum("in_test").alias("n_test_users"),
        F.sum(F.col("in_train") * F.col("in_test")).alias("n_overlap_users"),
    )
    return rows.crossJoin(F.broadcast(users)).select(
        "n_train_rows", "n_test_rows",
        F.col("n_train_users").cast("bigint").alias("n_train_users"),
        F.col("n_test_users").cast("bigint").alias("n_test_users"),
        F.col("n_overlap_users").cast("bigint").alias("n_overlap_users"),
        F.round(
            F.col("n_overlap_users").cast("double") / F.col("n_test_users"), 6
        ).alias("test_user_leakage"),
    )


QUERIES["split-temporal-leakage"] = q_split_temporal_leakage

ORACLES["split-temporal-leakage"] = """
    WITH tagged AS (
      SELECT user_id, CAST(ts AS DATE) >= DATE '2024-01-22' AS is_test
      FROM events),
    pu AS (
      SELECT user_id,
             MAX(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS in_train,
             MAX(CASE WHEN is_test THEN 1 ELSE 0 END) AS in_test
      FROM tagged GROUP BY 1),
    rows_ AS (
      SELECT COUNT(CASE WHEN NOT is_test THEN 1 END) AS n_train_rows,
             COUNT(CASE WHEN is_test THEN 1 END) AS n_test_rows
      FROM tagged),
    users AS (
      SELECT CAST(SUM(in_train) AS BIGINT) AS n_train_users,
             CAST(SUM(in_test) AS BIGINT) AS n_test_users,
             CAST(SUM(in_train * in_test) AS BIGINT) AS n_overlap_users
      FROM pu)
    SELECT n_train_rows, n_test_rows, n_train_users, n_test_users, n_overlap_users,
           ROUND(CAST(n_overlap_users AS DOUBLE) / n_test_users, 6) AS test_user_leakage
    FROM rows_, users
"""


EPOCH_BUDGET_MULT = 2  # token budget = 2× corpus mass (forces >1 epoch somewhere)
EPOCH_CAP = 4.0


def epoch_schedule(df: DataFrame) -> DataFrame:
    """Per-source epoch plan under a global token budget: the step
    AFTER `mixture-sqrt-temperature` decides shares — given budget
    ``B = 2× corpus tokens``, each source trains for
    ``epochs = B·share / source_tokens`` passes (capped at 4.0, the
    standard repeated-data guardrail à la Muennighoff et al.), with
    the cap flagged so the scheduler can redistribute the surplus.

    Determinism: token totals are exact longs, shares come from the
    9-dp-rounded √-damped weights, and epochs is one double
    multiply/divide rounded to 6 dp — identical IEEE sequence in both
    engines.  Scale: one `source` groupBy + two 1-row broadcasts
    (corpus total, weight normalizer); nothing scales with corpus
    size after the collapse.
    """
    shares = sqrt_temperature_mixture(df)
    corpus = shares.agg(F.sum("total_tokens").alias("corpus_tokens"))
    raw = (
        F.lit(float(EPOCH_BUDGET_MULT))
        * F.col("corpus_tokens").cast("double")
        * F.col("share")
        / F.col("total_tokens").cast("double")
    )
    return (
        shares.crossJoin(F.broadcast(corpus))
        .select(
            "source",
            "total_tokens",
            "share",
            F.round(F.least(raw, F.lit(EPOCH_CAP)), 6).alias("epochs"),
            (raw >= F.lit(EPOCH_CAP)).alias("capped"),
        )
        .orderBy("source")
    )


def q_mixture_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    return epoch_schedule(load(spark, sf_dir, "documents"))


QUERIES["mixture-epoch-schedule"] = q_mixture_epoch_schedule

ORACLES["mixture-epoch-schedule"] = r"""
    WITH totals AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(trim(lower(text)), '\s+')))
               AS BIGINT) AS total_tokens
      FROM documents GROUP BY source),
    weighted AS (
      SELECT source, total_tokens,
             CAST(ROUND(sqrt(CAST(total_tokens AS DOUBLE)), 6)
               AS DECIMAL(18,6)) AS w
      FROM totals),
    shares AS (
      SELECT source, total_tokens,
             ROUND(CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE), 9)
               AS share
      FROM weighted),
    corpus AS (SELECT SUM(total_tokens) AS corpus_tokens FROM shares)
    SELECT source, total_tokens, share,
           ROUND(LEAST(2.0 * CAST(corpus_tokens AS DOUBLE) * share
                       / CAST(total_tokens AS DOUBLE), 4.0), 6) AS epochs,
           2.0 * CAST(corpus_tokens AS DOUBLE) * share
             / CAST(total_tokens AS DOUBLE) >= 4.0 AS capped
    FROM shares, corpus ORDER BY source
"""
