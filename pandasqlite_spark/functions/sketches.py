"""Mergeable-sketch aggregates — the 100 TB pre-aggregation primitive.

``approx-distinct-ok`` (operators/extended.py) already checks the
*direct* HyperLogLog estimate.  The keys here check the property that
actually matters at warehouse scale: HLL sketches are **mergeable**, so
a 100 TB table can keep tiny per-partition / per-day sketch partials in
a rollup cube and answer "distinct users over any date range" by
unioning kilobyte-sized sketches — no re-scan, no count-distinct
shuffle over raw rows.  Spark exposes the Apache DataSketches HLL
family natively (``hll_sketch_agg`` / ``hll_union`` /
``hll_union_agg`` / ``hll_sketch_estimate``), all JVM-side partial
aggregates.

Sketch *bytes* are engine-specific, so (as with ``approx-distinct-ok``)
the portable contract is the assertion, not the estimate: the query
emits booleans proving (a) the merged-partials estimate agrees with the
direct whole-table estimate and (b) both land within tolerance of the
exact count, alongside the exact count itself which the DuckDB oracle
reproduces.

Reference parity note: the reference delegates COUNT(DISTINCT) to
SQLite (`/root/reference/pandasqlite/pandasqlite.py:115` stores, SQLite
computes); sketches are part of the §2.D scale extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load

# 2^14 registers ≈ 0.8% relative standard error — comfortably inside
# the 5% assertion band while staying a ~16 KB sketch.
_LG_K = 14


def hll_partials(df: DataFrame, key: str, seg) -> DataFrame:
    """Per-segment HLL sketch partials — the thing a 100 TB pipeline
    materializes once per day/partition and unions forever after."""
    return df.groupBy(seg.alias("seg")).agg(
        F.hll_sketch_agg(key, _LG_K).alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers by merged monthly sketch partials vs the
    direct sketch vs the exact count.

    Two shuffles total, both tiny: the partials groupBy moves
    fixed-size sketch buffers (map-side partial aggregation applies —
    ``hll_sketch_agg`` is an ImperativeAggregate), and the final union
    reduces #months sketches on the driver-side single group.  The
    exact count-distinct is computed once here to *grade* the sketch;
    production would never run it."""
    o = load(spark, sf_dir, "orders")
    parts = hll_partials(o, "o_custkey", F.date_trunc("month", F.col("o_orderdate")))
    merged = parts.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", _LG_K)).alias("direct_est"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )
    return merged.crossJoin(direct).select(
        # merged partials must agree with the one-shot sketch: same
        # registers observed, only insertion order differs — allow
        # 0.5% for HLL union promotion effects.
        (
            F.abs(F.col("merged_est") - F.col("direct_est"))
            <= 0.005 * F.col("direct_est")
        ).alias("merge_consistent"),
        (
            F.abs(F.col("merged_est") - F.col("exact_custs"))
            <= 0.05 * F.col("exact_custs")
        ).alias("within_tol"),
        F.col("exact_custs"),
    )


def q_sketch_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-segment audience overlap by inclusion–exclusion over two
    HLL sketches: |A∩B| ≈ est(A) + est(B) − est(A∪B).

    This is the sketch-native answer to "how many customers ordered in
    BOTH 1995 and 1996" — at 100 TB each yearly sketch is a few KB
    from the rollup cube and the union is `hll_union`, a row-local
    binary op; no join between the two years' raw rows ever happens.
    The assertion grades the estimate against the exact overlap
    (±5% + 2 absolute, covering small-count integer jitter)."""
    o = load(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    sk = o.agg(
        F.hll_sketch_agg(F.when(yr == 1995, F.col("o_custkey")), _LG_K).alias("sk_a"),
        F.hll_sketch_agg(F.when(yr == 1996, F.col("o_custkey")), _LG_K).alias("sk_b"),
    ).select(
        F.hll_sketch_estimate("sk_a").alias("est_a"),
        F.hll_sketch_estimate("sk_b").alias("est_b"),
        F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")).alias("est_u"),
    )
    exact = (
        o.filter(yr == 1995)
        .select("o_custkey")
        .intersect(o.filter(yr == 1996).select("o_custkey"))
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return sk.crossJoin(exact).select(
        (
            F.abs(F.col("est_a") + F.col("est_b") - F.col("est_u") - F.col("exact_overlap"))
            <= 0.05 * F.col("exact_overlap") + 2
        ).alias("overlap_ok"),
        F.col("exact_overlap"),
    )


def q_sketch_quantile_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER mergeable sketch family: quantiles.
    ``approx_percentile`` (Greenwald-Khanna) is a partial aggregate —
    per-partition summaries merge map-side exactly like HLL partials —
    so a 100 TB table answers p50/p99 without sorting anything.  As
    with the HLL keys the sketch value is engine-specific, so the
    portable contract is the assertion: the approximate p50/p99 of
    order totals must land within the declared accuracy band of the
    exact percentiles (computed here only to grade the sketch —
    ``percentile`` exact is a full sort+selection production would
    never run).

    accuracy=1000 bounds the *rank* error at n/1000 rows; the value
    band below converts that to a value tolerance via the exact p45-55
    / p98-99.9 spreads, so the assertion is meaningful, not vacuous."""
    o = load(spark, sf_dir, "orders")
    # coalesce-to-true: on a zero-row (post-pruning) input both the
    # sketch and the exact percentiles are NULL — the band assertion is
    # vacuously satisfied, matching the oracle's constant-TRUE contract
    return o.agg(
        F.coalesce(
            F.expr("approx_percentile(o_totalprice, 0.5, 1000)").between(
                F.expr("percentile(o_totalprice, 0.45)"),
                F.expr("percentile(o_totalprice, 0.55)"),
            ),
            F.lit(True),
        ).alias("p50_ok"),
        F.coalesce(
            F.expr("approx_percentile(o_totalprice, 0.99, 1000)").between(
                F.expr("percentile(o_totalprice, 0.98)"),
                F.expr("percentile(o_totalprice, 0.999)"),
            ),
            F.lit(True),
        ).alias("p99_ok"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def heavy_hitters(docs: DataFrame, k: int = 20, m: int = 200) -> DataFrame:
    """Distributed heavy hitters by candidate-generation + exact
    recount — the two-pass pattern that finds top-k frequent items when
    the distinct-key space is too large to hash-aggregate globally:

    1. *Candidates*: each partition keeps its local top-``m`` tokens
       (``mapInPandas``; partition-local counting is vocabulary-bounded
       by Heaps' law — a strict-memory deployment would swap in
       space-saving eviction behind the same interface).  Misra-Gries
       soundness: any token with global count > N/m must be in some
       partition's local top-m, so the candidate union covers the true
       top-k whenever ``count(k-th item) > N/m``.
    2. *Verify*: exact recount restricted to candidates via a broadcast
       semi-join (candidates ≤ m × partitions — kilobytes), then the
       global top-k with exact counts.

    The emitted ``bound_ok`` column asserts the soundness condition
    itself, so the oracle (exact SQL top-k) both validates the answer
    AND confirms the approximation regime was sound — the same
    assertion-is-the-contract pattern as the HLL/quantile keys."""
    from pandasqlite_spark.functions.text import tokens

    tok = docs.select(F.explode(tokens()).alias("tok"))

    def local_top(batches):
        import pandas as pd
        from collections import Counter

        c: Counter = Counter()
        for pdf in batches:
            c.update(pdf["tok"])
        yield pd.DataFrame({"tok": [t for t, _ in c.most_common(m)]})

    cand = tok.mapInPandas(local_top, "tok string").distinct()
    recount = (
        tok.join(F.broadcast(cand), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    topk = recount.orderBy(F.desc("n"), "tok").limit(k)
    from pyspark.sql import Window as W

    ranked = topk.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("n"), "tok")).cast("int")
    )
    bounds = topk.agg(F.min("n").alias("kth")).crossJoin(
        tok.agg(F.count(F.lit(1)).alias("total_n"))
    )
    return (
        ranked.crossJoin(F.broadcast(bounds))
        .select(
            "rank", "tok", "n",
            (F.col("kth") > F.col("total_n") / F.lit(float(m))).alias("bound_ok"),
        )
        .orderBy("rank")
    )


def q_sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters(load(spark, sf_dir, "documents"))


CMS_W = 64  # counters per row
CMS_D = 3  # hash rows


def countmin_estimates(events: DataFrame, w: int = CMS_W, d: int = CMS_D) -> DataFrame:
    """Count-Min sketch frequency estimates vs exact counts, per user —
    the OTHER mergeable frequency sketch (HLL answers "how many
    distinct", CMS answers "how often is key k", in d·w counters that
    merge by plain addition across partitions/days).

    The build runs on the (key, count) AGGREGATE, not the raw stream:
    one partial-aggregated groupBy collapses 100 TB of events to |keys|
    rows, the d-row explode fans those out to d·|keys| counter updates,
    and a second groupBy onto the d·w counter grid is the sketch.
    Estimates probe the same md5 column hash (portable: no engine RNG)
    and take ``min`` over the d rows; CMS guarantees est ≥ true, which
    the ``overcount`` column exhibits and the unit test asserts.
    """
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    upd = counts.withColumn(
        "r", F.explode(F.array(*[F.lit(i) for i in range(d)]))
    ).withColumn(
        "c",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("r"), F.col("user_id"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % w,
    )
    sketch = upd.groupBy("r", "c").agg(F.sum("true_cnt").alias("cnt"))
    est = (
        upd.join(sketch, ["r", "c"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        counts.join(est, "user_id")
        .select(
            "user_id",
            "true_cnt",
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") - F.col("true_cnt")).cast("bigint").alias("overcount"),
        )
        .orderBy("user_id")
    )


def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pandasqlite_spark.operators.common import load_events

    return countmin_estimates(load_events(spark, sf_dir))


QUERIES = {
    "sketch-countmin": q_sketch_countmin,
    "sketch-heavy-hitters": q_sketch_heavy_hitters,
    "sketch-hll-merge": q_sketch_hll_merge,
    "sketch-hll-overlap": q_sketch_hll_overlap,
    "sketch-quantile-ok": q_sketch_quantile_ok,
}

ORACLES = {
    "sketch-countmin": """
        WITH counts AS (
          SELECT user_id, COUNT(*) AS true_cnt FROM events GROUP BY 1),
        upd AS (
          SELECT user_id, true_cnt, r.range AS r,
                 ('0x' || substr(md5(r.range || ':' || user_id), 1, 8))::BIGINT % 64
                   AS c
          FROM counts, range(3) r),
        sketch AS (SELECT r, c, SUM(true_cnt) AS cnt FROM upd GROUP BY 1, 2),
        est AS (
          SELECT u.user_id, MIN(s.cnt) AS cms_est
          FROM upd u JOIN sketch s ON s.r = u.r AND s.c = u.c
          GROUP BY 1)
        SELECT c.user_id, c.true_cnt,
               CAST(e.cms_est AS BIGINT) AS cms_est,
               CAST(e.cms_est - c.true_cnt AS BIGINT) AS overcount
        FROM counts c JOIN est e USING (user_id)
        ORDER BY c.user_id
    """,
    "sketch-heavy-hitters": r"""
        WITH tok AS (
          SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
          FROM documents),
        cnt AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
        ranked AS (
          SELECT tok, n,
                 CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS INTEGER) AS rank
          FROM cnt),
        topk AS (SELECT * FROM ranked WHERE rank <= 20)
        SELECT rank, tok, n,
               (SELECT MIN(n) FROM topk)
                 > (SELECT COUNT(*) FROM tok) / 200.0 AS bound_ok
        FROM topk ORDER BY rank
    """,
    "sketch-hll-merge": """
        SELECT TRUE AS merge_consistent, TRUE AS within_tol,
               count(DISTINCT o_custkey) AS exact_custs
        FROM orders
    """,
    "sketch-hll-overlap": """
        SELECT TRUE AS overlap_ok, COUNT(*) AS exact_overlap FROM (
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
          INTERSECT
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        )
    """,
    "sketch-quantile-ok": """
        SELECT TRUE AS p50_ok, TRUE AS p99_ok, COUNT(*) AS n_rows FROM orders
    """,
}


BLOOM_M = 1 << 14  # bits
BLOOM_K = 3        # hash functions


def q_sketch_bloom_fpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive rate, MEASURED against theory — the
    sketch-quality readout that tells you whether m/k are sized right
    before shipping the filter into a join prune (the MinHash twin is
    ``dedup-minhash-estimate``, the ANN twin ``simsearch-recall-eval``):
    even-parity order keys build an m=16384-bit, k=3 filter (md5-salted
    positions); odd-parity keys — guaranteed disjoint — probe it; a
    probe passing all k membership checks is a false positive, compared
    to the classic ``(1 − (1−1/m)^{kn})^k``.

    Scale shape: the filter is a DISTINCT set of set-bit positions
    (≤ m rows — tiny) that broadcasts into the probe join; build and
    probe are each one explode + groupBy.  Counts are integers; the
    two rates are one fixed IEEE expression each."""
    orders = load(spark, sf_dir, "orders")
    keyed = orders.select(F.col("o_orderkey").alias("key"))
    build = keyed.filter(F.col("key") % 2 == 0)
    probe = keyed.filter(F.col("key") % 2 == 1)

    def positions(df):
        return df.select(
            "key",
            F.explode(
                F.array(
                    *[
                        (
                            F.conv(
                                F.substring(
                                    F.md5(F.concat(F.lit(f"b{j}|"), F.col("key").cast("string"))),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % BLOOM_M
                        ).alias("p")
                        for j in range(BLOOM_K)
                    ]
                )
            ).alias("pos"),
        )

    bits = positions(build).select("pos").distinct()
    stats = build.agg(F.count(F.lit(1)).alias("n_ins")).crossJoin(
        F.broadcast(bits.agg(F.count(F.lit(1)).alias("n_bits")))
    )
    hits = (
        positions(probe)
        .join(F.broadcast(bits), "pos")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("nh"))
        .filter(F.col("nh") == BLOOM_K)
        .agg(F.count(F.lit(1)).alias("n_fp"))
    )
    n_probe = probe.agg(F.count(F.lit(1)).alias("n_probe"))
    out = stats.crossJoin(F.broadcast(hits)).crossJoin(F.broadcast(n_probe))
    theory = F.pow(
        F.lit(1.0)
        - F.pow(
            F.lit(1.0 - 1.0 / BLOOM_M),
            (F.lit(BLOOM_K) * F.col("n_ins")).cast("double"),
        ),
        F.lit(float(BLOOM_K)),
    )
    return out.select(
        "n_ins",
        "n_bits",
        "n_probe",
        "n_fp",
        F.round(F.col("n_fp").cast("double") / F.col("n_probe"), 6).alias("fpp_measured"),
        F.round(theory, 6).alias("fpp_theory"),
    )


QUERIES["sketch-bloom-fpp"] = q_sketch_bloom_fpp

_BLOOM_POS = "(('0x' || substr(md5('b{j}|' || CAST(key AS VARCHAR)), 1, 8))::BIGINT % {m})"

ORACLES["sketch-bloom-fpp"] = f"""
    WITH build AS (
      SELECT o_orderkey AS key FROM orders WHERE o_orderkey % 2 = 0),
    probe AS (
      SELECT o_orderkey AS key FROM orders WHERE o_orderkey % 2 = 1),
    bits AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(f"SELECT {_BLOOM_POS.format(j=j, m=BLOOM_M)} AS pos FROM build" for j in range(BLOOM_K))})),
    ppos AS (
      {" UNION ALL ".join(f"SELECT key, {_BLOOM_POS.format(j=j, m=BLOOM_M)} AS pos FROM probe" for j in range(BLOOM_K))}),
    fp AS (
      SELECT COUNT(*) AS n_fp FROM (
        SELECT p.key FROM ppos p JOIN bits USING (pos)
        GROUP BY p.key HAVING COUNT(*) = {BLOOM_K})),
    s AS (
      SELECT (SELECT COUNT(*) FROM build) AS n_ins,
             (SELECT COUNT(*) FROM bits) AS n_bits,
             (SELECT COUNT(*) FROM probe) AS n_probe,
             (SELECT n_fp FROM fp) AS n_fp)
    SELECT n_ins, n_bits, n_probe, n_fp,
           ROUND(CAST(n_fp AS DOUBLE) / n_probe, 6) AS fpp_measured,
           ROUND(POW(1.0 - POW({1.0 - 1.0 / BLOOM_M}, CAST({BLOOM_K} * n_ins AS DOUBLE)),
                     {float(BLOOM_K)}), 6) AS fpp_theory
    FROM s
"""
