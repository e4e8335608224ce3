#!/usr/bin/env python
"""Round-9 IVF/cosine profiling: split the q19 wall into stages and A/B
the explode->groupBy dot reduction against a row-local scaled-long fold
prototype (the _pair_cosine shape) for the three explode-based cosine
reductions (ivf_candidate_cosine, cosine_topk_exact, knn_join_exact).

Usage: python scripts/profile_ivf_r09.py [sf_dir] [n_runs]
Prints one JSON line with raw run lists + medians (noop sink, shared JVM,
interleaved A/B so machine drift hits both arms).
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pandasqlite_spark.functions.similarity import (  # noqa: E402
    N_CELLS,
    _collect_scaled_centroids,
    _dec_rows,
    cosine_topk_exact,
    ivf_assign,
    ivf_candidate_cosine,
    knn_join_exact,
)
from pandasqlite_spark.operators.common import load  # noqa: E402
from pandasqlite_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def _noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def _median_runs(label, build, spark, n=N_RUNS):
    runs = []
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        runs.append(round(_noop(build()), 3))
    spark.sparkContext.setJobDescription(None)
    return runs


# --- fold prototypes -------------------------------------------------------

def _q_rows_fold(queries: DataFrame, qid_col: str = "query_id") -> DataFrame:
    """(qid, qs, nqq): scaled-long query vector + exact norm, SUM-null
    semantics (all-null/empty -> null norm like the explode+SUM path)."""
    lvec = F.expr(
        "transform(qv, v -> CAST(CAST(CAST(v AS DOUBLE) AS DECIMAL(8,6))"
        " * 1000000 AS BIGINT))"
    )
    return queries.select(
        F.col(qid_col), lvec.alias("qs")
    ).select(
        qid_col,
        "qs",
        (
            F.expr(
                "aggregate(filter(transform(qs, x -> x * x), p -> p IS NOT NULL),"
                " CAST(NULL AS BIGINT),"
                " (s, v) -> CASE WHEN s IS NULL THEN v ELSE s + v END)"
            ).cast("double")
            / F.lit(1e12)
        ).alias("nqq"),
    )


_DOT_FOLD = (
    "aggregate(filter(zip_with(xs, qs, (a, b) -> a * b), p -> p IS NOT NULL),"
    " CAST(NULL AS BIGINT),"
    " (s, v) -> CASE WHEN s IS NULL THEN v ELSE s + v END)"
)


def _vec_rows_fold(emb: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, xs, nn) with SUM-null semantics on the norm; drops null/empty
    embeddings exactly as posexplode emits no rows for them."""
    src = emb.filter(F.col("embedding").isNotNull() & (F.size("embedding") > 0))
    lvec = F.expr(
        "transform(embedding, v -> CAST(CAST(CAST(v AS DOUBLE) AS DECIMAL(8,6))"
        " * 1000000 AS BIGINT))"
    )
    return src.select(F.col(id_col), lvec.alias("xs")).select(
        id_col,
        "xs",
        (
            F.expr(
                "aggregate(filter(transform(xs, x -> x * x), p -> p IS NOT NULL),"
                " CAST(NULL AS BIGINT),"
                " (s, v) -> CASE WHEN s IS NULL THEN v ELSE s + v END)"
            ).cast("double")
            / F.lit(1e12)
        ).alias("nn"),
    )


def ivf_candidate_cosine_fold(
    corpus: DataFrame, queries: DataFrame, cand: DataFrame
) -> DataFrame:
    cand_vecs = corpus.join(
        F.broadcast(cand.select("vec_id").distinct()), "vec_id", "left_semi"
    )
    c = _vec_rows_fold(cand_vecs)
    q = _q_rows_fold(queries)
    pairs = cand.join(c, "vec_id").join(F.broadcast(q), "query_id")
    dot = F.expr(_DOT_FOLD).cast("double") / F.lit(1e12)
    return pairs.select(
        "query_id",
        "vec_id",
        (dot / (F.sqrt("nn") * F.sqrt("nqq"))).alias("cosine"),
    )


def cosine_topk_exact_fold(
    emb: DataFrame, query: DataFrame, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    c = _vec_rows_fold(emb, id_col=id_col)
    q = _q_rows_fold(query.select(F.lit(0).alias("query_id"), "qv"))
    dot = F.expr(_DOT_FOLD).cast("double") / F.lit(1e12)
    return (
        c.crossJoin(F.broadcast(q.drop("query_id")))
        .select(id_col, (dot / (F.sqrt("nn") * F.sqrt("nqq"))).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


def knn_join_exact_fold(
    emb: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    c = _vec_rows_fold(emb)
    q = _q_rows_fold(queries)
    dot = F.expr(_DOT_FOLD).cast("double") / F.lit(1e12)
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (dot / (F.sqrt("nn") * F.sqrt("nqq"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine")
    )


def q19_fold(spark, d):
    emb = load(spark, d, "embeddings")
    q_n, k = 8, 5
    queries = emb.filter(F.col("vec_id") < q_n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= q_n)
    cents = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").cast("int").alias("cid"), "embedding"
    )
    crows = _collect_scaled_centroids(cents)
    a_corpus = ivf_assign(corpus, cents, centroid_rows=crows)
    a_q = ivf_assign(
        queries.select(F.col("query_id").alias("vec_id"), F.col("qv").alias("embedding")),
        cents,
        centroid_rows=crows,
    ).select(F.col("vec_id").alias("query_id"), "cell")
    cand = (
        a_q.join(a_corpus.select("vec_id", "cell"), "cell")
        .select("query_id", "vec_id")
        .localCheckpoint(eager=False)
    )
    s = ivf_candidate_cosine_fold(corpus, queries, cand)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        s.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def main() -> None:
    spark = get_spark("profile_ivf_r09")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).count()
    d = SF_DIR
    emb = load(spark, d, "embeddings")
    n_emb = emb.count()

    q_n = 8
    queries = emb.filter(F.col("vec_id") < q_n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= q_n)
    cents = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").cast("int").alias("cid"), "embedding"
    )

    out: dict = {"sf_dir": d, "n_emb": n_emb, "n_runs": N_RUNS, "stages": {}}

    # stage splits (each builds fresh so nothing is cached between runs)
    def corpus_assign():
        crows = _collect_scaled_centroids(cents)
        return ivf_assign(corpus, cents, centroid_rows=crows)

    def cand_only():
        crows = _collect_scaled_centroids(cents)
        a_c = ivf_assign(corpus, cents, centroid_rows=crows)
        a_q = ivf_assign(
            queries.select(
                F.col("query_id").alias("vec_id"), F.col("qv").alias("embedding")
            ),
            cents,
            centroid_rows=crows,
        ).select(F.col("vec_id").alias("query_id"), "cell")
        return a_q.join(a_c.select("vec_id", "cell"), "cell").select(
            "query_id", "vec_id"
        )

    from pandasqlite_spark.functions.similarity import q_simsearch_ivf_knn_join

    out["stages"]["assign_only"] = _median_runs(
        "assign_only", corpus_assign, spark
    )
    out["stages"]["cand_only"] = _median_runs("cand_only", cand_only, spark)

    # interleaved A/B: full q19 current vs fold
    cur_runs, fold_runs = [], []
    for _ in range(N_RUNS):
        spark.sparkContext.setJobDescription("q19_current")
        cur_runs.append(round(_noop(q_simsearch_ivf_knn_join(spark, d)), 3))
        spark.sparkContext.setJobDescription("q19_fold")
        fold_runs.append(round(_noop(q19_fold(spark, d)), 3))
    spark.sparkContext.setJobDescription(None)
    out["q19_current"] = cur_runs
    out["q19_fold"] = fold_runs

    # A/B cosine_topk_exact (q6/q16 dense arm shape)
    query1 = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    rest = emb.filter(F.col("vec_id") != 0)
    cur6, fold6 = [], []
    for _ in range(N_RUNS):
        spark.sparkContext.setJobDescription("topk_explode")
        cur6.append(round(_noop(cosine_topk_exact(rest, query1, k=100)), 3))
        spark.sparkContext.setJobDescription("topk_fold")
        fold6.append(round(_noop(cosine_topk_exact_fold(rest, query1, k=100)), 3))
    spark.sparkContext.setJobDescription(None)
    out["topk_explode"] = cur6
    out["topk_fold"] = fold6

    # A/B knn_join_exact
    curk, foldk = [], []
    for _ in range(N_RUNS):
        spark.sparkContext.setJobDescription("knn_explode")
        curk.append(round(_noop(knn_join_exact(corpus, queries, k=5)), 3))
        spark.sparkContext.setJobDescription("knn_fold")
        foldk.append(round(_noop(knn_join_exact_fold(corpus, queries, k=5)), 3))
    spark.sparkContext.setJobDescription(None)
    out["knn_explode"] = curk
    out["knn_fold"] = foldk

    # value identity spot-check (drives the later unit test; full proof
    # is the pinned bit-identity test + oracle sweep)
    a = sorted(
        (r["query_id"], r["vec_id"], r["cosine"])
        for r in knn_join_exact(corpus, queries, k=5).collect()
    )
    b = sorted(
        (r["query_id"], r["vec_id"], r["cosine"])
        for r in knn_join_exact_fold(corpus, queries, k=5).collect()
    )
    out["knn_identical"] = a == b

    for key in (
        "q19_current",
        "q19_fold",
        "topk_explode",
        "topk_fold",
        "knn_explode",
        "knn_fold",
    ):
        out[key + "_median"] = statistics.median(out[key])
    out["stages_median"] = {
        k: statistics.median(v) for k, v in out["stages"].items()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
