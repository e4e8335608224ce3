"""Centroid operators over the embedding space (SURVEY.md §2.D scale
extensions): per-label centroids and nearest-centroid assignment — the
two primitives under corpus clustering, IVF index build, and
semantic-bucket sampling.

Exactness strategy (shared with :mod:`pandasqlite_spark.functions
.similarity`): float → double → ``decimal(8,6)`` per element, decimal
sums (order-independent), and a single decimal→double conversion at the
surface, so the values are bit-identical to the DuckDB oracle.

Cross-label distance comparison uses the *scaled* squared distance
``Σ_dim (n·v − S)² = n²·Σ_dim (v − c)²`` where ``S`` is the exact
per-dimension decimal sum and ``n`` the label count — all decimal
arithmetic, no double fold — then divides by ``n²`` in double once.
That keeps the argmin exact without materializing a rounded centroid.

Scale shape: the centroid table is labels × dims rows (tiny at any
corpus size) and always broadcasts; the vector side is one posexplode
(row-local) and partial-aggregated groupBys, so the only exchanges
carry ``labels`` skinny rows per vector, never raw vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load, spread_scan

_DEC = "decimal(8,6)"


def _exploded(emb: DataFrame, *cols: str) -> DataFrame:
    """(…cols, dim, v): one row per vector element, element as exact
    decimal (via the load-bearing double hop — see similarity.py)."""
    return emb.select(
        *cols, F.posexplode("embedding").alias("dim", "x")
    ).select(*cols, "dim", F.col("x").cast("double").cast(_DEC).alias("v"))


def label_centroid_sums(emb: DataFrame, label_col: str = "label") -> DataFrame:
    """(label, dim, s, n): exact per-dimension decimal sum + count.
    The centroid itself is ``s / n``; keeping (s, n) unreduced lets the
    assignment below stay in exact decimal arithmetic."""
    return (
        _exploded(emb, label_col)
        .groupBy(label_col, "dim")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector in long (label, dim, centroid) form —
    long form is itself the scale-safe layout (no giant array rows),
    and the exact-decimal sum ÷ count division happens once, in
    double."""
    sums = label_centroid_sums(
        spread_scan(load(spark, sf_dir, "embeddings"), "vec_id")
    )
    return sums.select(
        "label",
        "dim",
        (F.col("s").cast("double") / F.col("n")).alias("centroid"),
    )


def _dec12_to_double(col: str) -> F.Column:
    """Engine-portable decimal(·,12)→double: split into integer part +
    ≤12-digit fraction and convert each EXACTLY before one IEEE add.

    A direct cast diverges by 1 ulp between engines once the scaled
    integer passes 2^53 (observed at sf0.1: Spark's BigDecimal cast is
    correctly rounded in one step, DuckDB converts the scaled int64 to
    double FIRST — inexact past 2^53 — then divides: double rounding).
    Both pieces here stay under 2^53 (integer part while
    n ≤ ~6·10⁶ rows/label; the scale-12 fraction is ≤ 10^12), so each
    engine performs only exact conversions + correctly-rounded IEEE
    ops — bit-identical results.

    The narrowing cast to (28,12) first is load-bearing on the SPARK
    side: subtracting floor() from the raw decimal(38,12) aggregate
    would need precision 39, and Spark resolves that overflow by
    silently REDUCING THE SCALE of the result (frac came back rounded
    to 10 digits) — the narrower operand keeps the subtraction exact.
    Exact while sq < 10^16 (≈2^53), i.e. n ≤ ~6·10⁶ rows per label."""
    sq = F.col(col).cast("decimal(28,12)")
    hi = F.floor(sq)
    frac = (sq - hi).cast("decimal(14,12)")
    return hi.cast("double") + frac.cast("double")


def assign_nearest_centroid(emb: DataFrame, cent_sums: DataFrame) -> DataFrame:
    """(vec_id, nearest_label, dist): each vector assigned to the label
    whose centroid is nearest in squared L2, ties broken by label.

    Plan: posexplode (row-local) → broadcast-join the (label, dim)
    sums table → partial-agg groupBy (vec_id, label) → window argmin.
    The exchanges move ``labels`` rows per vector (vec_id, label,
    decimal accumulator) — never embeddings."""
    ex = _exploded(emb, "vec_id")
    # n·v − S fits (15,6) exactly: no rounding in either engine
    term = F.expr("CAST(n * v - s AS DECIMAL(15,6))")
    per_label = (
        ex.join(F.broadcast(cent_sums), "dim")
        .groupBy("vec_id", "label", "n")
        .agg(F.sum(term * term).alias("sq"))
        .select(
            "vec_id",
            "label",
            (_dec12_to_double("sq") / (F.col("n") * F.col("n"))).alias("dist"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "label")
    return (
        per_label.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("label").alias("nearest_label"), "dist")
    )


def q_embedding_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread once; both the sums and the assignment explodes reuse it
    # (see kmeans_lloyd's parallelism note)
    emb = spread_scan(load(spark, sf_dir, "embeddings"), "vec_id")
    return assign_nearest_centroid(emb, label_centroid_sums(emb))


def kmeans_lloyd(
    emb: DataFrame, k: int = 8, iters: int = 2, *, checkpoint: bool = False
) -> DataFrame:
    """Lloyd's k-means as pure DataFrame composition: deterministic
    seeding (``vec_id % k``), then ``iters`` rounds of recompute-sums →
    reassign.  Every round is exact decimal arithmetic, so the final
    (vec_id, label, dist) is engine-reproducible — the DuckDB oracle
    unrolls the same rounds as nested CTEs.

    At scale, pass ``checkpoint=True``: each round re-reads the vector
    table but the *assignment* lineage would otherwise deepen by one
    join + two aggregations per round; localCheckpoint truncates it so
    round N's plan doesn't replay rounds 1..N-1.  Empty clusters simply
    drop out of the sums table (both engines agree).

    Parallelism (round 9, guide §2.5): every round's heavy work — the
    |vectors|·dims·k decimal multiply-adds of the assignment and the
    |vectors|·dims centroid partial sums — executes map-side inside the
    posexplode, i.e. inside the SCAN task; an under-split file layout
    (sf1 = 1–2 row groups) serializes it onto 1–2 cores.  One spread of
    the vector table to session parallelism feeds every round of both
    subtrees (the exchange is planned once and reused); all reductions
    are order-free (decimal sums, counts, a total-order window argmin),
    so results are bit-identical."""
    emb = spread_scan(emb, "vec_id")
    assigned = emb.select("vec_id", (F.col("vec_id") % k).cast("int").alias("label"))
    for _ in range(iters):
        sums = label_centroid_sums(emb.drop("label").join(assigned, "vec_id"))
        out = assign_nearest_centroid(emb, sums)
        assigned = out.select("vec_id", F.col("nearest_label").alias("label"))
        if checkpoint:
            assigned = assigned.localCheckpoint(eager=False)
    return out


def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_lloyd(load(spark, sf_dir, "embeddings"), k=8, iters=2)


def _kmeans_cte_body(k: int = 8, iters: int = 2) -> str:
    """Unrolled Lloyd rounds as nested CTEs (ends at ``a{iters}`` with
    columns vec_id, label, dist), mirroring kmeans_lloyd."""
    parts = [
        f"WITH ex AS ({_EX}),",
        f"a0 AS (SELECT vec_id, CAST(vec_id % {k} AS INT) AS label FROM embeddings)",
    ]
    for i in range(1, iters + 1):
        prev = f"a{i - 1}"
        parts.append(f""",
        cent{i} AS (
          SELECT p.label, e.dim, SUM(e.v) AS s, COUNT(*) AS n
          FROM ex e JOIN {prev} p USING (vec_id)
          GROUP BY p.label, e.dim),
        dsum{i} AS (
          SELECT e.vec_id, c.label, c.n,
                 -- (19,6): force int128 decimal multiply in DuckDB --
                 -- its (15,6)x(15,6) product stays in int64 storage
                 -- (DECIMAL(18,12)) and overflows once |term| > ~1e3,
                 -- which sf1 magnitudes reach (round-4 sweep find);
                 -- Spark widens (15,6)x(15,6) to (31,12) on its own,
                 -- so the engine side needs no change and the VALUES
                 -- are identical in both engines
                 SUM(CAST(c.n * e.v - c.s AS DECIMAL(19,6))
                     * CAST(c.n * e.v - c.s AS DECIMAL(19,6))) AS sq
          FROM ex e JOIN cent{i} c ON e.dim = c.dim
          GROUP BY e.vec_id, c.label, c.n),
        d{i} AS (
          -- split conversion: see _dec12_to_double (1-ulp cast parity)
          SELECT vec_id, label,
                 (CAST(FLOOR(sq) AS DOUBLE)
                  + CAST(CAST(sq - FLOOR(sq) AS DECIMAL(14,12)) AS DOUBLE))
                   / (n * n) AS dist
          FROM dsum{i}),
        a{i} AS (
          SELECT vec_id, label, dist FROM (
            SELECT vec_id, label, dist,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, label) AS rn
            FROM d{i}) WHERE rn = 1)""")
    return "\n".join(parts)


def _kmeans_oracle(k: int = 8, iters: int = 2) -> str:
    return (
        _kmeans_cte_body(k, iters)
        + f"\nSELECT vec_id, label AS nearest_label, dist FROM a{iters}"
    )


def q_simsearch_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over LEARNED cells: Lloyd's k-means builds the coarse
    quantizer (vs the deterministic stand-in cells of `simsearch-ivf`),
    then only the query's cell is reranked with the exact cosine.
    Everything is deterministic, so the full index build + search is
    value-checked against the unrolled-CTE oracle."""
    from pandasqlite_spark.functions.similarity import cosine_topk_exact

    emb = load(spark, sf_dir, "embeddings")
    assign = kmeans_lloyd(emb, k=8, iters=2).select(
        "vec_id", F.col("nearest_label").alias("cell")
    )
    qcell = assign.filter(F.col("vec_id") == 0).select("cell")
    cand_ids = (
        assign.join(F.broadcast(qcell), "cell")
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
    )
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return cosine_topk_exact(emb.join(cand_ids, "vec_id"), query, k=5)


def _ivf_kmeans_oracle(k: int = 8, iters: int = 2) -> str:
    return (
        _kmeans_cte_body(k, iters)
        + f""",
        qcell AS (SELECT label AS cell FROM a{iters} WHERE vec_id = 0),
        cand AS (SELECT a.vec_id FROM a{iters} a, qcell
                 WHERE a.label = qcell.cell AND a.vec_id <> 0),
        q AS (SELECT dim, v AS qx FROM ex WHERE vec_id = 0),
        nq AS (SELECT CAST(SUM(qx * qx) AS DOUBLE) AS nq FROM q),
        per AS (
          SELECT e.vec_id,
                 CAST(SUM(e.v * q.qx) AS DOUBLE) AS dot,
                 CAST(SUM(e.v * e.v) AS DOUBLE) AS ne
          FROM ex e JOIN q ON e.dim = q.dim
          WHERE e.vec_id IN (SELECT vec_id FROM cand)
          GROUP BY e.vec_id)
        SELECT vec_id, dot / (sqrt(ne) * sqrt(nq.nq)) AS cosine
        FROM per, nq
        ORDER BY cosine DESC, vec_id
        LIMIT 5"""
    )


def pca_summary(emb: DataFrame) -> DataFrame:
    """Distributed PCA over the embedding column — the
    whitening/compression primitive of every embedding pipeline — via
    the canonical two-stage shape for dense linear algebra at scale:

    1. *Partials*: each partition computes its LOCAL Gram matrix
       ``Xᵀ X`` (d×d), coordinate sums, and count with one numpy matmul
       inside ``mapInPandas`` — Arrow-batched, no per-row Python; the
       shuffle carries d²-bounded partials per partition, never vectors.
    2. *Merge + eigen*: the d² cells sum in one tiny groupBy; the d×d
       covariance (``G/n − μμᵀ``) is collected (bounded by the
       embedding dimension, not the data) and eigendecomposed with
       numpy on the driver — the same tiny-matrix-on-driver move as
       k-means centroid updates.

    Eigenvectors are not SQL-expressible, so (sketch-key pattern) the
    contract is assertions + exactly-checkable scalars: total variance
    (trace) and max per-axis variance reproduce in DuckDB's
    ``var_pop``; ``pc1_dominates`` asserts λ₁ ≥ max axis variance — a
    mathematical invariant of a correct eigensolve (the top PC explains
    at least as much variance as any coordinate axis)."""

    def gram_partial(batches):
        import numpy as np
        import pandas as pd

        G = None
        s = None
        cnt = 0
        for pdf in batches:
            # null embeddings carry no variance mass (np.stack over a
            # ragged None mix crashes the worker); DuckDB's unnest
            # likewise contributes nothing for a NULL array
            pdf = pdf[pdf["embedding"].notna()]
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if G is None:
                d = X.shape[1]
                G = np.zeros((d, d))
                s = np.zeros(d)
            G += X.T @ X
            s += X.sum(axis=0)
            cnt += len(X)
        if cnt == 0:
            return
        d = G.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        out = pd.DataFrame(
            {"i": ii.ravel(), "j": jj.ravel(), "g": G.ravel()}
        )
        mean_rows = pd.DataFrame({"i": np.arange(d), "j": -1, "g": s})
        cnt_row = pd.DataFrame({"i": [-1], "j": [-1], "g": [float(cnt)]})
        yield pd.concat([out, mean_rows, cnt_row], ignore_index=True)

    partials = emb.select("embedding").mapInPandas(
        gram_partial, "i int, j int, g double"
    )
    merged = partials.groupBy("i", "j").agg(F.sum("g").alias("g")).collect()

    import numpy as np

    schema = "n bigint, total_var double, max_axis_var double, pc1_dominates boolean"
    if not merged:  # empty corpus: the oracle's empty-aggregate row
        # (COUNT 0, NULL variances, vacuously-true dominance)
        return emb.sparkSession.createDataFrame([(0, None, None, True)], schema)
    n = next(r.g for r in merged if r.i == -1 and r.j == -1)
    d = max(r.i for r in merged) + 1
    G = np.zeros((d, d))
    s = np.zeros(d)
    for r in merged:
        if r.i == -1:
            continue
        if r.j == -1:
            s[r.i] = r.g
        else:
            G[r.i, r.j] = r.g
    mu = s / n
    C = G / n - np.outer(mu, mu)
    eigvals = np.linalg.eigvalsh(C)
    lam1 = float(eigvals[-1])
    trace = float(np.trace(C))
    max_axis = float(C.diagonal().max())
    row = [(
        int(n),
        round(trace, 6),
        round(max_axis, 6),
        bool(lam1 >= max_axis - 1e-9),
    )]
    return emb.sparkSession.createDataFrame(row, schema)


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pca_summary(load(spark, sf_dir, "embeddings"))


QUERIES = {
    "embedding-pca-ok": q_embedding_pca,
    "embedding-centroids": q_embedding_centroids,
    "embedding-assign": q_embedding_assign,
    "cluster-kmeans": q_cluster_kmeans,
    "simsearch-ivf-kmeans": q_simsearch_ivf_kmeans,
}

_EX = """
        SELECT vec_id, label, r.range AS dim,
               CAST(CAST(embedding[r.range + 1] AS DOUBLE) AS DECIMAL(8,6)) AS v
        FROM embeddings CROSS JOIN range(0, 64) r
"""

ORACLES = {
    "embedding-pca-ok": """
        WITH x AS (
          SELECT vec_id,
                 CAST(unnest(embedding) AS DOUBLE) AS v,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings),
        per AS (SELECT i, var_pop(v) AS axis_var FROM x GROUP BY i)
        -- COUNT(embedding), not COUNT(*): null embeddings carry no
        -- variance mass on either engine
        SELECT (SELECT COUNT(embedding) FROM embeddings) AS n,
               ROUND(SUM(axis_var), 6) AS total_var,
               ROUND(MAX(axis_var), 6) AS max_axis_var,
               TRUE AS pc1_dominates
        FROM per
    """,
    "cluster-kmeans": _kmeans_oracle(),
    "simsearch-ivf-kmeans": _ivf_kmeans_oracle(),
    "embedding-centroids": f"""
        WITH ex AS ({_EX})
        SELECT label, dim,
               CAST(SUM(v) AS DOUBLE) / COUNT(*) AS centroid
        FROM ex GROUP BY label, dim
    """,
    "embedding-assign": f"""
        WITH ex AS ({_EX}),
        cent AS (
          SELECT label, dim, SUM(v) AS s, COUNT(*) AS n
          FROM ex GROUP BY label, dim),
        dsum AS (
          SELECT e.vec_id, c.label, c.n,
                 -- (19,6): force int128 decimal multiply in DuckDB --
                 -- its (15,6)x(15,6) product stays in int64 storage
                 -- (DECIMAL(18,12)) and overflows once |term| > ~1e3,
                 -- which sf1 magnitudes reach (round-4 sweep find);
                 -- Spark widens (15,6)x(15,6) to (31,12) on its own,
                 -- so the engine side needs no change and the VALUES
                 -- are identical in both engines
                 SUM(CAST(c.n * e.v - c.s AS DECIMAL(19,6))
                     * CAST(c.n * e.v - c.s AS DECIMAL(19,6))) AS sq
          FROM ex e JOIN cent c ON e.dim = c.dim
          GROUP BY e.vec_id, c.label, c.n),
        d AS (
          -- split conversion: see _dec12_to_double (1-ulp cast parity)
          SELECT vec_id, label,
                 (CAST(FLOOR(sq) AS DOUBLE)
                  + CAST(CAST(sq - FLOOR(sq) AS DECIMAL(14,12)) AS DOUBLE))
                   / (n * n) AS dist
          FROM dsum),
        ranked AS (
          SELECT vec_id, label, dist,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY dist, label) AS rn
          FROM d)
        SELECT vec_id, label AS nearest_label, dist
        FROM ranked WHERE rn = 1
    """,
}
