"""End-to-end corpus curation pipelines (SURVEY.md §2.D).

Two flagship compositions that chain the individually-oracle-checked
operators the way a real pretraining-data build does — proving the
pieces compose without driver-side materialization between stages
(every step below is one lazy DataFrame graph; Catalyst sees the whole
pipeline and prunes/pushes across stage boundaries):

- :func:`q_corpus_curate_e2e` — quality-filter → normalized exact
  dedup → benchmark decontamination → train/val/test split: the
  text-side curation path.
- :func:`q_dedup_semantic` — documents ⋈ embeddings → LSH-bucketed
  cosine near-dup pairs → connected components → canonical doc per
  cluster: the embedding-side (semantic) dedup path.

Scale notes: the curation pipeline is scan → per-row exprs →
one groupBy (normalized-hash dedup) → one broadcast anti-join
(contamination; the benchmark shingle set is tiny) → per-row split
hash.  Nothing materializes between stages and the only fact-table
shuffle is the dedup groupBy.  The semantic path inherits the bucketed
candidate join (never all-pairs) and the O(log² n) alternating-star
contraction rounds of its connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load

QUALITY_CUT = 0.5


def curate_corpus(docs: DataFrame, bench: DataFrame) -> DataFrame:
    """quality ≥ QUALITY_CUT → keep lowest doc_id per normalized text →
    drop docs sharing any 3-gram with the benchmark → assign splits.
    Returns (doc_id, split, n_tokens, quality) for surviving docs."""
    from pandasqlite_spark.functions.dedup import (
        decontaminate_ngram,
        normalize_text,
    )
    from pandasqlite_spark.functions.sampling import split_assign
    from pandasqlite_spark.functions.text import quality_score, token_count

    scored = docs.select(
        "doc_id",
        "text",
        quality_score().alias("quality"),
        token_count().alias("n_tokens"),
    ).filter(F.col("quality") >= QUALITY_CUT)

    from pyspark.sql import Window as W

    w = W.partitionBy(normalize_text())
    kept = (
        scored.withColumn("_keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_keep")
    )

    contaminated = decontaminate_ngram(kept, bench).select("doc_id")
    clean = kept.join(F.broadcast(contaminated), "doc_id", "left_anti")
    return (
        clean.join(split_assign(clean, "doc_id"), "doc_id")
        .select("doc_id", "split", "n_tokens", "quality")
    )


def q_corpus_curate_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stand-in benchmark: doc_id % 100 == 0 (as decontaminate-ngram)."""
    d = load(spark, sf_dir, "documents")
    return curate_corpus(
        d.filter(F.col("doc_id") % 100 != 0),
        d.filter(F.col("doc_id") % 100 == 0),
    )


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup of the documents table: embedding near-dup pairs
    (LSH-bucketed + exact rerank) → connected components → every doc in
    a near-dup cluster mapped to its canonical (minimum) doc_id, with
    the doc's language carried from the documents side."""
    from pandasqlite_spark.functions.dedup import connected_components
    from pandasqlite_spark.functions.similarity import embedding_near_dupes

    emb = load(spark, sf_dir, "embeddings")
    edges = embedding_near_dupes(emb).select(
        F.col("va").alias("doc_a"), F.col("vb").alias("doc_b")
    )
    comp = connected_components(edges)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return comp.join(docs, "doc_id").select("doc_id", "rep_id", "lang")


QUERIES = {
    "corpus-curate-e2e": q_corpus_curate_e2e,
    "dedup-semantic": q_dedup_semantic,
}


def _oracles() -> dict[str, str]:
    from pandasqlite_spark.functions.similarity import ORACLES as SIM_ORACLES
    from pandasqlite_spark.functions.text import _TOKS

    bucketed_pairs = SIM_ORACLES["dedup-embedding-bucketed"]
    quality = f"""
        ROUND(0.4 * LEAST(1.0, CAST(len({_TOKS}) AS DOUBLE) / 100.0)
            + 0.3 * (CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                     / CAST(len({_TOKS}) AS DOUBLE))
            + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                          AS DOUBLE) / length(text)), 9)
    """
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
        " ' +', ' ', 'g'))"
    )
    return {
        "corpus-curate-e2e": f"""
            WITH scored AS (
              SELECT doc_id, text, {quality} AS quality,
                     CAST(len({_TOKS}) AS INTEGER) AS n_tokens
              FROM documents
              WHERE doc_id % 100 <> 0),
            qf AS (SELECT * FROM scored WHERE quality >= 0.5),
            kept AS (
              SELECT * FROM (
                SELECT qf.*, MIN(doc_id) OVER (PARTITION BY {norm}) AS _keep
                FROM qf)
              WHERE doc_id = _keep),
            toks AS (SELECT doc_id, {_TOKS} AS t FROM kept),
            sh AS (
              SELECT doc_id,
                     unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                           for i in range(1, len(t) - 1)])) AS sh
              FROM toks WHERE len(t) >= 3),
            btoks AS (SELECT doc_id, {_TOKS} AS t FROM documents
                      WHERE doc_id % 100 = 0),
            bench AS (
              SELECT DISTINCT unnest(
                list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                               for i in range(1, len(t) - 1)])) AS sh
              FROM btoks WHERE len(t) >= 3),
            contaminated AS (SELECT DISTINCT s.doc_id
                             FROM sh s JOIN bench b ON s.sh = b.sh)
            SELECT doc_id,
                   CASE WHEN h < 64225 THEN 'train'
                        WHEN h < 64880 THEN 'val'
                        ELSE 'test' END AS split,
                   n_tokens, quality
            FROM (SELECT k.*,
                         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                           AS h
                  FROM kept k)
            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        """,
        "dedup-semantic": f"""
            WITH RECURSIVE pairs AS ({bucketed_pairs}),
            edges AS (
              SELECT va AS u, vb AS v FROM pairs
              UNION ALL
              SELECT vb AS u, va AS v FROM pairs),
            reach AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
            SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep_id, d.lang
            FROM reach JOIN documents d ON d.doc_id = u
            GROUP BY u, d.lang
        """,
    }


ORACLES = _oracles()


COVERAGE_K = 5


def coverage_select(
    docs: DataFrame, k: int = COVERAGE_K, _plan_probe: list | None = None
) -> DataFrame:
    """Greedy max-coverage data selection: pick ``k`` documents, each
    round choosing the doc that covers the most not-yet-covered distinct
    tokens (facility-location/submodular selection — the classic
    pick-a-diverse-subset pass for instruction-tuning and eval-set
    construction).  Stops early once every token is covered.

    Scale shape: the distributed work each round is one left-anti join
    of the (doc, token) pair table against the covered-token set plus a
    count-distinct groupBy — all partial-aggregated; only the 1-row
    argmax is collected per round (the same per-round driver pull as
    k-means/MMR).  The covered set is bounded by |vocabulary|, not by
    corpus size, so the anti-join side broadcasts.  Gains are integers
    and ties break on doc_id — the selection sequence is
    engine-reproducible, and the emitted (step, doc_id, gain) rows are
    all integers, so no float reaches the hash."""
    from pandasqlite_spark.functions.text import tokens

    pairs = docs.select(
        "doc_id", F.explode(tokens()).alias("tok")
    ).distinct()
    pairs.cache()
    spark = docs.sparkSession
    selected: list[tuple[int, int, int]] = []
    covered = None  # DataFrame[tok] of covered tokens
    remaining = pairs
    for step in range(1, k + 1):
        cand = remaining
        if selected:
            sel_ids = [d for _, d, _ in selected]
            cand = cand.filter(~F.col("doc_id").isin(sel_ids))
        top = (
            cand.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), "doc_id")
            .limit(1)
            .collect()
        )
        if not top:
            break
        doc, gain = top[0].doc_id, top[0].gain
        selected.append((step, doc, gain))
        new_toks = pairs.filter(F.col("doc_id") == doc).select("tok")
        covered = new_toks if covered is None else covered.union(new_toks).distinct()
        # lineage truncation each round: `covered` otherwise stacks one
        # union().distinct() layer per step and `remaining` one
        # anti-join layer — constant plan depth at any k (the
        # kmeans_lloyd/connected-components device)
        covered = covered.localCheckpoint(eager=False)
        remaining = remaining.join(
            F.broadcast(covered), "tok", "left_anti"
        ).localCheckpoint(eager=False)
        if _plan_probe is not None:
            _plan_probe.append(
                len(remaining._jdf.queryExecution().analyzed().toString().splitlines())
            )
    pairs.unpersist()
    return spark.createDataFrame(
        selected, "step int, doc_id bigint, gain bigint"
    )


def q_corpus_coverage_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return coverage_select(load(spark, sf_dir, "documents"))


QUERIES["corpus-coverage-select"] = q_corpus_coverage_select


def _coverage_oracle(k: int = COVERAGE_K) -> str:
    """Unrolled greedy max-coverage: CTE s_i is the argmax of distinct
    not-yet-covered tokens among unselected docs; c_i accumulates the
    covered-token set.  Docs whose tokens are all covered contribute no
    rows and so cannot be selected — the same early-stop contract as
    the Spark loop."""
    ctes = [
        "s1 AS (SELECT doc_id, COUNT(*) AS gain FROM pairs GROUP BY 1"
        " ORDER BY gain DESC, doc_id LIMIT 1)",
        "c1 AS (SELECT DISTINCT tok FROM pairs"
        " WHERE doc_id IN (SELECT doc_id FROM s1))",
    ]
    sel_union = "SELECT doc_id FROM s1"
    for i in range(2, k + 1):
        p = i - 1
        ctes.append(
            f"""s{i} AS (
              SELECT p.doc_id, COUNT(*) AS gain FROM pairs p
              WHERE p.doc_id NOT IN ({sel_union})
                AND p.tok NOT IN (SELECT tok FROM c{p})
              GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1)"""
        )
        ctes.append(
            f"""c{i} AS (
              SELECT tok FROM c{p}
              UNION
              SELECT DISTINCT tok FROM pairs
              WHERE doc_id IN (SELECT doc_id FROM s{i}))"""
        )
        sel_union += f" UNION ALL SELECT doc_id FROM s{i}"
    final = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS step, doc_id, gain FROM s{i}"
        for i in range(1, k + 1)
    )
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents)),
    {cte_block}
    {final}
    ORDER BY step
"""


ORACLES["corpus-coverage-select"] = _coverage_oracle()


def _coverage_oracle_staged(k: int = COVERAGE_K) -> str:
    """Staged twin of the ``corpus-coverage-select`` oracle: the
    (doc, token) distinct pair table is materialized ONCE into a temp
    table, then each greedy round is a pair-table-sized scan — the
    single-statement CTE form re-expands ``pairs`` per s_i/c_i
    reference (~2k times) and exhausted >76 GB of DuckDB temp at sf10
    (round-6 SWEEP_SF10 tranche B).  Same rows, same final SELECT."""
    stmts = [
        "DROP TABLE IF EXISTS cov_pairs",
        r"""CREATE TEMP TABLE cov_pairs AS
          SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
            FROM documents)""",
        "DROP TABLE IF EXISTS cov_s1",
        """CREATE TEMP TABLE cov_s1 AS
          SELECT doc_id, COUNT(*) AS gain FROM cov_pairs GROUP BY 1
          ORDER BY gain DESC, doc_id LIMIT 1""",
        "DROP TABLE IF EXISTS cov_c1",
        """CREATE TEMP TABLE cov_c1 AS
          SELECT DISTINCT tok FROM cov_pairs
          WHERE doc_id IN (SELECT doc_id FROM cov_s1)""",
    ]
    sel_union = "SELECT doc_id FROM cov_s1"
    for i in range(2, k + 1):
        p = i - 1
        stmts += [
            f"DROP TABLE IF EXISTS cov_s{i}",
            f"""CREATE TEMP TABLE cov_s{i} AS
              SELECT p.doc_id, COUNT(*) AS gain FROM cov_pairs p
              WHERE p.doc_id NOT IN ({sel_union})
                AND p.tok NOT IN (SELECT tok FROM cov_c{p})
              GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1""",
            f"DROP TABLE IF EXISTS cov_c{i}",
            f"""CREATE TEMP TABLE cov_c{i} AS
              SELECT tok FROM cov_c{p}
              UNION
              SELECT DISTINCT tok FROM cov_pairs
              WHERE doc_id IN (SELECT doc_id FROM cov_s{i})""",
        ]
        sel_union += f" UNION ALL SELECT doc_id FROM cov_s{i}"
    final = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS step, doc_id, gain FROM cov_s{i}"
        for i in range(1, k + 1)
    )
    stmts.append(final + "\n    ORDER BY step")
    return ";\n".join(stmts)


ORACLES_BIG = {
    "corpus-coverage-select": _coverage_oracle_staged(),
}


def _semantic_oracle_staged() -> str:
    """Staged big-SF twin of ``dedup-semantic``: the registry oracle
    nests the uncollapsed bucketed-pairs oracle (a ~2G-row pair-dot
    join that exhausted the sf10 verifier's temp disk) inside a
    member-level transitive closure.  This twin reuses the shared
    embedding collapse staging (:func:`similarity._emb_staged_common`:
    rep-level chunked dots → ``eb_pass`` passing pairs + ``eb_intra_ok``
    threshold-passing duplicate groups), runs the connected-components
    closure at REP level, and recovers member labels by expansion: a
    member's component is its group's component (group cliques merge
    via rep edges; the component's minimum member id equals the
    rep-level label because every group's minimum member IS its rep)."""
    from pandasqlite_spark.functions.similarity import _emb_staged_common

    stmts = _emb_staged_common()
    stmts += [
        "DROP TABLE IF EXISTS eb_cc",
        """CREATE TEMP TABLE eb_cc AS
        WITH RECURSIVE edges AS (
          SELECT va AS u, vb AS v FROM eb_pass
          UNION ALL
          SELECT vb AS u, va AS v FROM eb_pass),
        reach AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        SELECT u AS rep_vec, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u""",
        """SELECT m.vec_id AS doc_id,
               COALESCE(c.comp, m.rep_vec) AS rep_id,
               d.lang
        FROM eb_map m
        LEFT JOIN eb_cc c ON c.rep_vec = m.rep_vec
        LEFT JOIN eb_intra_ok i ON i.rep_vec = m.rep_vec
        JOIN documents d ON d.doc_id = m.vec_id
        WHERE c.rep_vec IS NOT NULL OR i.rep_vec IS NOT NULL""",
    ]
    return ";\n".join(stmts)


# Merge — a second dict literal here would REBIND the module attribute
# and silently drop the earlier staged twins (round-7 advice: the
# `corpus-coverage-select` twin vanished exactly that way, and the sf10
# sweep fell back to the verifier-infeasible registry oracle).
ORACLES_BIG["dedup-semantic"] = _semantic_oracle_staged()
