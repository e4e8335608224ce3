"""Graph analytics over relational edge lists (SURVEY.md §2.D).

Companion to the connected-components labeler in
:mod:`pandasqlite_spark.functions.dedup`: PageRank as an iterative
DataFrame composition — the "iterative algorithm on a 100 TB edge
list" pattern (per-iteration cost = one co-partitioned join + one
partial-aggregated shuffle on the node key; no driver-side state
beyond the loop counter).

Determinism contract: ranks are **scaled integers** (BIGINT, scale
10¹²) and every per-iteration step is integer arithmetic (`div`,
`sum`, `*`) — bit-identical across engines, unlike float PageRank
whose summation order is nondeterministic.  The DuckDB oracle unrolls
the same iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load

_ONE = 1_000_000_000_000  # rank scale: 1.0 == 10^12


def pagerank_scaled(
    edges: DataFrame, iterations: int = 3, damping_pct: int = 85
) -> DataFrame:
    """PageRank over a directed ``(src, dst)`` edge list, returning
    ``(node, rank_scaled)`` with ranks as scale-10¹² integers.

    Each iteration: contribution = rank div out_degree per src, summed
    per dst, then ``rank' = (100-d)%·(1/N) + d%·sum`` in integer math.
    Nodes with no in-edges drop out (the caller's edge list decides the
    node universe; a symmetrized list keeps every node).

    Lineage (round 9, guide §5 / the CC precedent): the canonical edge
    list is referenced by BOTH joins of every iteration and by the
    degree table, so without a cut the caller's edge derivation (an
    orders⋈lineitem distinct for the trade-graph keys) re-executes up
    to 2·iterations+2 times inside the final plan.  One eager
    ``localCheckpoint`` of the deduplicated (src, dst) pairs — two
    longs per edge, ≪ the fact tables they derive from — executes the
    derivation once; ``deg`` rides on the materialized edges.  All
    arithmetic is integer (div/sum), so the cut is bit-exact.
    """
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    base_pct = 100 - damping_pct
    # r0 = ONE div N, identical for every node
    ranks = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"),
        F.expr(f"{_ONE} div n").alias("r"),
        "n",
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select("dst", F.expr("r div deg").alias("c"), "n")
        )
        ranks = (
            contrib.groupBy("dst", "n")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"({base_pct} * ({_ONE} div n)) div 100"
                    f" + ({damping_pct} * s) div 100"
                ).alias("r"),
                "n",
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


BFS_MAX_HOPS = 3


def bfs_hops(edges, seeds, max_hops: int = BFS_MAX_HOPS):
    """Bounded breadth-first distances from a seed set (≤ ``max_hops``)
    — the "blast radius" / n-degrees-of-separation query, unrolled into
    ``max_hops`` frontier-expansion rounds: each round is ONE equi-join
    of the current frontier against the edge list plus one anti-join
    against the visited set, so the plan is static and every step is a
    key-partitioned hash join (frontiers stay small relative to edges;
    the visited anti-join is the classic iterative-BFS dedup).

    For unbounded diameters this becomes the usual iterate-to-fixpoint
    driver loop (like pagerank_scaled); the bounded form is the one
    product queries actually run.  The unrolled lineage re-references
    the edge subtree each round — AQE reuses the exchange at runtime
    (ReusedExchange), and a production fixpoint loop would
    ``persist()`` the edge list and each frontier instead (same note
    as pagerank: lineage-heavy iteration trades plan size for
    driver-side simplicity at bounded depth)."""
    from pyspark.sql import functions as F

    visited = seeds.select("node", F.lit(0).alias("dist"))
    frontier = visited.select("node")
    for k in range(1, max_hops + 1):
        cand = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = cand.join(visited.select("node"), "node", "left_anti").select(
            "node", F.lit(k).alias("dist")
        )
        visited = visited.unionByName(new)
        frontier = new.select("node")
    return visited.orderBy("dist", "node")


def q_graph_bfs_hops(spark, sf_dir):
    """3-hop BFS over the symmetrized customer↔supplier trade graph
    from the two lowest-id customer nodes; summarized as nodes-per-
    distance (the full frontier list is the intermediate)."""
    from pyspark.sql import functions as F

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    sym = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = spark.createDataFrame([(2,), (4,)], "node bigint")
    d = bfs_hops(sym, seeds)
    return d.groupBy("dist").agg(F.count(F.lit(1)).alias("n_nodes")).orderBy("dist")


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized customer↔supplier trade graph
    (edge iff the customer ordered a line from the supplier); top-20
    hubs by rank with node-id tiebreak."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    sym = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return (
        pagerank_scaled(sym, iterations=3)
        .orderBy(F.col("rank_scaled").desc(), "node")
        .limit(20)
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count over an undirected edge list given as
    ``(src, dst)`` with ``src < dst`` (each edge once).

    Classic two-join enumeration with the ``a < b < c`` orientation so
    every triangle is produced exactly once: wedges a–b–c from
    e(a,b)⋈e(b,c), closed by probing e(a,c).  All three joins shuffle
    on node keys only; cost is Σ deg², which the caller bounds by
    feeding a *sparse* edge list (dense co-occurrence graphs must be
    thinned before counting — see q_graph_triangles' quantity filter).
    """
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    closed = wedges.join(e3, ["a", "c"])
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the high-quantity co-supply graph: suppliers are
    connected when they both ship a >45-quantity line in the same
    order.  The quantity filter (pushed to the parquet scan) keeps the
    graph sparse — the unfiltered co-occurrence graph is near-complete
    and would make Σ deg² quadratic."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .distinct()
    )
    return triangle_count(edges)


def label_propagation(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """Synchronous label propagation (community detection) over an
    undirected ``(src, dst)`` edge list with self-loops added, fully
    deterministic: each round every node adopts the MAJORITY label among
    itself + neighbors, ties broken by (count DESC, label ASC).

    Per round: one join (edge × current labels), one (node, label)
    vote count, one per-node argmax window — all hash-partitioned on
    the node key, so a round costs two key-shuffles regardless of graph
    size.  Synchronous updates + total-order tie-break make the result
    a pure function of the graph (no async race like GraphX's LPA),
    which is what lets the DuckDB oracle unroll the same rounds as
    CTEs.  Hub-heavy skew lands in the vote count, which partial-
    aggregates map-side before the exchange.

    Lineage (round 9, guide §5 / the CC precedent): the symmetrized
    edge list is joined by EVERY round and seeds the label table, so
    the caller's edge derivation would re-execute ~iterations+2 times;
    one eager ``localCheckpoint`` (two longs per edge) runs it once.
    Votes are integer counts with a total-order argmax — bit-exact
    under any partitioning."""
    from pyspark.sql import Window as W

    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .union(edges.select(F.col("src").alias("src"), F.col("src").alias("dst")))
        .union(edges.select(F.col("dst").alias("src"), F.col("dst").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    w = W.partitionBy("node").orderBy(F.desc("c"), "lbl")
    for _ in range(iterations):
        votes = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
        )
    return labels


def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communities in the customer↔supplier trade graph (same node
    encoding as pagerank), reported as the 20 largest communities."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return (
        label_propagation(pairs, iterations=2)
        .groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


QUERIES = {
    "graph-bfs-hops": q_graph_bfs_hops,
    "graph-pagerank": q_graph_pagerank,
    "graph-triangles": q_graph_triangles,
    "graph-label-propagation": q_graph_label_propagation,
}

ORACLES = {
    "graph-bfs-hops": """
        WITH pairs AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        sym AS (
          SELECT src, dst FROM pairs
          UNION ALL SELECT dst AS src, src AS dst FROM pairs),
        d0 AS (SELECT node, 0 AS dist FROM (VALUES (2), (4)) v(node)),
        f1 AS (
          SELECT DISTINCT e.dst AS node FROM sym e
          JOIN d0 ON e.src = d0.node),
        n1 AS (
          SELECT node, 1 AS dist FROM f1
          WHERE node NOT IN (SELECT node FROM d0)),
        v1 AS (SELECT * FROM d0 UNION ALL SELECT * FROM n1),
        f2 AS (
          SELECT DISTINCT e.dst AS node FROM sym e
          JOIN n1 ON e.src = n1.node),
        n2 AS (
          SELECT node, 2 AS dist FROM f2
          WHERE node NOT IN (SELECT node FROM v1)),
        v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM n2),
        f3 AS (
          SELECT DISTINCT e.dst AS node FROM sym e
          JOIN n2 ON e.src = n2.node),
        n3 AS (
          SELECT node, 3 AS dist FROM f3
          WHERE node NOT IN (SELECT node FROM v2)),
        v3 AS (SELECT * FROM v2 UNION ALL SELECT * FROM n3)
        SELECT dist, COUNT(*) AS n_nodes FROM v3 GROUP BY dist ORDER BY dist
    """,
    # same integer-scaled iterations unrolled as CTEs; // is integer
    # division in DuckDB as div is in Spark (all operands positive)
    "graph-pagerank": f"""
        WITH e0 AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM deg),
        r0 AS (SELECT deg.src AS node, {_ONE} // n.n AS r FROM deg, n),
        s1 AS (SELECT e.dst AS node, SUM(r0.r // d.deg) AS s
               FROM edges e JOIN r0 ON r0.node = e.src
                            JOIN deg d ON d.src = e.src GROUP BY 1),
        r1 AS (SELECT s1.node,
                      (15 * ({_ONE} // n.n)) // 100 + (85 * s1.s) // 100 AS r
               FROM s1, n),
        s2 AS (SELECT e.dst AS node, SUM(r1.r // d.deg) AS s
               FROM edges e JOIN r1 ON r1.node = e.src
                            JOIN deg d ON d.src = e.src GROUP BY 1),
        r2 AS (SELECT s2.node,
                      (15 * ({_ONE} // n.n)) // 100 + (85 * s2.s) // 100 AS r
               FROM s2, n),
        s3 AS (SELECT e.dst AS node, SUM(r2.r // d.deg) AS s
               FROM edges e JOIN r2 ON r2.node = e.src
                            JOIN deg d ON d.src = e.src GROUP BY 1),
        r3 AS (SELECT s3.node,
                      (15 * ({_ONE} // n.n)) // 100 + (85 * s3.s) // 100 AS r
               FROM s3, n)
        SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r3
        ORDER BY rank_scaled DESC, node LIMIT 20
    """,
    "graph-label-propagation": """
        WITH e0 AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        edges AS (
          SELECT src, dst FROM e0
          UNION SELECT dst, src FROM e0
          UNION SELECT src, src FROM e0
          UNION SELECT dst, dst FROM e0),
        l1c AS (
          SELECT src AS node, dst AS lbl, COUNT(*) AS c
          FROM edges GROUP BY src, dst),
        l1 AS (
          SELECT node, lbl FROM (
            SELECT node, lbl,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY c DESC, lbl) AS rn
            FROM l1c) WHERE rn = 1),
        l2c AS (
          SELECT e.src AS node, l.lbl, COUNT(*) AS c
          FROM edges e JOIN l1 l ON l.node = e.dst
          GROUP BY e.src, l.lbl),
        l2 AS (
          SELECT node, lbl FROM (
            SELECT node, lbl,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY c DESC, lbl) AS rn
            FROM l2c) WHERE rn = 1)
        SELECT lbl AS community, COUNT(*) AS n_members
        FROM l2 GROUP BY lbl
        ORDER BY n_members DESC, community LIMIT 20
    """,
    "graph-triangles": """
        WITH hi AS (
          SELECT DISTINCT l_orderkey, l_suppkey
          FROM lineitem WHERE l_quantity > 45),
        edges AS (
          SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
          FROM hi a JOIN hi b
            ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey)
        SELECT COUNT(*) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e1.dst = e2.src
        JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """,
}


KCORE_K = 3
KCORE_ROUNDS = 3


def kcore_peel(edges: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> DataFrame:
    """Bounded k-core peeling over an undirected ``(src, dst)`` edge
    list (each edge once): ``rounds`` synchronous peels, each dropping
    every node with degree < ``k`` and restricting the edge set to
    survivors — the dense-subgraph extraction that strips hangers-on
    before community/influence analysis.  A fixpoint run iterates the
    SAME two joins until stable; the round count here is the operator
    contract (same bounded-unroll convention as pagerank/label-prop).

    Per round: one partial-aggregated degree count + two node-key
    equi-joins — no shuffle ever carries more than the current edge
    set, which only shrinks.  All-integer output."""
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    cur = sym
    for _ in range(rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        cur = cur.join(keep, "src").join(
            keep.withColumnRenamed("src", "dst"), "dst"
        ).select("src", "dst")
    return (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("src").alias("node"), "degree")
        .orderBy("node")
    )


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round 3-core of the supplier co-occurrence graph (same sparse
    qty>45 edge derivation as ``graph-triangles``)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .distinct()
    )
    return kcore_peel(edges)


QUERIES["graph-kcore-peel"] = q_graph_kcore


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    ctes = [
        """li AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
          WHERE l_quantity > 45)""",
        """e0 AS (
          SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
          FROM li a JOIN li b USING (l_orderkey)
          WHERE a.l_suppkey < b.l_suppkey)""",
        "s0 AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""k{i} AS (
              SELECT src FROM (SELECT src, COUNT(*) AS deg FROM s{p} GROUP BY 1)
              WHERE deg >= {k})"""
        )
        ctes.append(
            f"""s{i} AS (
              SELECT s.src, s.dst FROM s{p} s
              JOIN k{i} a ON s.src = a.src
              JOIN k{i} b ON s.dst = b.src)"""
        )
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block}
    SELECT src AS node, COUNT(*) AS degree
    FROM s{rounds} GROUP BY 1 ORDER BY node
"""


ORACLES["graph-kcore-peel"] = _kcore_oracle()


def _bfs_oracle_staged() -> str:
    """Staged twin of the ``graph-bfs-hops`` oracle: the 50M-edge
    symmetrized trade graph is materialized ONCE into a temp table,
    then each hop is a frontier-sized join — the single-statement CTE
    form re-expands the orders⋈lineitem distinct per hop reference and
    filled the sf10 verifier's temp disk (round-4 SWEEP_SF10 Batch C).
    Same rows, same final SELECT."""
    stmts = [
        "DROP TABLE IF EXISTS bfs_sym",
        """CREATE TEMP TABLE bfs_sym AS
        WITH pairs AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
        SELECT src, dst FROM pairs
        UNION ALL SELECT dst AS src, src AS dst FROM pairs""",
        "DROP TABLE IF EXISTS bfs_v0",
        "CREATE TEMP TABLE bfs_v0 AS SELECT node, 0 AS dist FROM (VALUES (2), (4)) v(node)",
    ]
    for i in range(1, BFS_MAX_HOPS + 1):
        p = i - 1
        stmts += [
            f"DROP TABLE IF EXISTS bfs_n{i}",
            f"""CREATE TEMP TABLE bfs_n{i} AS
            SELECT node, {i} AS dist FROM (
              SELECT DISTINCT e.dst AS node FROM bfs_sym e
              JOIN bfs_n{p} f ON e.src = f.node)
            WHERE node NOT IN (SELECT node FROM bfs_v{p})"""
            if i > 1
            else f"""CREATE TEMP TABLE bfs_n{i} AS
            SELECT node, {i} AS dist FROM (
              SELECT DISTINCT e.dst AS node FROM bfs_sym e
              JOIN bfs_v{p} f ON e.src = f.node)
            WHERE node NOT IN (SELECT node FROM bfs_v{p})""",
            f"DROP TABLE IF EXISTS bfs_v{i}",
            f"""CREATE TEMP TABLE bfs_v{i} AS
            SELECT * FROM bfs_v{p} UNION ALL SELECT * FROM bfs_n{i}""",
        ]
    stmts.append(
        f"SELECT dist, COUNT(*) AS n_nodes FROM bfs_v{BFS_MAX_HOPS} "
        "GROUP BY dist ORDER BY dist"
    )
    return ";\n".join(stmts)


def _kcore_oracle_staged(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Staged twin of the ``graph-kcore-peel`` oracle: the symmetrized
    co-occurrence edge set and each peel round's survivor edge set are
    materialized once (each round only SHRINKS the previous table), so
    the verifier's peak temp usage is one co-occurrence join instead of
    ``rounds`` re-expansions."""
    stmts = [
        "DROP TABLE IF EXISTS kc_s0",
        """CREATE TEMP TABLE kc_s0 AS
        WITH li AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
          WHERE l_quantity > 45),
        e0 AS (
          SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
          FROM li a JOIN li b USING (l_orderkey)
          WHERE a.l_suppkey < b.l_suppkey)
        SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0""",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        stmts += [
            f"DROP TABLE IF EXISTS kc_k{i}",
            f"""CREATE TEMP TABLE kc_k{i} AS
            SELECT src FROM (SELECT src, COUNT(*) AS deg FROM kc_s{p} GROUP BY 1)
            WHERE deg >= {k}""",
            f"DROP TABLE IF EXISTS kc_s{i}",
            f"""CREATE TEMP TABLE kc_s{i} AS
            SELECT s.src, s.dst FROM kc_s{p} s
            JOIN kc_k{i} a ON s.src = a.src
            JOIN kc_k{i} b ON s.dst = b.src""",
        ]
    stmts.append(
        f"SELECT src AS node, COUNT(*) AS degree FROM kc_s{rounds} "
        "GROUP BY 1 ORDER BY node"
    )
    return ";\n".join(stmts)


def _pagerank_oracle_staged() -> str:
    """Staged twin of the ``graph-pagerank`` oracle: edges/deg are
    materialized ONCE and each iteration's rank table is a temp table
    — the single-statement CTE form re-expands the 50M-edge union per
    s{i} reference and exhausted the sf10 verifier's temp disk
    (round-6 full sweep, same failure mode the BFS/k-core oracles had
    in round 4).  Same rows, same final SELECT."""
    stmts = [
        "DROP TABLE IF EXISTS pr_edges",
        """CREATE TEMP TABLE pr_edges AS
        WITH e0 AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey)
        SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0""",
        "DROP TABLE IF EXISTS pr_deg",
        "CREATE TEMP TABLE pr_deg AS SELECT src, COUNT(*) AS deg FROM pr_edges GROUP BY 1",
        "DROP TABLE IF EXISTS pr_r0",
        f"""CREATE TEMP TABLE pr_r0 AS
        SELECT pr_deg.src AS node, {_ONE} // n.n AS r
        FROM pr_deg, (SELECT COUNT(*) AS n FROM pr_deg) n""",
    ]
    for i in range(1, 4):
        p = i - 1
        stmts += [
            f"DROP TABLE IF EXISTS pr_r{i}",
            f"""CREATE TEMP TABLE pr_r{i} AS
            WITH s AS (
              SELECT e.dst AS node, SUM(r.r // d.deg) AS s
              FROM pr_edges e JOIN pr_r{p} r ON r.node = e.src
                              JOIN pr_deg d ON d.src = e.src GROUP BY 1)
            SELECT s.node,
                   (15 * ({_ONE} // n.n)) // 100 + (85 * s.s) // 100 AS r
            FROM s, (SELECT COUNT(*) AS n FROM pr_deg) n""",
        ]
    stmts.append(
        "SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM pr_r3 "
        "ORDER BY rank_scaled DESC, node LIMIT 20"
    )
    return ";\n".join(stmts)


def _modularity_oracle_staged() -> str:
    """Staged twin of the ``graph-modularity`` oracle: e0, the 4-way
    self-loop-augmented edge union, and both label-propagation rounds
    are materialized once — the CTE form's repeated edge expansion
    exhausted the sf10 verifier's temp disk (round-6 full sweep).
    Same rows, same final SELECT."""
    return ";\n".join(
        [
            "DROP TABLE IF EXISTS md_e0",
            """CREATE TEMP TABLE md_e0 AS
            SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey""",
            "DROP TABLE IF EXISTS md_edges",
            """CREATE TEMP TABLE md_edges AS
            SELECT src, dst FROM md_e0
            UNION SELECT dst, src FROM md_e0
            UNION SELECT src, src FROM md_e0
            UNION SELECT dst, dst FROM md_e0""",
            "DROP TABLE IF EXISTS md_l1",
            """CREATE TEMP TABLE md_l1 AS
            SELECT node, lbl FROM (
              SELECT src AS node, dst AS lbl,
                     ROW_NUMBER() OVER (PARTITION BY src
                                        ORDER BY COUNT(*) DESC, dst) AS rn
              FROM md_edges GROUP BY src, dst) WHERE rn = 1""",
            "DROP TABLE IF EXISTS md_l2",
            """CREATE TEMP TABLE md_l2 AS
            SELECT node, lbl FROM (
              SELECT e.src AS node, l.lbl,
                     ROW_NUMBER() OVER (PARTITION BY e.src
                                        ORDER BY COUNT(*) DESC, l.lbl) AS rn
              FROM md_edges e JOIN md_l1 l ON l.node = e.dst
              GROUP BY e.src, l.lbl) WHERE rn = 1""",
            "DROP TABLE IF EXISTS md_tagged",
            """CREATE TEMP TABLE md_tagged AS
            SELECT la.lbl AS ca, lb.lbl AS cb
            FROM md_e0
            JOIN md_l2 la ON la.node = md_e0.src
            JOIN md_l2 lb ON lb.node = md_e0.dst""",
            """WITH m AS (SELECT COUNT(*) AS m FROM md_tagged),
            intra AS (
              SELECT ca AS community, COUNT(*) AS m_c
              FROM md_tagged WHERE ca = cb GROUP BY 1),
            adj AS (SELECT src FROM md_e0 UNION ALL SELECT dst FROM md_e0),
            deg AS (SELECT src, COUNT(*) AS deg FROM adj GROUP BY 1),
            dc AS (
              SELECT l.lbl AS community,
                     CAST(SUM(d.deg) AS DECIMAL(38,0)) AS d_c
              FROM md_l2 l JOIN deg d ON d.src = l.node
              GROUP BY 1),
            per AS (
              SELECT dc.community,
                     COALESCE(i.m_c, 0) AS m_c, dc.d_c,
                     CAST(4 AS DECIMAL(38,0)) * m.m * COALESCE(i.m_c, 0)
                       - dc.d_c * dc.d_c AS num
              FROM dc LEFT JOIN intra i USING (community), m)
            SELECT COUNT(*) AS n_communities,
                   CAST(m.m AS BIGINT) AS m_edges,
                   ROUND(CAST(SUM(num) AS DOUBLE)
                         / (4.0 * m.m * m.m), 6) AS modularity
            FROM per, m GROUP BY m.m""",
        ]
    )


ORACLES_BIG = {
    "graph-bfs-hops": _bfs_oracle_staged(),
    "graph-kcore-peel": _kcore_oracle_staged(),
    "graph-pagerank": _pagerank_oracle_staged(),
    "graph-modularity": _modularity_oracle_staged(),
}


def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the supplier co-occurrence graph — the
    Pearson correlation between the degrees at each edge's endpoints
    (positive: hubs link to hubs; negative: hub-and-spoke).  Decides
    whether the hub-skew mitigations in SCALING.md actually bind.

    One degree groupBy + two endpoint joins + a single-row moment
    aggregate: every sum is an exact integer (degrees are ints; edges
    counted once per direction, the standard symmetrized form), so the
    correlation is one fixed IEEE expression."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .distinct()
    )
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ends = (
        sym.join(deg.withColumnRenamed("src", "u").withColumnRenamed("deg", "dx"),
                 F.col("src") == F.col("u"))
        .join(deg.withColumnRenamed("src", "v").withColumnRenamed("deg", "dy"),
              F.col("dst") == F.col("v"))
        .select("dx", "dy")
    )
    m = ends.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sx2"),
        F.sum(F.col("dy") * F.col("dy")).alias("sy2"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("m") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("m") * F.col("sy2") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        (F.col("m") / 2).cast("bigint").alias("n_edges"),
        F.round(num / den, 6).alias("assortativity"),
    )


QUERIES["graph-assortativity"] = q_graph_assortativity

ORACLES["graph-assortativity"] = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 45),
    e AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM li a JOIN li b USING (l_orderkey)
      WHERE a.l_suppkey < b.l_suppkey),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY 1),
    ends AS (
      SELECT da.deg AS dx, db.deg AS dy
      FROM sym s JOIN deg da ON da.src = s.src JOIN deg db ON db.src = s.dst),
    m AS (
      SELECT COUNT(*) AS m,
             CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
             CAST(SUM(dx*dy) AS BIGINT) AS sxy,
             CAST(SUM(dx*dx) AS BIGINT) AS sx2,
             CAST(SUM(dy*dy) AS BIGINT) AS sy2
      FROM ends)
    SELECT CAST(m // 2 AS BIGINT) AS n_edges,
           ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(m * sx2 - sx * sx AS DOUBLE)
                        * CAST(m * sy2 - sy * sy AS DOUBLE)), 6) AS assortativity
    FROM m
"""


def common_neighbor_candidates(edges: DataFrame, min_common: int = 2, top_n: int = 50) -> DataFrame:
    """Link prediction over an undirected ``(src, dst)`` edge list
    (``src < dst``, each edge once): for node pairs NOT directly
    connected but sharing ≥ ``min_common`` neighbors, the
    common-neighbor count and the Jaccard overlap of their
    neighborhoods as an exact ``×10⁶`` integer
    (``cn·10⁶ // (deg_a + deg_b − cn)`` — no float ever).

    Shape: the wedge join adj⋈adj on the shared middle node produces
    candidate pairs (Σ deg² — the caller feeds a SPARSE graph, same
    contract as `triangle_count`), one groupBy counts common
    neighbors, a LEFT ANTI join removes existing edges, and two
    |nodes|-row degree joins finish it.  Every shuffle is on node
    keys; the top-n cut is a total order (cn desc, pair) so the
    result is deterministic under any partitioning.
    """
    adj = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    w1 = adj.select(F.col("dst").alias("mid"), F.col("src").alias("a"))
    w2 = adj.select(F.col("dst").alias("mid"), F.col("src").alias("b"))
    cand = (
        w1.join(w2, "mid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
        .filter(F.col("cn") >= min_common)
    )
    non_edges = cand.join(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    out = (
        non_edges.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            F.floor(
                F.col("cn") * F.lit(1_000_000).cast("bigint")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn"))
            )
            .cast("bigint")
            .alias("jaccard_x1m"),
        )
    )
    return out.orderBy(F.col("cn").desc(), "a", "b").limit(top_n)


def q_graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted next links in the high-quantity co-supply graph (same
    sparse >45-quantity edge construction as `graph-triangles`)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .distinct()
    )
    return common_neighbor_candidates(edges)


QUERIES["graph-common-neighbors"] = q_graph_common_neighbors

ORACLES["graph-common-neighbors"] = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_quantity > 45),
    edges AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
    adj AS (
      SELECT src, dst FROM edges
      UNION ALL SELECT dst, src FROM edges),
    deg AS (SELECT src, COUNT(*) AS deg FROM adj GROUP BY 1),
    cand AS (
      SELECT w1.src AS a, w2.src AS b, COUNT(*) AS cn
      FROM adj w1 JOIN adj w2
        ON w1.dst = w2.dst AND w1.src < w2.src
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    non_edges AS (
      SELECT c.* FROM cand c
      LEFT JOIN edges e ON e.src = c.a AND e.dst = c.b
      WHERE e.src IS NULL)
    SELECT a, b, cn,
           CAST(FLOOR(CAST(cn AS BIGINT) * 1000000.0
                / (da.deg + db.deg - cn)) AS BIGINT) AS jaccard_x1m
    FROM non_edges
    JOIN deg da ON da.src = a
    JOIN deg db ON db.src = b
    ORDER BY cn DESC, a, b LIMIT 50
"""


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity Q of a community assignment over an
    undirected ``(src, dst)`` edge list (each edge once, no
    self-loops), computed EXACTLY: Q = Σ_c (4·m·m_c − d_c²) / (4·m²)
    — the numerator accumulates as DECIMAL(38,0) integer products (no
    float until the single final division, which both engines perform
    on identical bits), so the result is order- and
    partitioning-independent where a float Σ (e_c/m − (d_c/2m)²)
    would drift.

    Scale shape: one edge⋈labels join per endpoint (node-key
    shuffles), one community groupBy for intra-edge counts, one for
    degree sums — everything after the collapse runs on |communities|
    rows.  ``labels`` must carry (node, lbl).

    Lineage (round 9, guide §5): ``m = tagged.count()`` is an eager
    ACTION that executes edges⋈labels before the main plan runs them
    again, edges feeds the tagged join AND both sides of the degree
    union, and labels feeds both endpoint joins AND the degree-sum
    groupBy — for the trade-graph key that multiplied the
    orders⋈lineitem derivation and the full 2-round label propagation
    ~4–6×.  Two eager ``localCheckpoint``s (two longs per edge / per
    node) execute each derivation once.  Everything downstream is
    integer/decimal arithmetic — bit-exact under any partitioning.

    Session-lifetime note (round-9 advice): like every eager
    ``localCheckpoint`` in this module, the checkpointed blocks live in
    executor storage until the session ends — repeated calls in a
    long-lived session accumulate (bounded: two longs per edge/node per
    call), and localCheckpoint is not fault-tolerant to executor loss.
    Acceptable for the one-query-per-invocation driver contract; a
    resident service should unpersist the returned plan's checkpoints
    after materializing its result.
    """
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    la = labels.select(F.col("node").alias("src"), F.col("lbl").alias("ca"))
    lb = labels.select(F.col("node").alias("dst"), F.col("lbl").alias("cb"))
    tagged = edges.join(la, "src").join(lb, "dst")
    m = tagged.count()
    if m == 0:  # empty graph: Q is undefined (4m² divisor) — no row,
        # matching the oracle's empty per-community grouping
        return edges.sparkSession.createDataFrame(
            [], "n_communities bigint, m_edges bigint, modularity double"
        )
    intra = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("m_c"))
    )
    adj = edges.select("src").union(edges.select(F.col("dst").alias("src")))
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    d_c = (
        labels.join(deg, labels.node == deg.src)
        .groupBy(F.col("lbl").alias("community"))
        .agg(F.sum("deg").cast("decimal(38,0)").alias("d_c"))
    )
    per = d_c.join(intra, "community", "left").select(
        "community",
        F.coalesce("m_c", F.lit(0)).alias("m_c"),
        "d_c",
        (
            F.lit(4 * m).cast("decimal(38,0)") * F.coalesce("m_c", F.lit(0))
            - F.col("d_c") * F.col("d_c")
        ).alias("num"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.lit(m).cast("bigint").alias("m_edges"),
        F.round(
            F.sum("num").cast("double") / F.lit(float(4 * m * m)), 6
        ).alias("modularity"),
    )


def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity of the 2-round deterministic LPA communities over
    the customer↔supplier trade graph — the "was that a good
    clustering" number that turns `graph-label-propagation` from a
    labeling into a measured result."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return modularity(pairs, label_propagation(pairs, iterations=2))


QUERIES["graph-modularity"] = q_graph_modularity

ORACLES["graph-modularity"] = """
    WITH e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (
      SELECT src, dst FROM e0
      UNION SELECT dst, src FROM e0
      UNION SELECT src, src FROM e0
      UNION SELECT dst, dst FROM e0),
    l1c AS (
      SELECT src AS node, dst AS lbl, COUNT(*) AS c
      FROM edges GROUP BY src, dst),
    l1 AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl) AS rn
        FROM l1c) WHERE rn = 1),
    l2c AS (
      SELECT e.src AS node, l.lbl, COUNT(*) AS c
      FROM edges e JOIN l1 l ON l.node = e.dst
      GROUP BY e.src, l.lbl),
    l2 AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl) AS rn
        FROM l2c) WHERE rn = 1),
    tagged AS (
      SELECT la.lbl AS ca, lb.lbl AS cb
      FROM e0
      JOIN l2 la ON la.node = e0.src
      JOIN l2 lb ON lb.node = e0.dst),
    m AS (SELECT COUNT(*) AS m FROM tagged),
    intra AS (
      SELECT ca AS community, COUNT(*) AS m_c
      FROM tagged WHERE ca = cb GROUP BY 1),
    adj AS (
      SELECT src FROM e0 UNION ALL SELECT dst FROM e0),
    deg AS (SELECT src, COUNT(*) AS deg FROM adj GROUP BY 1),
    dc AS (
      SELECT l.lbl AS community,
             CAST(SUM(d.deg) AS DECIMAL(38,0)) AS d_c
      FROM l2 l JOIN deg d ON d.src = l.node
      GROUP BY 1),
    per AS (
      SELECT dc.community,
             COALESCE(i.m_c, 0) AS m_c, dc.d_c,
             CAST(4 AS DECIMAL(38,0)) * m.m * COALESCE(i.m_c, 0)
               - dc.d_c * dc.d_c AS num
      FROM dc LEFT JOIN intra i USING (community), m)
    SELECT COUNT(*) AS n_communities,
           CAST(m.m AS BIGINT) AS m_edges,
           ROUND(CAST(SUM(num) AS DOUBLE)
                 / (4.0 * m.m * m.m), 6) AS modularity
    FROM per, m GROUP BY m.m
"""
