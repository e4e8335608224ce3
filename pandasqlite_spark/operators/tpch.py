"""Full TPC-H-style composite queries (Q1/Q3/Q5/Q10/Q18 shapes, adapted
to the driver's simplified star schema — `TESTDATA.md`).

The reference's generated SQL routinely composes multi-table joins +
filters + aggregates + top-k in one statement (`README.md:42-46`:
"top 10 customers with highest turnover last month" is exactly the Q10
shape), so these pin the *composed* surface, not just one operator at a
time.  Each is written DataFrame-first the way the 100 TB plan wants
it:

- dimension tables (`region`, `nation`) are explicitly `broadcast()` —
  the fact side never shuffles for them;
- fact⋈fact joins (orders⋈lineitem) shuffle once on the join key and
  AQE handles skew;
- aggregates accumulate in DECIMAL (exact, order-independent, still
  partial-aggregatable) and surface as DOUBLE (`common.py` docstring);
- every top-k is ORDER BY + LIMIT with a unique tie-break key →
  `TakeOrderedAndProject`, never a full sort.

Averages are computed as exact-decimal-sum ÷ count in IEEE double —
bit-identical across engines, unlike a streaming double `avg()`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,2)")


def _disc_price() -> Column:
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: one scan, map-side partial agg, tiny shuffle
    (|groups| × |partitions| rows)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    # charge uses NARROW input precisions on purpose: with (18,2)
    # operands the triple product overflows DECIMAL(38) — Spark then
    # rounds (allowPrecisionLoss) while DuckDB promotes to DOUBLE, two
    # different inexact paths that diverged by 1 ulp at sf1.  With
    # (12,2)·(4,2) inputs the product is DECIMAL(24,6): exactly
    # representable, bit-identical sums in both engines at any SF.
    ext12 = F.col("l_extendedprice").cast("decimal(12,2)")
    one4 = F.lit(1).cast("decimal(4,2)")
    charge = (
        ext12
        * (one4 - F.col("l_discount").cast("decimal(4,2)"))
        * (one4 + F.col("l_tax").cast("decimal(4,2)"))
    )
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sq"),
            F.sum(_dec("l_extendedprice")).alias("_sb"),
            F.sum(_disc_price()).alias("_sd"),
            F.sum(charge).alias("_sc"),
            F.sum(_dec("l_discount")).alias("_sdisc"),
            n.alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sb").cast("double").alias("sum_base_price"),
            F.col("_sd").cast("double").alias("sum_disc_price"),
            # round the charge sum to scale 2 BEFORE the double cast:
            # at scale 6 the unscaled value tops 2^53 and the
            # decimal→double conversion itself rounds differently
            # across engines (Java's correctly-rounded string path vs
            # a two-step int→double/10^scale) — at scale 2 the
            # unscaled value is exactly double-representable
            F.round(F.col("_sc"), 2).cast("double").alias("sum_charge"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            (F.col("_sb").cast("double") / F.col("count_order")).alias("avg_price"),
            (F.col("_sdisc").cast("double") / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: selective dim filter → fact join → top-10.
    The BUILDING-segment customer set is small → broadcast; lineitem
    never shuffles for it (join on o_orderkey is the only exchange)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: five-way join.  region⋈nation collapse
    to a broadcast filter on nationkey; customer⋈supplier co-location
    (c_nationkey = s_nationkey) is a residual predicate, not a shuffle
    key."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    asia_nations = F.broadcast(
        nation.join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        ).select("n_nationkey", "n_name")
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(asia_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting — the README's "top customers by
    turnover" shape: time-boxed fact join, per-customer revenue, top-20."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load(spark, sf_dir, "customer")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume orders: self-aggregating HAVING subquery.  The
    per-order quantity agg and the join reuse the same o_orderkey
    partitioning — Catalyst plans one exchange for both."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting revenue: pure scan-side query — every predicate
    reaches the parquet reader (PushedFilters), the aggregate is one
    partial-agg row per partition, zero joins.  The canonical 'is the
    scan path efficient' probe."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.03, 0.05))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue")
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: LEFT OUTER fact join →
    per-customer count (counting only matched rows) → histogram of the
    counts.  Two aggregations, each partial-aggregatable; customers
    with no orders land in the c_count=0 bucket via the outer join."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking (adapted: the schema has no
    commit/receipt dates, so the EXISTS predicate is 'a line shipped
    after the order date').  Catalyst rewrites EXISTS to a left-semi
    join — orders shuffle once on the key, lineitem is pre-aggregated
    by the semi-join (no fan-out)."""
    from pandasqlite_spark.operators.common import register_views

    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE'1996-01-01' AND o_orderdate < DATE'1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations: the nation pair table is
    4 rows → broadcast; the supp_nation/cust_nation disjunction is a
    predicate on the broadcast result, never a blow-up join."""
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pairs = F.broadcast(
        n1.crossJoin(n2).filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            pairs,
            (F.col("s_nationkey") == F.col("s_nk"))
            & (F.col("c_nationkey") == F.col("c_nk")),
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: conditional aggregation over a fact⋈dim
    join; both sums come out of ONE aggregation pass.  The percentage
    division happens on the two exact decimal sums."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    part = load(spark, sf_dir, "part")
    promo = F.when(F.col("p_type").startswith("PROMO"), _disc_price()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).alias("_promo"),
            F.sum(_disc_price()).alias("_total"),
        )
        .select(
            (F.lit(100.0) * F.col("_promo").cast("double") / F.col("_total").cast("double")).alias(
                "promo_revenue_pct"
            )
        )
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue (adapted: no shipmode/shipinstruct
    columns): disjunctive brand/size/quantity predicates.  The OR of
    brand-specific conjunctions is one residual filter on a single
    broadcast join — Catalyst does not multiply the join."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    ) | (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    ) | (
        (F.col("p_brand") == "Brand#24")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit (adapted: no partsupp table, so supply
    cost is the part's retail price — the join/agg shape is what
    matters).  The heaviest join pattern in the set: lineitem joins
    THREE ways (part by partkey, supplier by suppkey, orders by
    orderkey).  Only nation is forced broadcast; part/supplier are left
    to the planner — locally they fit the auto-broadcast threshold, at
    100 TB they shuffle-join and AQE picks the build side."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    amount = _disc_price() - _dec("l_quantity") * _dec("p_retailprice")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept waiting (adapted: no commit/receipt
    dates — "late" is shipping >60 days after the order date), written
    DECORRELATED: the classic form is a doubly-correlated
    EXISTS/NOT-EXISTS over lineitem (the oracle keeps that shape);
    here per-order supplier/late-supplier counts are WINDOW aggregates
    over the l_orderkey partition, so both subqueries collapse into
    the one shuffle the l⋈orders join already pays — no lineitem
    self-join at all."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    from pyspark.sql import Window as W

    l = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    # per-order supplier counts as WINDOW aggregates — the order's line
    # set is the window partition, so there is no per_order self-join
    # and the fact shuffles exactly once on l_orderkey
    w = W.partitionBy("l_orderkey")
    l = l.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w))).withColumn(
        "n_late_supp",
        F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
    )
    supp = load(spark, sf_dir, "supplier")
    nat = F.broadcast(load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5"))
    return (
        l.filter("late")
        # EXISTS(other supplier) ⇔ n_supp >= 2; NOT EXISTS(other LATE
        # supplier) ⇔ n_late_supp = 1 (this line's supplier is late, so
        # it is the one late supplier)
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


def _supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The schema has no ``partsupp`` table, so the supplier↔part
    relation (and a per-pair "supply cost") is derived from observed
    lineitem rows: MIN(l_extendedprice) per (partkey, suppkey).  MIN of
    doubles is exact and order-independent, so both engines agree
    bit-for-bit.  At scale this is one partial-aggregatable groupBy on
    the fact table — the same shuffle a real partsupp scan would
    replace."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min("l_extendedprice").alias("ps_supplycost"))


_SP_CTE = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice) AS ps_supplycost
        FROM lineitem GROUP BY 1, 2
"""


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier (adapted: supplier↔part relation from
    lineitem, see ``_supplier_parts``).  The classic form is a
    correlated MIN subquery per part; here it is DECORRELATED into a
    window MIN over the ps_partkey partition, which Catalyst plans on
    the partitioning the part-join already established — no second
    scan of the pair table and no self-join.  part is filtered first
    (selective p_size/p_type predicate, pushed to parquet) and
    broadcast; region⋈nation collapses to a broadcast nationkey set."""
    from pyspark.sql import Window as W

    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nations = F.broadcast(
        load(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = load(spark, sf_dir, "supplier").join(
        nations, F.col("s_nationkey") == F.col("n_nationkey")
    )
    sp = (
        _supplier_parts(spark, sf_dir)
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = W.partitionBy("ps_partkey")
    return (
        sp.withColumn("_min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("ps_supplycost").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: the widest join in the set (part,
    supplier, lineitem, orders, customer, nation×2, region).  Both
    nation legs and region are broadcast; part's selective p_type
    filter prunes lineitem early via the broadcast join; numerator and
    denominator accumulate in exact DECIMAL and divide once in IEEE
    double — bit-identical across engines."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = F.broadcast(
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cust_nationkey"))
    )
    n2 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("supp_nationkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    vol = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("cust_nationkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("supp_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        vol.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)).alias("_n"),
            F.sum("volume").alias("_d"),
        )
        .select(
            "o_year",
            (F.col("_n").cast("double") / F.col("_d").cast("double")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock (adapted): per-part inventory value from the
    lineitem-derived pair relation, kept when above 0.1% of the total.
    The global total is a one-row broadcast (scalar-subquery shape) —
    the per-part aggregate is NOT re-scanned for it; Spark reuses the
    aggregated frame for both sides.  Both sides of the HAVING
    comparison are exact decimals cast to double once, so the
    threshold test is engine-independent."""
    nation = F.broadcast(
        load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    )
    supp = load(spark, sf_dir, "supplier").join(
        nation, F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load(spark, sf_dir, "lineitem")
    val = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("_val")
        )
    )
    total = val.agg(F.sum("_val").cast("double").alias("_total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("_val").cast("double") > F.col("_total") * 0.001)
        .select("ps_partkey", F.col("_val").cast("double").alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode priority (adapted: no l_shipmode/commitdate
    columns — the "mode" is l_returnflag and "late" is shipping >30
    days after the order date).  One fact⋈fact join on the order key,
    CASE-sum aggregation entirely map-side-combinable."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: quarterly per-supplier revenue, keep the
    max-revenue supplier(s) via a one-row broadcast of the maximum
    (the classic view + scalar subquery, decorrelated).  Revenue
    accumulates in exact decimal so the equality against the max is
    deterministic — never compare floating sums for equality."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("_rev")
    )
    top = revenue.agg(F.max("_rev").alias("_max_rev"))
    supp = load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("_rev") == F.col("_max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier-count by part attributes (adapted: pair relation
    from lineitem; the NOT-IN "complaints" exclusion is suppliers with
    negative account balance).  The excluded-supplier set is tiny →
    broadcast LEFT ANTI join (NULL-safe because s_suppkey is the build
    side's only column and never null); COUNT(DISTINCT) shuffles
    already-distinct (partkey,suppkey) pairs, not raw lineitem rows."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey"), F.col("l_suppkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: correlated per-part AVG
    subquery, DECORRELATED into a window AVG over the l_partkey
    partition — lineitem is scanned ONCE (a groupBy-avg-join-back form
    would rescan the fact table, and at 100 TB the second scan costs
    more than the one shuffle of the broadcast-pruned subset).  The
    selective part filter broadcasts and prunes before the window, so
    only matching parts' rows shuffle; quantities are integral doubles,
    so the mean is exact in both engines."""
    from pyspark.sql import Window as W

    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "ECONOMY")
    )
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    w = W.partitionBy("l_partkey")
    return (
        li.withColumn("_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly")
        )
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion (adapted): suppliers in NATION_14
    who shipped >300 units of '%red%' parts in 1996.  The qualifying
    supplier set is a per-supplier HAVING aggregate semi-joined to the
    supplier dim — the fact table is touched once, pre-filtered by the
    broadcast part set and the pushed-down shipdate range."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    qualifying = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 300)
        .select("l_suppkey")
    )
    nation = F.broadcast(
        load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_14")
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity (adapted: the "country code" is the
    last digit of c_name — the schema has no phone column).  The
    positive-balance average is computed as exact-decimal-sum ÷ count
    (a float AVG would be partial-order-dependent and could flip rows
    sitting on the threshold), broadcast as one row; customers with
    RECENT orders (≥ 2000-01-01 — at sf0.01 every customer has *some*
    order, so the classic no-orders-at-all predicate is vacuous) drop
    via LEFT ANTI join."""
    cust = load(spark, sf_dir, "customer").withColumn("cntrycode", F.substring(F.col("c_name"), -1, 1))
    eligible = cust.filter(F.col("cntrycode").isin("1", "2", "3", "4", "5", "6"))
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("_avg_bal")
    )
    recent_orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("_avg_bal"))
        .join(recent_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_DISC = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

ORACLES: dict[str, str] = {
    "tpch-q1": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM({_DISC}) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                        * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2)
                    AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "tpch-q3": f"""
        SELECT l_orderkey, o_orderdate,
               CAST(SUM({_DISC}) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1996-03-15'
          AND l_shipdate  > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
    "tpch-q5": f"""
        SELECT n_name, CAST(SUM({_DISC}) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    "tpch-q10": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(SUM({_DISC}) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "tpch-q6": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.05
          AND l_quantity < 24
    """,
    "tpch-q13": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "tpch-q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "tpch-q7": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(SUM({_DISC}) AS DOUBLE) AS revenue
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "tpch-q14": f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                                     THEN {_DISC}
                                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(SUM({_DISC}) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    "tpch-q19": f"""
        SELECT CAST(SUM({_DISC}) AS DOUBLE) AS revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30))
    """,
    "tpch-q9": f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM({_DISC} - CAST(l_quantity AS DECIMAL(18,2))
                                  * CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_profit
        FROM lineitem, part, supplier, orders, nation
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
          AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    "tpch-q21": """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "tpch-q18": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(big._q AS DOUBLE) AS total_qty
        FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS _q
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "tpch-q2": f"""
        WITH sp AS ({_SP_CTE})
        SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost AS supply_cost
        FROM part, sp, supplier, nation, region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size = 15 AND p_type = 'SMALL'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND ps_supplycost = (
                SELECT MIN(ps2.ps_supplycost)
                FROM sp ps2, supplier s2, nation n2, region r2
                WHERE ps2.ps_partkey = p_partkey
                  AND s2.s_suppkey = ps2.ps_suppkey
                  AND s2.s_nationkey = n2.n_nationkey
                  AND n2.n_regionkey = r2.r_regionkey
                  AND r2.r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "tpch-q8": f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                     {_DISC} AS volume,
                     n2.n_name AS supp_nation
              FROM part, supplier, lineitem, orders, customer,
                   nation n1, nation n2, region
              WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
                AND l_orderkey = o_orderkey AND o_custkey = c_custkey
                AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
                AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate <= TIMESTAMP '1997-12-31'
                AND p_type = 'ECONOMY')
        GROUP BY o_year ORDER BY o_year
    """,
    "tpch-q11": """
        WITH sv AS (
            SELECT l_partkey AS ps_partkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS val
            FROM lineitem, supplier, nation
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_1'
            GROUP BY 1)
        SELECT ps_partkey, CAST(val AS DOUBLE) AS value
        FROM sv
        WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) FROM sv) * 0.001
        ORDER BY value DESC, ps_partkey
    """,
    "tpch-q12": """
        SELECT l_returnflag AS ship_mode,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY 1 ORDER BY 1
    """,
    "tpch-q15": f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no, SUM({_DISC}) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1)
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_rev = (SELECT MAX(total_rev) FROM revenue)
        ORDER BY s_suppkey
    """,
    "tpch-q16": """
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand <> 'Brand#45' AND p_type <> 'PROMO'
          AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "tpch-q17": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#12' AND p_type = 'ECONOMY'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    "tpch-q20": """
        SELECT s_name, s_acctbal
        FROM supplier, nation
        WHERE s_suppkey IN (
                SELECT l_suppkey
                FROM lineitem, part
                WHERE l_partkey = p_partkey AND p_name LIKE '%red%'
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1997-01-01'
                GROUP BY l_suppkey
                HAVING SUM(l_quantity) > 300)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_14'
        ORDER BY s_name
    """,
    "tpch-q22": """
        SELECT cntrycode, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM (SELECT substr(c_name, length(c_name), 1) AS cntrycode,
                     c_acctbal, c_custkey
              FROM customer
              WHERE substr(c_name, length(c_name), 1) IN ('1','2','3','4','5','6')) c
        WHERE CAST(c_acctbal AS DOUBLE) > (
                SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*)
                FROM customer
                WHERE c_acctbal > 0.00
                  AND substr(c_name, length(c_name), 1) IN ('1','2','3','4','5','6'))
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY cntrycode ORDER BY cntrycode
    """,
}

QUERIES = {
    "tpch-q1": q_tpch_q1,
    "tpch-q3": q_tpch_q3,
    "tpch-q4": q_tpch_q4,
    "tpch-q6": q_tpch_q6,
    "tpch-q13": q_tpch_q13,
    "tpch-q5": q_tpch_q5,
    "tpch-q7": q_tpch_q7,
    "tpch-q10": q_tpch_q10,
    "tpch-q14": q_tpch_q14,
    "tpch-q18": q_tpch_q18,
    "tpch-q19": q_tpch_q19,
    "tpch-q9": q_tpch_q9,
    "tpch-q21": q_tpch_q21,
    "tpch-q2": q_tpch_q2,
    "tpch-q8": q_tpch_q8,
    "tpch-q11": q_tpch_q11,
    "tpch-q12": q_tpch_q12,
    "tpch-q15": q_tpch_q15,
    "tpch-q16": q_tpch_q16,
    "tpch-q17": q_tpch_q17,
    "tpch-q20": q_tpch_q20,
    "tpch-q22": q_tpch_q22,
}
