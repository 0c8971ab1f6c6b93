"""TPC-H query shapes, batch 2 (SURVEY.md §2 round-2 widening).

The reference has no joins at all (SURVEY.md §2.5 O3 is fully EXT);
round 1 covered Q1/Q4/Q6/Q17/Q18/Q19/Q22 analogues.  This module adds the
remaining classic shapes expressible on the fixture schema (no partsupp
table, no l_shipmode/commitdate — each query notes its adaptation):

- Q7  volume shipping between nation pairs (two independent dim chains)
- Q8  market share of one supplier-nation inside a region
- Q9  profit by supplier nation x order year (part-filtered)
- Q10 returned-items revenue ranking (4-way join + top-k)
- Q12 late-shipment counts by priority (CASE aggregation)
- Q13 customer order-count distribution (left join + double aggregation)
- Q14 promo revenue ratio per month (conditional ratio)
- Q15 top supplier(s) by quarterly revenue (agg + max-of-agg join-back)

Scale notes: every dim chain (nation, region, supplier, part at fixture
cardinality) is broadcast; the only shuffles are on fact keys
(l_orderkey / o_custkey) and the final group-bys.  Revenue sums go
through DECIMAL (functions/agg.py) for partition-count invariance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducer_spark.functions.agg import dec_sum, oracle_dec_sum
from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "volume_shipping_pairs",
    oracle=f"""
SELECT
  n_cust.n_name AS cust_nation,
  n_supp.n_name AS supp_nation,
  CAST(strftime(l_shipdate, '%Y') AS INT) AS l_year,
  {oracle_dec_sum(_REVENUE, 4)} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n_cust ON c_nationkey = n_cust.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n_supp ON s_nationkey = n_supp.n_nationkey
WHERE n_cust.n_nationkey <> n_supp.n_nationkey
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q7 analogue: shipping volume between distinct "
    "(customer-nation, supplier-nation) pairs per ship year. Two dim "
    "chains hang off the same fact row; both nation joins broadcast.",
    tags=("join", "tpch"),
)
def volume_shipping_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n_cust = n.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    n_supp = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cnk"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("snk"))
        .where(F.col("cnk") != F.col("snk"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dec_sum(_revenue_col(), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "nation_market_share",
    oracle=f"""
SELECT
  CAST(strftime(o_orderdate, '%Y') AS INT) AS o_year,
  round(
    {oracle_dec_sum(f"CASE WHEN n_supp.n_name = 'NATION_7' THEN {_REVENUE} ELSE 0 END", 4)}
    / {oracle_dec_sum(_REVENUE, 4)}, 6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n_cust ON c_nationkey = n_cust.n_nationkey
JOIN region   ON n_cust.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n_supp ON s_nationkey = n_supp.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY 1
""",
    doc="TPC-H Q8 analogue: NATION_7 suppliers' share of revenue sold to "
    "ASIA-region customers, per order year. Conditional-sum ratio over a "
    "6-table join; the region filter prunes through two broadcasts.",
    tags=("join", "tpch", "agg"),
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n_cust = n.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    n_supp = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    rev = _revenue_col()
    nation7_rev = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cnk"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            F.col("crk") == F.col("r_regionkey"),
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("snk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                dec_sum(nation7_rev, 4) / dec_sum(rev, 4), 6
            ).alias("mkt_share")
        )
    )


@register(
    "supplier_year_profit",
    oracle=f"""
SELECT
  n_name AS supp_nation,
  CAST(strftime(o_orderdate, '%Y') AS INT) AS o_year,
  {oracle_dec_sum("l_extendedprice * (1 - l_discount) - l_extendedprice * l_tax", 6)}
    AS profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type LIKE 'S%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 analogue (no partsupp table: profit = discounted price "
    "minus tax instead of minus supply cost): profit by supplier nation "
    "and order year for S-type parts. Part filter pushes into the "
    "broadcast side.",
    tags=("join", "tpch", "agg"),
)
def supplier_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = _revenue_col() - F.col("l_extendedprice") * F.col("l_tax")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(
            p.where(F.col("p_type").startswith("S")),
            li.l_partkey == p.p_partkey,
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dec_sum(profit, 6).alias("profit"))
    )


@register(
    "returned_items_topn",
    oracle=f"""
SELECT
  c_custkey,
  c_name,
  n_name,
  {oracle_dec_sum(_REVENUE, 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    doc="TPC-H Q10 analogue: customers who returned the most revenue in "
    "1997H1. 4-way join, decimal-exact revenue so the cross-engine top-20 "
    "cut is deterministic (tie-break on c_custkey).",
    tags=("join", "tpch", "limit"),
)
def returned_items_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            o.where(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-07-01")))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_sum(_revenue_col(), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "priority_lateness_matrix",
    oracle="""
SELECT
  o_orderpriority,
  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL '90 days'
           THEN 1 ELSE 0 END) AS BIGINT)  AS late_items,
  CAST(SUM(CASE WHEN l_shipdate <= o_orderdate + INTERVAL '90 days'
           THEN 1 ELSE 0 END) AS BIGINT)  AS ontime_items,
  COUNT(*) AS total_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
    doc="TPC-H Q12 analogue (fixture has no l_shipmode/commitdate: "
    "lateness = shipped >90 days after order date, bucketed by order "
    "priority). The CASE-aggregation shape: one fact-fact join, "
    "conditional counts.",
    tags=("join", "tpch", "agg"),
)
def priority_lateness_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_items"),
            F.sum(F.when(~late, 1).otherwise(0)).alias("ontime_items"),
            F.count(F.lit(1)).alias("total_items"),
        )
    )


@register(
    "customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    doc="TPC-H Q13: distribution of customers by order count, including "
    "zero-order customers (left join + two-level aggregation).",
    tags=("join", "tpch", "agg"),
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "promo_revenue_ratio",
    oracle=f"""
SELECT
  CAST(strftime(l_shipdate, '%Y') AS INT) AS ship_year,
  CAST(strftime(l_shipdate, '%m') AS INT) AS ship_month,
  round(
    100.0 * {oracle_dec_sum(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0 END", 4)}
    / {oracle_dec_sum(_REVENUE, 4)}, 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
""",
    doc="TPC-H Q14 analogue: percentage of revenue from PROMO-type parts, "
    "per ship month. Broadcast part join + conditional-sum ratio.",
    tags=("join", "tpch", "agg"),
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _revenue_col()
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    # part is UNHINTED (r11 hinted-broadcast budget): it grows with sf
    # (billions of rows at 100 TB) — the planner broadcasts it on its
    # own while small and degrades to a shuffle join when it is not.
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
        )
        .agg(
            F.round(
                F.lit(100.0) * dec_sum(promo_rev, 4) / dec_sum(rev, 4), 6
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "top_supplier_revenue",
    oracle=f"""
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    {oracle_dec_sum(_REVENUE, 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15: supplier(s) with maximum revenue in 1997Q1 — "
    "max-of-aggregate via an empty-frame window max (Spark) vs scalar "
    "subquery (oracle); decimal sums make the max cut exact.",
    tags=("join", "tpch", "agg"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dec_sum(_revenue_col(), 4).alias("total_revenue"))
    )
    # Global max as a 1-row broadcast joined back — unlike an
    # empty-partition window (which funnels every row through one task),
    # this stays distributed no matter how many suppliers exist.
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    top = revenue.crossJoin(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        F.broadcast(top)
        .join(s, top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "shipping_priority_topn",
    oracle=f"""
SELECT
  l_orderkey,
  {oracle_dec_sum(_REVENUE, 4)} AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    doc="TPC-H Q3: unshipped high-revenue orders for one market segment "
    "(3-way join, two pushed date filters, top-10 with deterministic "
    "tie-break).",
    tags=("join", "tpch", "limit"),
)
def shipping_priority_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") > F.to_timestamp(F.lit("1998-01-01")))
        .join(
            o.where(F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01"))),
            li.l_orderkey == o.o_orderkey,
        )
        .join(
            c.where(F.col("c_mktsegment") == "BUILDING"),
            o.o_custkey == c.c_custkey,
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dec_sum(_revenue_col(), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "local_supplier_volume",
    oracle=f"""
SELECT
  n_cust.n_name AS n_name,
  {oracle_dec_sum(_REVENUE, 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n_cust ON c_nationkey = n_cust.n_nationkey
JOIN region   ON n_cust.n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_nationkey = c_nationkey
GROUP BY 1
""",
    doc="TPC-H Q5: revenue where the supplier and customer share a "
    "nation, per EUROPE nation — the distinctive Q5 shape is the extra "
    "non-key equality (s_nationkey = c_nationkey) on top of the star "
    "joins, which prunes the join output before aggregation.",
    tags=("join", "tpch", "agg"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.where(F.col("r_name") == "EUROPE")),
            n.n_regionkey == r.r_regionkey,
        )
        .groupBy("n_name")
        .agg(dec_sum(_revenue_col(), 4).alias("revenue"))
    )

