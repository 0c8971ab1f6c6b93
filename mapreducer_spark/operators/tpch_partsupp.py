"""TPC-H Q2/Q11/Q16/Q20 shapes over a DERIVED partsupp table.

The fixtures ship no partsupp, which is the only reason these four
query shapes were missing.  Rather than leave the hole, partsupp is
DERIVED deterministically from part x supplier with TPC-H's own
linking rule (each part supplied by 4 suppliers spread S/4 apart,
dbgen's formula), and availqty/supplycost from pure integer arithmetic
on the keys — the same construction appears verbatim in the DuckDB
oracle, so what's hash-checked is the QUERY LOGIC over an identical
input, exactly like dedup.py synthesizes its duplicate corpus.

Money discipline: supplycost is generated IN CENTS (BIGINT); every
aggregation/comparison happens on exact integers (value = cents *
qty sums as BIGINT, thresholds as integer cross-multiplication) and
cents only become dollars (double) in the final projection — stronger
than decimal-rounding because no rounding happens at all.

Scale notes: partsupp = 4 rows per part, generated map-side from the
part scan crossJoined with a BROADCAST 1-row supplier-stats frame and
a 4-element explode — no shuffle to build.  Q2 resolves the per-part
regional minimum with ONE window over the (part x 4-supplier) stream;
Q11 is two exact-integer aggregations; Q16 one distinct-agg; Q20 a
semi-join chain against year-filtered shipment sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table

_PS_PER_PART = 4

# DuckDB twin of derived_partsupp(): interpolate into each oracle.
_ORACLE_PARTSUPP = f"""
  SELECT p_partkey AS ps_partkey,
         ((p_partkey + i * (s_cnt // {_PS_PER_PART})) % s_cnt) + s_min
           AS ps_suppkey,
         ((p_partkey * 7 + i * 13) % 9999) + 1 AS ps_availqty,
         ((p_partkey * 31
           + (((p_partkey + i * (s_cnt // {_PS_PER_PART})) % s_cnt) + s_min)
             * 17) % 90000) + 10000 AS ps_cost_cents
  FROM part
  CROSS JOIN (SELECT COUNT(*) AS s_cnt, MIN(s_suppkey) AS s_min
              FROM supplier)
  CROSS JOIN (SELECT unnest(generate_series(0, {_PS_PER_PART - 1})) AS i)
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp derived from part x supplier: 4 suppliers per part at
    S/4 strides (dbgen's rule), availqty and cost-in-cents from integer
    key arithmetic.  Generated map-side: part scan x broadcast 1-row
    supplier stats x 4-element explode — zero shuffles."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    sstats = (
        load_table(spark, sf_dir, "supplier")
        .agg(
            F.count(F.lit(1)).alias("s_cnt"),
            F.min("s_suppkey").alias("s_min"),
        )
    )
    i = F.explode(F.sequence(F.lit(0), F.lit(_PS_PER_PART - 1))).alias("i")
    ps = p.crossJoin(F.broadcast(sstats)).select("p_partkey", "s_cnt", "s_min", i)
    suppkey = (
        (F.col("p_partkey") + F.col("i") * (F.col("s_cnt") / _PS_PER_PART).cast("long"))
        % F.col("s_cnt")
    ) + F.col("s_min")
    return ps.select(
        F.col("p_partkey").alias("ps_partkey"),
        suppkey.alias("ps_suppkey"),
        ((F.col("p_partkey") * 7 + F.col("i") * 13) % 9999 + 1).alias(
            "ps_availqty"
        ),
        (
            (F.col("p_partkey") * 31 + suppkey * 17) % 90000 + 10000
        ).alias("ps_cost_cents"),
    )


@register(
    "min_cost_supplier_q2ish",
    oracle=f"""
WITH partsupp AS ({_ORACLE_PARTSUPP}),
region_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'AMERICA'
),
cand AS (
  SELECT p.p_partkey, p.p_brand, ps.ps_cost_cents,
         rs.s_name, rs.s_acctbal, rs.n_name,
         ROW_NUMBER() OVER (
           PARTITION BY p.p_partkey
           ORDER BY ps.ps_cost_cents, ps.ps_suppkey
         ) AS rn
  FROM part p
  JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
  JOIN region_supp rs ON rs.s_suppkey = ps.ps_suppkey
  WHERE p.p_size <= 13 AND p.p_type = 'STANDARD'
)
SELECT p_partkey, p_brand, s_name, n_name, s_acctbal,
       CAST(ps_cost_cents AS DOUBLE) / 100.0 AS supplycost
FROM cand WHERE rn = 1
""",
    doc="TPC-H Q2 shape over the derived partsupp: for every small "
    "(size <= 13) STANDARD part, the cheapest supplier located in region AMERICA "
    "(min supplycost, ties -> lowest suppkey), with name/nation/"
    "account balance.  One window over the part x 4-supplier stream "
    "resolves the correlated-min; the region dimension chain is a "
    "broadcast.  Cost ranking happens on exact cents.",
    tags=("tpch", "join", "window"),
)
def min_cost_supplier_q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_size") <= 13) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_brand")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    region_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = derived_partsupp(spark, sf_dir)
    w = Window.partitionBy("p_partkey").orderBy("ps_cost_cents", "ps_suppkey")
    return (
        p.join(ps, p.p_partkey == ps.ps_partkey)
        .join(F.broadcast(region_supp), ps.ps_suppkey == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            "s_acctbal",
            (F.col("ps_cost_cents").cast("double") / 100.0).alias("supplycost"),
        )
    )


_Q11_NATION = "NATION_3"
_Q11_FRACTION_DEN = 1000  # "important" = > 1/1000 of the nation's value


@register(
    "important_stock_q11ish",
    oracle=f"""
WITH partsupp AS ({_ORACLE_PARTSUPP}),
nat_ps AS (
  SELECT ps_partkey,
         CAST(ps_cost_cents AS BIGINT) * ps_availqty AS value_cents
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = '{_Q11_NATION}'
),
tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM nat_ps),
per_part AS (
  SELECT ps_partkey, CAST(SUM(value_cents) AS BIGINT) AS part_cents
  FROM nat_ps GROUP BY ps_partkey
)
SELECT ps_partkey,
       CAST(part_cents AS DOUBLE) / 100.0 AS stock_value
FROM per_part CROSS JOIN tot
WHERE part_cents * {_Q11_FRACTION_DEN} > total_cents
""",
    doc="TPC-H Q11 shape: per-part stock value (supplycost x availqty) "
    "held by suppliers of one nation, keeping parts worth more than "
    "1/1000 of the nation's total — the correlated HAVING resolved as "
    "an exact integer cross-multiplication (part_cents * 1000 > "
    "total_cents) against a 1-row broadcast total, so no floating "
    "threshold can drift between engines.",
    tags=("tpch", "agg", "subquery"),
)
def important_stock_q11ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == _Q11_NATION
    )
    # supplier is UNHINTED (r11 hinted-broadcast budget): grows with
    # sf; nation (filtered, <=1 row) stays hinted.
    nat_ps = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_cents"),
        )
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("part_cents")
    )
    tot = nat_ps.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .where(F.col("part_cents") * _Q11_FRACTION_DEN > F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("part_cents").cast("double") / 100.0).alias("stock_value"),
        )
    )


@register(
    "supplier_count_by_part_q16ish",
    oracle=f"""
WITH partsupp AS ({_ORACLE_PARTSUPP}),
ok_supp AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
JOIN ok_supp ON s_suppkey = ps_suppkey
WHERE p_brand <> 'Brand#2' AND p_type <> 'ECONOMY'
GROUP BY p_brand, p_type, p_size
""",
    doc="TPC-H Q16 shape: how many distinct suppliers can deliver each "
    "(brand, type, size) combination, excluding one brand, one type, "
    "and suppliers in bad standing (negative account balance — the "
    "fixture's stand-in for Q16's complaint filter).  Distinct-agg "
    "after two broadcast-joined filters.",
    tags=("tpch", "agg", "distinct"),
)
def supplier_count_by_part_q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") != "Brand#2") & (F.col("p_type") != "ECONOMY"))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    ok_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") >= 0)
        .select("s_suppkey")
    )
    return (
        ps.join(p, ps.ps_partkey == p.p_partkey)
        # ok_supp is UNHINTED (r11 hinted-broadcast budget): a supplier
        # subset that grows with sf; the planner broadcasts it on its own.
        .join(ok_supp, ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


_Q20_YEAR = 1996


@register(
    "excess_stock_suppliers_q20ish",
    oracle=f"""
WITH partsupp AS ({_ORACLE_PARTSUPP}),
shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(round(l_quantity, 2) AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS qty
  FROM lineitem
  WHERE year(l_shipdate) = {_Q20_YEAR}
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE CAST(ps_availqty AS DECIMAL(18,2)) * 2 > qty
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN excess ON excess.ps_suppkey = s_suppkey
""",
    doc="TPC-H Q20 shape: suppliers holding EXCESS stock — availqty "
    "more than half of what that (part, supplier) pair actually "
    "shipped in 1996 — reported with their nation.  Shipment sums "
    "aggregate as DECIMAL and the half-threshold is the exact "
    "cross-multiplication availqty*2 > qty; the excess set semi-joins "
    "back to the supplier dimension.",
    tags=("tpch", "join", "semi"),
)
def excess_stock_suppliers_q20ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate") == _Q20_YEAR)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.round("l_quantity", 2).cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("qty")
        )
    )
    excess = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .where(F.col("ps_availqty").cast("decimal(18,2)") * 2 > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, F.col("ps_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "n_name")
    )
