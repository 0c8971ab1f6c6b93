"""Window functions (SURVEY.md §2.6 — all EXT, none in the reference).

Ranking, analytic (lag/lead), and frame-based (running/moving) windows.
Every ORDER BY inside a window carries a unique tie-break column so
results are total-ordered and oracle-hashable.

Scale: a window = one shuffle on partitionBy keys + per-partition sort.
Partition keys here (custkey, user_id) are high-cardinality, so state per
key is small; skewed keys would be handled by AQE or pre-salting.
Running sums go through DECIMAL so the fold is exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducer_spark.functions.agg import dec_sum
from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table


@register(
    "top_orders_per_customer",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT
    o_custkey AS c_custkey,
    o_orderkey,
    o_totalprice,
    ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) AS rn
  FROM orders
)
WHERE rn <= 3
""",
    doc="row_number ranking: top-3 orders per customer (§2.6).",
    tags=("window",),
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "rank_dense_ntile",
    oracle="""
SELECT
  o_orderkey,
  o_orderpriority,
  RANK()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
  DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS drnk,
  NTILE(4)     OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS quartile
FROM orders
WHERE o_orderkey % 100 = 0
""",
    doc="rank / dense_rank / ntile in one pass (§2.6).",
    tags=("window",),
)
def rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "running_customer_spend",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS running_spend
FROM orders
""",
    doc="running (cumulative) sum per customer — decimal-exact fold (§2.6).",
    tags=("window",),
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "moving_avg_spend",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
    / COUNT(*) OVER w AS mavg3
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
)
""",
    doc="3-row moving average (frame window, §2.6).",
    tags=("window",),
)
def moving_avg_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("mavg3"),
    )


@register(
    "event_value_delta",
    oracle="""
SELECT
  user_id,
  event_id,
  "value" - LAG("value") OVER w  AS delta_prev,
  LEAD(event_type) OVER w        AS next_type,
  FIRST_VALUE(event_id) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS first_event
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    doc="lag / lead / first_value analytics over an event stream (§2.6).",
    tags=("window", "events"),
)
def event_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_id").over(wf).alias("first_event"),
    )


@register(
    "customer_spend_distribution",
    oracle="""
SELECT
  c_custkey,
  total_spend,
  round(PERCENT_RANK() OVER (ORDER BY total_spend, c_custkey), 6) AS pct_rank,
  round(CUME_DIST()    OVER (ORDER BY total_spend, c_custkey), 6) AS cume,
  NTILE(10)            OVER (ORDER BY total_spend, c_custkey)     AS decile
FROM (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
)
""",
    doc="Distributional window functions (percent_rank / cume_dist / "
    "ntile) over per-customer spend — the analytic ranking family "
    "completing §2.6. Global ORDER BY window = single-partition stage; "
    "fine over an aggregated (small) relation, never over raw facts.",
    tags=("window", "rank"),
)
def customer_spend_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreducer_spark.functions.agg import (
        global_row_number_with_total,
        ntile_from_rn,
    )

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        dec_sum("o_totalprice").alias("total_spend")
    )
    # Scale-safe distributional windows: over the UNIQUE ordering
    # (total_spend, c_custkey) the window functions reduce to arithmetic
    # on the global row number — percent_rank = (rn-1)/(n-1), cume_dist
    # = rn/n, ntile via exact bucket arithmetic — so the two-phase
    # distributed ranking replaces the single-partition global window.
    # n comes from the helper's own size collect (no second scan).
    ranked, n = global_row_number_with_total(
        spend, ["total_spend", "c_custkey"]
    )
    rn = F.col("rn")
    return ranked.select(
        "c_custkey",
        "total_spend",
        F.round((rn - 1) / F.lit(max(n - 1, 1)), 6).alias("pct_rank"),
        F.round(rn / F.lit(n), 6).alias("cume"),
        ntile_from_rn(rn, n, 10).alias("decile"),
    )


@register(
    "nth_order_gap",
    oracle="""
SELECT
  o_custkey,
  strftime(first_dt, '%Y-%m-%d')  AS first_order,
  strftime(third_dt, '%Y-%m-%d')  AS third_order,
  CAST(datediff('day', first_dt, third_dt) AS INT) AS days_to_third
FROM (
  SELECT DISTINCT
    o_custkey,
    NTH_VALUE(o_orderdate, 1) OVER w AS first_dt,
    NTH_VALUE(o_orderdate, 3) OVER w AS third_dt
  FROM orders
  WINDOW w AS (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  )
)
WHERE third_dt IS NOT NULL
""",
    doc="nth_value over a full-partition frame: time from each "
    "customer's first to third order — the cohort-velocity metric. "
    "Completes the analytic-function family (lag/lead/first/last/"
    "nth_value).",
    tags=("window", "nth"),
)
def nth_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    picked = o.select(
        "o_custkey",
        F.nth_value("o_orderdate", 1).over(w).alias("first_dt"),
        F.nth_value("o_orderdate", 3).over(w).alias("third_dt"),
    ).distinct()
    return picked.where(F.col("third_dt").isNotNull()).select(
        "o_custkey",
        F.date_format("first_dt", "yyyy-MM-dd").alias("first_order"),
        F.date_format("third_dt", "yyyy-MM-dd").alias("third_order"),
        F.datediff("third_dt", "first_dt").cast("int").alias("days_to_third"),
    )


@register(
    "last_purchase_locf",
    oracle="""
SELECT
  event_id,
  user_id,
  event_type,
  round(last_value(CASE WHEN event_type = 'purchase' THEN "value" END
                   IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ), 6) AS last_purchase_value
FROM events
""",
    doc="Last-observation-carried-forward (LOCF) via IGNORE NULLS: for "
    "every event, the value of that user's most recent purchase at or "
    "before it — the standard sparse-signal forward-fill used for "
    "sessionized feature tables. last(expr, ignorenulls) over a running "
    "frame is the Spark idiom; DuckDB's IGNORE NULLS window is the "
    "declarative twin. One shuffle on user_id + per-partition sort, "
    "same cost envelope as any analytic window (§2.6).",
    tags=("window", "events", "locf"),
)
def last_purchase_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_value = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.last(purchase_value, ignorenulls=True).over(w), 6).alias(
            "last_purchase_value"
        ),
    )
