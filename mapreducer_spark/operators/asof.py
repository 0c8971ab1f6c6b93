"""As-of join (SURVEY.md §2.5 O3 — EXT; no native PySpark operator).

Semantics: for each left row (event at time t, key k), attach the most
recent right row (order of customer k with o_orderdate <= t).  DuckDB has
native ASOF JOIN for the oracle; the Spark implementation is the
scalable union+window pattern:

    1. tag both streams and union them on (key, time)
    2. one window per key ordered by (time, side) — right rows sort
       before left rows at equal time, so "<=" semantics hold
    3. last(right_payload, ignoreNulls) over rows-unbounded-preceding
       carries the latest right row forward
    4. keep only left rows

Cost at scale: ONE shuffle of (|L|+|R|) rows on the key + a
per-partition sort — the same cost profile as a sort-merge join, with no
range-explosion.  This beats a range-join + row_number()=1, which
produces |L| x |matching R| intermediates.

Right rows are pre-deduplicated per (key, time) with max_by so ties are
deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
) -> DataFrame:
    """Generic as-of join: latest right row with time <= left time, per key.

    Returns the left DataFrame's columns plus ``right_payload`` columns
    (null when no right row precedes the left row).
    """
    left_cols = left.columns
    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_payload],
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in right_payload],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        *left_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_payload],
    )
    return carried.where(F.col("__side") == 1).drop("__side")


@register(
    "events_asof_latest_order",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    doc="As-of join: each event matched to the user's most recent order "
    "(union+window implementation; DuckDB native ASOF JOIN oracle).",
    tags=("join", "asof", "events"),
)
def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # Dedup right side per (key, time): ties on o_orderdate keep max key,
    # mirroring the oracle's max() pre-aggregation.
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_payload=["o_orderkey"],
    )
    return joined.select(
        "event_id", "user_id", F.col("o_orderkey").alias("last_orderkey")
    )


_ATTRIB_WINDOW_SECS = 7200  # 2-hour attribution window


@register(
    "purchase_attribution_asof",
    oracle=f"""
WITH v AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT p.event_id, p.user_id, p.ts, v.view_event_id, v.ts AS view_ts
  FROM p ASOF LEFT JOIN v
    ON p.user_id = v.user_id AND p.ts >= v.ts
)
SELECT
  event_id,
  user_id,
  CASE WHEN date_diff('second', view_ts, ts) <= {_ATTRIB_WINDOW_SECS}
       THEN view_event_id END AS attributed_view_id,
  CASE WHEN date_diff('second', view_ts, ts) <= {_ATTRIB_WINDOW_SECS}
       THEN date_diff('second', view_ts, ts) END AS secs_since_view
FROM m
""",
    doc="As-of join with a TOLERANCE bound (the 'asof ... tolerance' "
    "form): each purchase is attributed to the user's most recent "
    "preceding view only if it happened within a 2-hour window, else "
    "NULL — the standard attribution-window semantics.  Same "
    "union+window single-shuffle as-of core; the matched right TIME is "
    "carried with the payload and the bound applied as a row-local "
    "post-predicate, expressed identically in the oracle (complete "
    "second boundaries: DuckDB date_diff('second') == difference of "
    "floored epoch seconds).",
    tags=("join", "asof", "events"),
)
def purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
        .withColumnRenamed("ts", "view_ts")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        views.withColumnRenamed("user_id", "v_user_id"),
        left_key="user_id",
        right_key="v_user_id",
        left_time="ts",
        right_time="view_ts",
        right_payload=["view_event_id", "view_ts"],
    )
    secs = F.col("ts").cast("long") - F.col("view_ts").cast("long")
    fresh = secs <= _ATTRIB_WINDOW_SECS
    return joined.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("view_event_id")).alias("attributed_view_id"),
        F.when(fresh, secs).alias("secs_since_view"),
    )
