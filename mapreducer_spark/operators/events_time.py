"""Event-time operators (SURVEY.md §2.9) — batch-mode checked forms.

The reference is batch-only; these are the EXT event-time ops.  Batch
`window()` / `session_window()` on the parquet `events` table is the
oracle-checkable surface; the Structured Streaming wrappers in
mapreducer_spark/streaming/ reuse the same expressions (identical
semantics, different source/sink).

Spark's `window(ts, w, s)` buckets are epoch-aligned in UTC — identical
alignment to DuckDB `time_bucket`/`date_trunc`, verified in tests.
Window starts are emitted as formatted strings so the oracle hash can't
be tripped by timestamp-type round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducer_spark.functions.agg import dec_sum
from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "events_tumbling_daily",
    oracle=f"""
SELECT
  strftime(date_trunc('day', ts), '{_FMT_DUCK}') AS w_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling 1-day event-time window (§2.9): batch form of "
    "groupBy(window(ts, '1 day')).",
    tags=("events", "window-time"),
)
def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), _FMT_SPARK).alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


@register(
    "events_sliding_hourly",
    oracle=f"""
SELECT
  strftime(w_start_ts, '{_FMT_DUCK}') AS w_start,
  COUNT(*) AS n_events,
  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM (
  SELECT
    unnest([
      time_bucket(INTERVAL '30 minutes', ts),
      time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
    ]) AS w_start_ts,
    "value"
  FROM events
)
GROUP BY 1
""",
    doc="Sliding window: 1 hour every 30 minutes (§2.9). Each event lands "
    "in exactly 2 windows; oracle materializes both bucket starts.",
    tags=("events", "window-time"),
)
def events_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _FMT_SPARK).alias("w_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_session_windows",
    oracle=None,  # session windows aren't SQL-expressible in DuckDB → rows-only
    doc="Session windows with 30-minute gap per user (§2.9). Batch form of "
    "session_window(ts, '30 minutes'); the streaming twin lives in "
    "streaming/jobs.py. Deterministic but not oracle-expressible.",
    tags=("events", "window-time", "rows-only"),
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _FMT_SPARK).alias("session_start"),
            F.date_format(F.col("w.end"), _FMT_SPARK).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "event_type_funnel",
    oracle="""
SELECT
  user_id,
  COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
  COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
  (COUNT(*) FILTER (WHERE event_type = 'purchase') > 0
   AND COUNT(*) FILTER (WHERE event_type = 'view') > 0) AS converted
FROM events
GROUP BY user_id
""",
    doc="Conditional aggregation (pivot-style funnel) over the event stream.",
    tags=("events", "agg"),
)
def event_type_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def n_of(t: str):
        return F.count(F.when(F.col("event_type") == t, 1))

    return e.groupBy("user_id").agg(
        n_of("view").alias("n_view"),
        n_of("click").alias("n_click"),
        n_of("purchase").alias("n_purchase"),
        ((n_of("purchase") > 0) & (n_of("view") > 0)).alias("converted"),
    )
