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
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, "value",
    CASE WHEN ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
         OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT *,
    CAST(SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS sid
  FROM flagged
)
SELECT
  user_id,
  strftime(MIN(ts), '{_FMT_DUCK}') AS session_start,
  strftime(MAX(ts) + INTERVAL '30 minutes', '{_FMT_DUCK}') AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM sessioned
GROUP BY user_id, sid
""",
    doc="Session windows with 30-minute gap per user (§2.9). Batch form of "
    "session_window(ts, '30 minutes'); the streaming twin lives in "
    "streaming/jobs.py.  Promoted from rows-only to hash-checked: "
    "session_window is definitionally gaps-and-islands with window end "
    "= last event + gap, and two touching windows (gap exactly elapsed) "
    "do NOT merge, so the oracle's new-session predicate is >= (the "
    "sibling event_sessions query keeps the conventional > form; the "
    "fixture's microsecond timestamps make exact-gap ties improbable "
    "but the predicate is still pinned to Spark's semantics).",
    tags=("events", "window-time", "session"),
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


@register(
    "events_dow_hour_heatmap",
    oracle="""
SELECT
  CAST(dayofweek(ts) AS INT)  AS dow,
  CAST(hour(ts) AS INT)       AS hod,
  COUNT(*)                    AS n_events,
  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Day-of-week x hour-of-day activity heatmap — the standard "
    "event-cadence rollup; one map-side-combined aggregation. (DuckDB "
    "dayofweek is 0=Sunday; Spark dayofweek is 1=Sunday, so the Spark "
    "side subtracts 1 to pin the shared convention.)",
    tags=("events", "agg"),
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("total_value"),
    )


def _static_dot(x, y, dims: int = 24):
    """Dot product unrolled over a FIXED dimension count.

    Higher-order-function lambdas (zip_with/aggregate) are
    CodegenFallback — interpreted per row — which turned the all-pairs
    stage into the whole query's cost (14.4s vs 0.9s at sf0.1 for ~2.2M
    pairs).  A static element_at sum stays inside whole-stage codegen;
    addition order (left fold, i=1..dims) matches both the HOF version
    and DuckDB's list_cosine_similarity, so hashes are unchanged.
    """
    terms = [
        F.element_at(x, i) * F.element_at(y, i) for i in range(1, dims + 1)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


_PROFILE_TOPK = 5
# Refusal bound for the O(U^2) exact reference: 20k users = 400M
# unrolled cosines, the outer edge of "fits a test/debug run"; anything
# bigger must use the LSH-blocked variant.
_MAX_EXACT_PROFILE_USERS = 20_000


def _hour_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, v: 24-dim hour-of-day count profile, nrm) — materialized
    once; shared by the exact and LSH-blocked similarity queries.

    Built as ONE conditional-sum aggregation (24 pivoted counters per
    user, map-side combined) instead of the earlier per-(user, hour)
    groupBy + dense hour spine + collect_list re-assembly: same dense
    24-vector, but a single shuffle of 24-int rows and no distinct-users
    scan or spine join (three shuffles -> one)."""
    e = load_table(spark, sf_dir, "events")
    hod = F.hour("ts")
    prof = e.groupBy("user_id").agg(
        *[
            F.sum(F.when(hod == h, 1).otherwise(0))
            .cast("double")
            .alias(f"h{h}")
            for h in range(24)
        ]
    )
    v = F.array(*[F.col(f"h{h}") for h in range(24)])
    return (
        prof.select("user_id", v.alias("v"))
        # Norm computed ONCE per profile, not once per pair.
        .select(
            "user_id", "v", F.sqrt(_static_dot(F.col("v"), F.col("v"))).alias("nrm")
        )
        # Materialize: the profile pipeline feeds BOTH sides of the
        # pairwise join (and the broadcast build) — without this it
        # recomputes per branch (~19s vs ~5s at sf0.1).
        .localCheckpoint(eager=True)
    )


# Shared by the exact and LSH-blocked profile-similarity oracles.
_ORACLE_PROFILE_CTES = """spine AS (
  SELECT user_id, h.hod
  FROM (SELECT DISTINCT user_id FROM events),
       (SELECT unnest(generate_series(0, 23)) AS hod) h
),
counts AS (
  SELECT user_id, CAST(hour(ts) AS INT) AS hod, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
profiles AS (
  SELECT s.user_id,
         list(CAST(COALESCE(c.cnt, 0) AS DOUBLE) ORDER BY s.hod) AS v
  FROM spine s LEFT JOIN counts c
    ON s.user_id = c.user_id AND s.hod = c.hod
  GROUP BY s.user_id
)"""


@register(
    "user_activity_similarity",
    oracle=f"""
WITH {_ORACLE_PROFILE_CTES},
scored AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         round(list_cosine_similarity(a.v, b.v), 6) AS sim
  FROM profiles a JOIN profiles b ON a.user_id <> b.user_id
)
SELECT user_a, user_b, sim, rnk FROM (
  SELECT user_a, user_b, sim,
         ROW_NUMBER() OVER (
           PARTITION BY user_a ORDER BY sim DESC, user_b ASC
         ) AS rnk
  FROM scored
)
WHERE rnk <= {_PROFILE_TOPK}
""",
    doc="EXACT time-series similarity search (EDBT'19 family): per-user "
    "24-dim hour-of-day activity profile (dense via an hour spine), "
    "pairwise cosine, top-5 most-similar users each. The all-pairs "
    "stage is O(U^2) — correct and oracle-checkable at fixture scale, "
    "but the production path at 100x users is "
    "user_activity_similarity_blocked (multi-probe LSH candidates, no "
    "all-pairs join); this exact form is its small-scale recall "
    "reference (tests/test_plans.py) and REFUSES to run past "
    "_MAX_EXACT_PROFILE_USERS users rather than silently launching a "
    "quadratic plan.",
    tags=("events", "similarity", "timeseries"),
)
def user_activity_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    profiles = _hour_profiles(spark, sf_dir)
    # GUARDRAIL (VERDICT r4 "what's wrong" #1): this is the O(U^2) exact
    # reference — deliberate at fixture scale, a cluster-killer at 100x
    # users.  Refuse loudly past the bound instead of silently launching
    # a quadratic plan; the scale path is the _blocked variant.  The
    # count is free: profiles was just eagerly checkpointed.
    n_users = profiles.count()
    if n_users > _MAX_EXACT_PROFILE_USERS:
        raise RuntimeError(
            f"user_activity_similarity is the O(U^2) exact reference and "
            f"refuses to run at {n_users} users (cap "
            f"{_MAX_EXACT_PROFILE_USERS}); use "
            "user_activity_similarity_blocked, whose LSH-blocked pair "
            "stage scales"
        )
    # The checkpointed profile table is tiny (AQE coalesces it to ~1
    # partition), but the probe side drives |U|^2 unrolled cosines —
    # spread it across the cluster or the whole pair stage runs in one
    # task (measured: single 3-4s task at sf0.1).
    a = profiles.repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        F.col("user_id").alias("user_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = profiles.select(
        F.col("user_id").alias("user_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    sim = F.round(
        F.try_divide(
            _static_dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
        ),
        6,
    )
    w = Window.partitionBy("user_a").orderBy(F.col("sim").desc(), F.col("user_b"))
    # b is UNHINTED (r11 hinted-broadcast budget): the profile frame is
    # per-user (a grower); under the _MAX_EXACT_PROFILE_USERS guard it
    # stays small in bytes, so the planner picks the broadcast
    # nested-loop on its own — the guard, not a forced hint, is what
    # bounds this deliberately-O(U^2) reference twin.
    return (
        a.crossJoin(b)
        .where(F.col("user_a") != F.col("user_b"))
        .select("user_a", "user_b", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _PROFILE_TOPK)
    )


# Bucket bits compare activity at these hours against the profile's own
# mean — a shape hash (when is this user active?) that is exact integer
# arithmetic on both engines (counts are exact doubles; sum order is
# irrelevant below 2^53).
# ADAPTIVE blocking resolution: any FIXED bucket count is load-factor-
# quadratic (candidates ~ probes * U^2 / 2^bits), which the 10x scale
# rehearsal measured directly — 1.9 s at 1.5k users -> 81 s at 15k with
# the old fixed 4-bit bucket.  Like IVF's nlist or MinHash's band
# count, the resolution must grow with the corpus: bits =
# max(4, ceil(log2(U / target_occupancy))), capped at the 24 available
# hour comparisons.  The correctness gate's fixture (sf0.01, 150
# users) resolves to 4 bits, so the static oracle below is rendered at
# the gate's resolution (same pattern as the frozen IVF index oracle);
# a drift-guard test pins that equality.
_PROFILE_TARGET_OCCUPANCY = 32
_GATE_PROFILE_BITS = 4


def _profile_bucket_bits(n_users: int) -> int:
    import math

    return max(
        4,
        min(
            24,
            math.ceil(
                math.log2(max(n_users, 1) / _PROFILE_TARGET_OCCUPANCY)
            ),
        ),
    )


def _profile_bucket_hours(bits: int) -> tuple[int, ...]:
    """``bits`` evenly-spaced distinct hours of the 24-dim profile
    (bits=4 -> (0, 6, 12, 18), the gate resolution)."""
    return tuple(sorted({(j * 24) // bits for j in range(bits)}))


_PROFILE_BUCKET_HOURS = _profile_bucket_hours(_GATE_PROFILE_BITS)
# Multi-probe masks: own bucket + every Hamming-distance-1 neighbor.
_PROFILE_PROBE_MASKS = (0, 1, 2, 4, 8)


def _oracle_profile_bucket() -> str:
    terms = [
        f"(CASE WHEN v[{h + 1}] >= list_sum(v) / 24 THEN {1 << j} ELSE 0 END)"
        for j, h in enumerate(_PROFILE_BUCKET_HOURS)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "user_activity_similarity_blocked",
    oracle=f"""
WITH {_ORACLE_PROFILE_CTES},
bucketed AS (
  SELECT user_id, v, {_oracle_profile_bucket()} AS bucket FROM profiles
),
probes AS (
  SELECT user_id, v, xor(bucket, m.m) AS probe
  FROM bucketed, (SELECT unnest({list(_PROFILE_PROBE_MASKS)}) AS m) m
),
scored AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         round(list_cosine_similarity(a.v, b.v), 6) AS sim
  FROM probes a JOIN bucketed b
    ON a.probe = b.bucket AND a.user_id <> b.user_id
)
SELECT user_a, user_b, sim, rnk FROM (
  SELECT user_a, user_b, sim,
         ROW_NUMBER() OVER (
           PARTITION BY user_a ORDER BY sim DESC, user_b ASC
         ) AS rnk
  FROM scored
)
WHERE rnk <= {_PROFILE_TOPK}
""",
    doc="SCALE path for profile similarity (VERDICT r2 #4): candidates "
    "come from a deterministic activity-shape LSH (4 sign bits of "
    "hour-activity vs the profile's own mean) with Hamming<=1 "
    "multi-probe, exact cosine verified in-bucket only — the pair stage "
    "is an EQUI-join on bucket (shuffle-hash/SMJ, no all-pairs "
    "crossJoin), so pair count scales with bucket occupancy, not U^2. "
    "The oracle applies the identical blocking, so the hash check is "
    "exact by construction; recall vs the exact all-pairs twin is "
    "data-dependent and floor-asserted in tests/test_plans.py.",
    tags=("events", "similarity", "timeseries", "lsh"),
)
def user_activity_similarity_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    profiles = _hour_profiles(spark, sf_dir)
    # Resolution scales with the user count (profiles is checkpointed,
    # so the count is free); at the gate fixture this is exactly
    # _GATE_PROFILE_BITS, which is what the static oracle renders.
    bits = _profile_bucket_bits(profiles.count())
    hours = _profile_bucket_hours(bits)
    masks = (0,) + tuple(1 << j for j in range(bits))
    mean_v = F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x) / F.lit(24.0)
    bucket = None
    for j, h in enumerate(hours):
        bit = F.when(
            F.element_at("v", h + 1) >= mean_v, F.lit(1 << j)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    bucketed = profiles.select("user_id", "v", "nrm", bucket.alias("bucket"))
    probes = bucketed.select(
        F.col("user_id").alias("user_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        F.explode(
            F.array(
                *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
            )
        ).alias("probe"),
    )
    b = bucketed.select(
        F.col("user_id").alias("user_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        F.col("bucket").alias("bucket_b"),
    )
    sim = F.round(
        F.try_divide(
            _static_dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
        ),
        6,
    )
    w = Window.partitionBy("user_a").orderBy(F.col("sim").desc(), F.col("user_b"))
    return (
        probes.join(
            b,
            (F.col("probe") == F.col("bucket_b"))
            & (F.col("user_a") != F.col("user_b")),
        )
        .select("user_a", "user_b", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _PROFILE_TOPK)
    )


@register(
    "event_funnel_ordered",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT
  (SELECT COUNT(*) FROM v) AS n_view,
  (SELECT COUNT(*) FROM c) AS n_view_click,
  (SELECT COUNT(*) FROM p) AS n_view_click_buy,
  round(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
        / NULLIF((SELECT COUNT(*) FROM v), 0), 6) AS click_through,
  round(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
        / NULLIF((SELECT COUNT(*) FROM c), 0), 6) AS buy_through
""",
    doc="ORDERED funnel (view -> later click -> later purchase): each "
    "stage requires an event strictly after the previous stage's "
    "earliest completion — the sequential-pattern shape a naive "
    "per-type count-distinct funnel (event_type_funnel) cannot "
    "express.  Three filtered min-aggregations chained by equi-joins; "
    "every stage's filter pushes to the scan and each join carries "
    "(user_id, ts) only.  Stage counts fold into one row via broadcast "
    "scalar crossJoins — no driver-side .count() round-trips.",
    tags=("events", "funnel", "join"),
)
def event_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_view_click_buy"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view",
            "n_view_click",
            "n_view_click_buy",
            F.round(
                F.try_divide(F.col("n_view_click"), F.col("n_view")), 6
            ).alias("click_through"),
            F.round(
                F.try_divide(F.col("n_view_click_buy"), F.col("n_view_click")),
                6,
            ).alias("buy_through"),
        )
    )


@register(
    "rolling_7d_active_users",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
expanded AS (
  SELECT user_id, d + CAST(o.o AS INTEGER) AS window_end
  FROM ud, (SELECT unnest(range(7)) AS o) o
)
SELECT strftime(window_end, '%Y-%m-%d') AS window_end,
       COUNT(DISTINCT user_id) AS active_users
FROM expanded
GROUP BY window_end
""",
    doc="Trailing-7-day distinct active users per day — the rolling "
    "cohort metric COUNT(DISTINCT) OVER a RANGE frame cannot express "
    "in either engine.  Formulated scale-first: dedupe to (user, day) "
    "rows (bounded by DAU x days, partial-agg combined map-side), "
    "explode each into the 7 window-ends it contributes to, one "
    "count-distinct per window end.  Shuffle volume is 7x the (user, "
    "day) relation — independent of raw event count.  Window ends "
    "with no events still report trailing actives (the honest value), "
    "including the tail past the last event day.",
    tags=("events", "window-time", "agg"),
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    expanded = ud.select(
        "user_id",
        F.explode(
            F.array(*[F.date_add(F.col("d"), o) for o in range(7)])
        ).alias("window_end"),
    )
    return (
        expanded.groupBy(
            F.date_format("window_end", "yyyy-MM-dd").alias("window_end")
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "user_retention_cohorts",
    oracle=f"""
WITH wk AS (
  SELECT user_id, date_trunc('week', ts) AS wk FROM events
),
first AS (SELECT user_id, MIN(wk) AS cohort FROM wk GROUP BY user_id)
SELECT
  strftime(first.cohort, '{_FMT_DUCK}') AS cohort_week,
  CAST(floor(date_diff('day', first.cohort, wk.wk) / 7) AS INT) AS week_offset,
  COUNT(DISTINCT wk.user_id) AS n_active
FROM wk JOIN first ON wk.user_id = first.user_id
GROUP BY 1, 2
""",
    doc="Retention cohort matrix: users grouped by first-seen week, "
    "distinct actives per (cohort, week offset) — THE standard "
    "engagement/retention analysis.  Two aggregations sharing the "
    "user_id shuffle key (Spark reuses the exchange), then a "
    "count-distinct re-keyed by (cohort, offset); no windows, no "
    "per-user state.",
    tags=("events", "agg", "retention"),
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    weeks = e.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
    first = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        weeks.join(first, "user_id")
        .groupBy(
            F.date_format("cohort", _FMT_SPARK).alias("cohort_week"),
            F.floor(F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance — merge partial states, don't rescan
# ---------------------------------------------------------------------------

_INC_SPLIT = "2024-01-21"  # "today's" delta: last ~10 days of the fixture


@register(
    "incremental_daily_agg",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users_lb,
       CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE)
         AS total_value,
       ROUND(CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_value
FROM events
GROUP BY 1
""",
    doc="Incremental materialized-aggregate maintenance: the daily event "
    "rollup is kept as MERGEABLE partial state (count, decimal sum — "
    "avg derives at read time), so absorbing a new day of data is "
    "agg(delta) unioned with the stored state and re-reduced, never a "
    "rescan of history.  The query proves the algebra: it computes the "
    "historical state (ts < 2024-01-21) and the delta state (ts >= "
    "2024-01-21) SEPARATELY, merges them by re-aggregating the partial "
    "tuples, and the oracle is the direct full recompute — hash "
    "equality IS the merge-correctness proof.  n_users_lb documents the "
    "limit of the pattern: COUNT(DISTINCT) is NOT mergeable from "
    "per-split distinct counts (days here never straddle the split, so "
    "per-day distincts pass through unharmed; a straddling group would "
    "need an HLL sketch as the state instead — user_hll_rollup is that "
    "operator).  At 100 TB this is the difference between a daily "
    "O(delta) job and a daily O(history) job.",
    tags=("events", "agg", "incremental"),
)
def incremental_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "user_id",
        "value",
    )
    split = F.lit(_INC_SPLIT).cast("date")

    def partial_state(df: DataFrame) -> DataFrame:
        # The stored representation of one maintenance epoch: everything
        # downstream must be derivable by re-reducing these columns.
        return df.groupBy("day").agg(
            F.count(F.lit(1)).alias("p_cnt"),
            F.sum(F.round("value", 6).cast("decimal(18,6)")).alias("p_sum"),
            # Per-day distinct users — mergeable here because the split
            # is BETWEEN days; see docstring for the straddling caveat.
            F.countDistinct("user_id").alias("p_users"),
        )

    hist = partial_state(e.where(F.col("day") < split))
    delta = partial_state(e.where(F.col("day") >= split))
    merged = (
        hist.unionByName(delta)
        .groupBy("day")
        .agg(
            F.sum("p_cnt").alias("n_events"),
            F.sum("p_users").alias("n_users_lb"),
            F.sum("p_sum").alias("m_sum"),
        )
    )
    return merged.select(
        "day",
        "n_events",
        "n_users_lb",
        F.col("m_sum").cast("double").alias("total_value"),
        F.round(
            F.col("m_sum").cast("double") / F.col("n_events"), 6
        ).alias("avg_value"),
    )


_BURST_Z = 2.0  # an hourly bucket is a burst when its count exceeds
# its event_type's mean by this many (exact-moment) standard deviations


@register(
    "event_burst_detection",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '{_FMT_DUCK}') AS w_start,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(SUM(CAST(n_events AS DECIMAL(18,0))) AS DOUBLE)
           / COUNT(*) AS mu,
         sqrt(CAST(SUM(CAST(n_events * n_events AS DECIMAL(28,0)))
                   AS DOUBLE) / COUNT(*)
              - (CAST(SUM(CAST(n_events AS DECIMAL(18,0))) AS DOUBLE)
                 / COUNT(*))
                * (CAST(SUM(CAST(n_events AS DECIMAL(18,0))) AS DOUBLE)
                   / COUNT(*))) AS sigma
  FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.w_start, h.n_events,
       round(CASE WHEN s.sigma > 0
                  THEN (h.n_events - s.mu) / s.sigma ELSE 0.0 END, 6)
         AS zscore
FROM hourly h JOIN stats s USING (event_type)
WHERE CASE WHEN s.sigma > 0
           THEN (h.n_events - s.mu) / s.sigma ELSE 0.0 END > {_BURST_Z}
""",
    doc="Time-series anomaly gate: hourly event-count buckets z-scored "
    "against their event_type's exact moments, emitting buckets more "
    f"than {_BURST_Z} sigma above mean — the traffic-burst / "
    "ingestion-anomaly detector an ops pipeline alerts on.  Two "
    "aggregations (hourly buckets, then per-type moments over the "
    "BUCKET rows — thousands, not events) + a broadcast join back; "
    "sigma=0 guarded on both engines (the curriculum_difficulty_phases "
    "lesson, ADVICE r7).  The streaming twin is windowed_counts_stream "
    "+ this same stateless scoring in foreachBatch.",
    tags=("events", "window-time", "profiling"),
)
def event_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type", F.window("ts", "1 hour").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type",
            F.date_format(F.col("w.start"), _FMT_SPARK).alias("w_start"),
            "n_events",
        )
    )
    n = F.count(F.lit(1))
    s1 = F.sum(F.col("n_events").cast("decimal(18,0)")).cast("double")
    s2 = F.sum(
        (F.col("n_events") * F.col("n_events")).cast("decimal(28,0)")
    ).cast("double")
    mu = s1 / n
    stats = hourly.groupBy("event_type").agg(
        mu.alias("mu"), F.sqrt(s2 / n - mu * mu).alias("sigma")
    )
    z = F.when(
        F.col("sigma") > 0,
        (F.col("n_events") - F.col("mu")) / F.col("sigma"),
    ).otherwise(F.lit(0.0))
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .where(z > _BURST_Z)
        .select(
            "event_type", "w_start", "n_events", F.round(z, 6).alias("zscore")
        )
    )


# Precomputed half-life decay weights: day-bucketed ages look up a
# PINNED literal table (rendered identically into the oracle SQL), so
# no transcendental function ever runs inside either engine — exp/pow
# are the one expression family with no cross-engine bit guarantee.
_DECAY_HALFLIFE_DAYS = 7
_DECAY_MAX_DAYS = 56  # ages past the horizon weigh 0 (8 half-lives)
_DECAY_WEIGHTS = tuple(
    round(0.5 ** (d / _DECAY_HALFLIFE_DAYS), 6)
    for d in range(_DECAY_MAX_DAYS + 1)
)


@register(
    "user_activity_decay_scores",
    oracle=f"""
WITH mx AS (SELECT MAX(ts) AS anchor FROM events),
aged AS (
  SELECT user_id,
         CAST("value" AS DOUBLE) AS v,
         CAST(date_diff('day', date_trunc('day', ts),
                        date_trunc('day', (SELECT anchor FROM mx)))
              AS INT) AS age_days
  FROM events
),
weighted AS (
  SELECT user_id,
         CASE WHEN age_days > {_DECAY_MAX_DAYS}
              THEN CAST(0 AS DECIMAL(8,6))
              ELSE ([{", ".join(str(w) for w in _DECAY_WEIGHTS)}])[age_days + 1]
         END AS w,
         CAST(v AS DECIMAL(18,2)) AS vd
  FROM aged
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(round(SUM(w * vd), 4) AS DOUBLE) AS decay_score
FROM weighted GROUP BY user_id
""",
    doc="Half-life-decayed user activity score: each event's value "
    f"weighted by 0.5^(age_days/{_DECAY_HALFLIFE_DAYS}) relative to "
    "the newest event's day, summed per user — the recency-weighted "
    "engagement feature behind retention/churn models.  The decay "
    f"curve is a PINNED {_DECAY_MAX_DAYS + 1}-entry literal table "
    "identical in both engines (day-bucketed lookup, zero beyond 8 "
    "half-lives) because exp/pow carry no cross-engine bit guarantee — "
    "the same reason the repo's cosine stays in deterministic folds.  "
    "Anchor is a 1-row broadcast max; the rest is one map-side lookup "
    "+ a per-user decimal-summed agg.",
    tags=("events", "window-time", "profiling"),
)
def user_activity_decay_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("__anchor"))
    age = F.datediff(
        F.date_trunc("day", "__anchor").cast("date"),
        F.date_trunc("day", "ts").cast("date"),
    )
    # EXACT decimal arithmetic end to end: the weight table parses from
    # strings to DECIMAL(8,6) (DuckDB's numeric literals are decimals
    # already), value is 2dp-representable, and a decimal x decimal
    # product is exact — so there is NO double rounding anywhere to
    # tie-split across engines.  (The first cut rounded w*v doubles at
    # 6dp and hit the r6-documented rounding-tie class at 10x: ~10 of
    # 86M rows landed on .xxxxx5.)
    weights = F.array(
        *[F.lit(str(w)).cast("decimal(8,6)") for w in _DECAY_WEIGHTS]
    )
    w = F.when(
        age > _DECAY_MAX_DAYS, F.lit("0").cast("decimal(8,6)")
    ).otherwise(F.element_at(weights, age + 1))
    return (
        e.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            (w * F.col("value").cast("decimal(18,2)")).alias("wv"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("wv"), 4).cast("double").alias("decay_score"),
        )
    )


_WAU_WINDOW_DAYS = 7


@register(
    "rolling_weekly_active_users",
    oracle=f"""
WITH fanned AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) + CAST(i AS INT) AS report_day,
         user_id
  FROM events, UNNEST(generate_series(0, {_WAU_WINDOW_DAYS - 1})) AS g(i)
),
bounds AS (
  SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS max_day FROM events
)
SELECT report_day,
       COUNT(DISTINCT user_id) AS active_users
FROM fanned CROSS JOIN bounds
WHERE report_day <= max_day
GROUP BY report_day
""",
    doc=f"Rolling {_WAU_WINDOW_DAYS}-day active users (WAU): distinct "
    "users whose last event is within the trailing window of each "
    "report day.  Sliding DISTINCT is the classic non-mergeable "
    "window aggregate — per-day sets can't be added — so the "
    "distributed restatement FANS each event OUT to the "
    f"{_WAU_WINDOW_DAYS} report days it supports (map-side sequence "
    "explode) and reduces to one plain per-day distinct-agg; cost is "
    "window_days x |events| narrow rows, fully mergeable, no state "
    "machine.  Leading edge truncated at the corpus's last day; "
    "early report days cover partial windows by definition.",
    tags=("events", "window-time"),
)
def rolling_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    fanned = e.select(
        F.explode(
            F.sequence(day, F.date_add(day, _WAU_WINDOW_DAYS - 1))
        ).alias("report_day"),
        "user_id",
    )
    bounds = e.agg(F.max(day).alias("__max_day"))
    return (
        fanned.crossJoin(F.broadcast(bounds))
        .where(F.col("report_day") <= F.col("__max_day"))
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "user_stickiness_dau_wau",
    oracle=f"""
WITH dau AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS report_day,
         COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
),
fanned AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) + CAST(i AS INT) AS report_day,
         user_id
  FROM events, UNNEST(generate_series(0, {_WAU_WINDOW_DAYS - 1})) AS g(i)
),
wau AS (
  SELECT report_day, COUNT(DISTINCT user_id) AS wau
  FROM fanned GROUP BY report_day
)
SELECT d.report_day, d.dau, w.wau,
       round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
FROM dau d JOIN wau w USING (report_day)
""",
    doc="DAU/WAU stickiness ratio per day — the engagement-depth metric "
    "product teams track (1.0 = every weekly user shows up daily).  "
    "Composes the per-day distinct count with the fan-out WAU "
    "(rolling_weekly_active_users' shape, restricted to days that "
    "have native activity via the inner join, so no trailing "
    "fan-out-only days appear).  Two distinct-aggs + a day-keyed "
    "join of ~|days| rows.",
    tags=("events", "window-time", "profiling"),
)
def user_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    return stickiness_report(
        e.select(day.alias("day"), "user_id")
    )


def stickiness_report(pairs: DataFrame) -> DataFrame:
    """DAU/WAU stickiness from a (day, user_id) activity frame — the
    shared algebra behind the batch query above and the streaming
    monitor (streaming/jobs.py::run_stickiness_monitor, VERDICT r8 #7).
    Input rows need not be distinct: both counts are countDistinct, so
    any frame whose DISTINCT (day, user_id) set equals the raw events'
    produces the identical report — the exactness contract that lets
    the monitor keep a distinct-pair state table (a set union is
    idempotent under batch replay) instead of batch-keyed partials."""
    dau = pairs.groupBy(F.col("day").alias("report_day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    fanned = pairs.select(
        F.explode(
            F.sequence("day", F.date_add("day", _WAU_WINDOW_DAYS - 1))
        ).alias("report_day"),
        "user_id",
    )
    wau = fanned.groupBy("report_day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return dau.join(wau, "report_day").select(
        "report_day",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


@register(
    "events_dow_seasonality",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(dayofweek(ts) AS INT) AS dow,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT CAST(SUM(CAST(n AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*)
    AS daily_mean
  FROM daily
)
SELECT d.dow,
       COUNT(*) AS n_days,
       CAST(SUM(CAST(d.n AS DECIMAL(18,0))) AS BIGINT) AS total_events,
       round((CAST(SUM(CAST(d.n AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*))
             / b.daily_mean, 6) AS seasonality_index
FROM daily d CROSS JOIN base b
GROUP BY d.dow, b.daily_mean
""",
    doc="Day-of-week seasonality index: each weekday's mean daily event "
    "count relative to the overall daily mean (1.0 = no weekly "
    "seasonality) — the multiplicative factor a capacity planner or "
    "anomaly baseline divides out before z-scoring (the companion "
    "normalization to event_burst_detection).  Two bucket-level "
    "aggregations + a 1-row broadcast mean.  Spark dayofweek is "
    "1=Sunday and DuckDB 0=Sunday, so Spark subtracts 1 (the "
    "events_dow_hour_heatmap convention).",
    tags=("events", "window-time", "profiling"),
)
def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    base = daily.agg(
        (
            F.sum(F.col("n").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__daily_mean")
    )
    return (
        daily.crossJoin(F.broadcast(base))
        .groupBy("dow", "__daily_mean")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.col("n").cast("decimal(18,0)"))
            .cast("long")
            .alias("total_events"),
        )
        .select(
            "dow",
            "n_days",
            "total_events",
            F.round(
                (F.col("total_events").cast("double") / F.col("n_days"))
                / F.col("__daily_mean"),
                6,
            ).alias("seasonality_index"),
        )
    )


@register(
    "user_growth_accretion",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
new_per_day AS (
  SELECT first_day AS report_day, COUNT(*) AS new_users
  FROM first_seen GROUP BY first_day
)
SELECT report_day, new_users,
       CAST(SUM(new_users) OVER (
         ORDER BY report_day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM new_per_day
""",
    doc="User-growth accretion curve: first-seen day per user -> new "
    "users per day -> running cumulative total.  The running sum "
    "orders |distinct days| rows (tens), not events — the global "
    "window is over a dimension-sized frame, which is the one place "
    "an unpartitioned ordered window is the RIGHT call (contrast "
    "sequence_packing_offsets, where the corpus-sized equivalent "
    "needed the two-phase decomposition).",
    tags=("events", "window-time", "profiling"),
)
def user_growth_accretion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("first_day")
    )
    per_day = first_seen.groupBy(
        F.col("first_day").alias("report_day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    w = (
        Window.orderBy("report_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_day.select(
        "report_day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


_GAP_BUCKETS = (  # (upper bound in seconds, label) — CASE-chain on both
    (60, "lt_1m"),
    (300, "lt_5m"),
    (1800, "lt_30m"),
    (7200, "lt_2h"),
    (86400, "lt_1d"),
)


@register(
    "user_gap_distribution",
    oracle=f"""
WITH gaps AS (
  SELECT CAST(date_diff('second', LAG(ts) OVER w, ts) AS BIGINT) AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
bucketed AS (
  SELECT CASE
    {" ".join(f"WHEN gap_s < {ub} THEN '{lbl}'" for ub, lbl in _GAP_BUCKETS)}
    ELSE 'ge_1d' END AS gap_bucket
  FROM gaps WHERE gap_s IS NOT NULL
)
SELECT gap_bucket,
       COUNT(*) AS n_gaps,
       round(CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM bucketed), 6) AS share
FROM bucketed GROUP BY gap_bucket
""",
    doc="Inter-event gap distribution: consecutive same-user gaps "
    "bucketed into fixed time bands (minute/hour/day scale) with "
    "corpus shares — the cadence fingerprint behind session-gap "
    "tuning (event_sessions' 30-minute threshold should sit in a "
    "histogram valley) and churn-risk features.  One user-keyed "
    "window for the lag, then a literal CASE chain (no log/float "
    "bucket math to diverge across engines) and a count-agg.",
    tags=("events", "window-time", "profiling", "session"),
)
def user_gap_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (
        F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ).cast("long")
    expr = None
    for ub, lbl in _GAP_BUCKETS:
        cond = F.col("gap_s") < ub
        expr = F.when(cond, lbl) if expr is None else expr.when(cond, lbl)
    expr = expr.otherwise("ge_1d")
    gaps = (
        e.select(gap_s.alias("gap_s"))
        .where(F.col("gap_s").isNotNull())
        .select(expr.alias("gap_bucket"))
    )
    total = gaps.agg(F.count(F.lit(1)).cast("double").alias("__t"))
    return (
        gaps.groupBy("gap_bucket")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
        .crossJoin(F.broadcast(total))
        .select(
            "gap_bucket",
            "n_gaps",
            F.round(F.col("n_gaps").cast("double") / F.col("__t"), 6).alias(
                "share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round 8 (cont.): linear interpolation over per-key daily gaps — the
# imputation sibling of last_purchase_locf (carry-forward) and
# monthly_gap_fill (zero-fill): missing interior days get the straight
# line between the surrounding observations.
# ---------------------------------------------------------------------------


@register(
    "event_value_interpolation",
    oracle="""
WITH obs AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2, 3
),
nx AS (
  SELECT user_id, event_type, d, v,
    LEAD(d) OVER (PARTITION BY user_id, event_type ORDER BY d) AS nd,
    LEAD(v) OVER (PARTITION BY user_id, event_type ORDER BY d) AS nv
  FROM obs
)
SELECT user_id, event_type, d + CAST(s.k AS INTEGER) AS day,
       CAST(nd - d AS BIGINT) AS gap_days,
       round(v + (nv - v) * s.k / (nd - d), 6) AS v_interp
FROM nx, unnest(generate_series(1, (nd - d) - 1)) s(k)
WHERE nd IS NOT NULL AND (nd - d) > 1
""",
    doc="Linear interpolation of per-(user, event_type) daily value "
    "sums across interior gaps: for every consecutive observed pair "
    "(d, v) -> (nd, nv) with nd - d > 1, emit the missing days at "
    "v + (nv - v) * k / (nd - d).  Only GAP rows are emitted, so the "
    "output is bounded by actual missingness, never |keys| x |spine| "
    "(the dense-spine trap monthly_gap_fill's 80-row month spine can "
    "afford but a per-user daily grid cannot at 100 TB).  Determinism: "
    "the endpoint values are exact DECIMAL(18,2) sums cast once to "
    "double (value is 2dp-representable, the events_time recipe), and "
    "the interpolation is a fixed IEEE sequence ((nv-v)*k)/gap + v — "
    "each op exactly rounded, identical in both engines — rounded at "
    "6dp.  Scale shape: one groupBy shuffle to the daily grain, one "
    "window shuffle per (user, type) key for LEAD, then a map-side "
    "sequence explode; no join, no spine materialization.  The "
    "size-guard on the sequence bound is load-bearing: sequence(1, 0) "
    "is DESCENDING in Spark, so gaps of 1 day are filtered before the "
    "explode, not after.",
    tags=("events", "window", "timeseries", "imputation"),
)
def event_value_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "user_id", "event_type", F.col("ts").cast("date").alias("d")
    ).agg(dec_sum("value").alias("v"))
    w = Window.partitionBy("user_id", "event_type").orderBy("d")
    nx = obs.select(
        "user_id",
        "event_type",
        "d",
        "v",
        F.lead("d").over(w).alias("nd"),
        F.lead("v").over(w).alias("nv"),
    )
    gap = F.datediff("nd", "d")
    return (
        nx.where(F.col("nd").isNotNull() & (gap > 1))
        .select(
            "user_id",
            "event_type",
            "d",
            "v",
            "nv",
            gap.cast("long").alias("gap_days"),
            F.explode(F.sequence(F.lit(1), gap - 1)).alias("k"),
        )
        .select(
            "user_id",
            "event_type",
            F.date_add("d", F.col("k")).alias("day"),
            "gap_days",
            F.round(
                F.col("v")
                + (F.col("nv") - F.col("v")) * F.col("k") / F.col("gap_days"),
                6,
            ).alias("v_interp"),
        )
    )


# ---------------------------------------------------------------------------
# Round 8 (cont.): first-order Markov transition matrix over per-user
# event streams — clickstream sequence analytics.
# ---------------------------------------------------------------------------


@register(
    "event_markov_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
    LEAD(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS next_type
  FROM events
),
t AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
),
fm AS (SELECT from_type, SUM(n) AS n_from FROM t GROUP BY 1),
tm AS (SELECT to_type, SUM(n) AS n_to FROM t GROUP BY 1),
tot AS (SELECT SUM(n) AS n_all FROM t)
SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
  round(CAST(t.n AS DOUBLE) / fm.n_from, 6) AS p_transition,
  round(CAST(tm.n_to AS DOUBLE) / tot.n_all, 6) AS p_to_marginal,
  round(CAST(t.n AS DOUBLE) * tot.n_all / (fm.n_from * tm.n_to), 6) AS lift
FROM t JOIN fm ON fm.from_type = t.from_type
       JOIN tm ON tm.to_type = t.to_type, tot
""",
    doc="First-order Markov transition matrix over per-user event "
    "streams: maximum-likelihood P(to | from) for every event-type "
    "pair, beside the stationary marginal P(to) and the lift ratio — "
    "lift far from 1 is the sequence-dependence signal (which "
    "transitions happen because of ORDER, not base rates) that feeds "
    "funnel design and next-event models; the sequence sibling of "
    "lang_source_mutual_information's static association.  Successor "
    "pairs come from one LEAD window per user with a TOTAL order "
    "(ts, event_id) so timestamp collisions cannot reorder across "
    "engines.  Determinism: counts and marginals are exact BIGINTs "
    "re-aggregated FROM the transition frame itself (never a second "
    "corpus pass, and exactly consistent with it); each probability "
    "is one double division rounded at 6dp.  Scale shape: one window "
    "shuffle keyed by user (bounded per-user state), one "
    "map-side-combined count shuffle to |types|^2 rows; everything "
    "after is metadata-sized joins on the tiny matrix.",
    tags=("events", "window", "stats", "sequence"),
)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    t = (
        s.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fm = t.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    tm = t.groupBy("to_type").agg(F.sum("n").alias("n_to"))
    tot = t.agg(F.sum("n").alias("n_all"))
    nd = F.col("n").cast("double")
    return (
        t.join(fm, "from_type")
        .join(tm, "to_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(nd / F.col("n_from"), 6).alias("p_transition"),
            F.round(F.col("n_to").cast("double") / F.col("n_all"), 6).alias(
                "p_to_marginal"
            ),
            F.round(
                nd * F.col("n_all") / (F.col("n_from") * F.col("n_to")), 6
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Round 8 (cont.): CUSUM change-point detection over daily value series.
# ---------------------------------------------------------------------------


def cusum_report(d: DataFrame) -> DataFrame:
    """argmax-|CUSUM| report from a (event_type, day, v DECIMAL(38,2))
    daily frame — the algebra of event_value_changepoint, factored so
    the streaming monitor derives the identical report from its
    incrementally-maintained daily table."""
    from pyspark.sql import Window

    t = d.groupBy("event_type").agg(
        F.sum("v").cast("double").alias("s"), F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    r = d.join(t, "event_type").select(
        "event_type",
        "day",
        F.row_number().over(w).alias("i"),
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        "s",
        "n",
    )
    c = r.withColumn(
        "abs_cusum",
        F.round(
            F.abs(
                F.col("cum").cast("double")
                - F.col("i") * (F.col("s") / F.col("n"))
            ),
            6,
        ),
    )
    w_max = Window.partitionBy("event_type").orderBy(
        F.col("abs_cusum").desc(), F.col("day")
    )
    return (
        c.withColumn("rn", F.row_number().over(w_max))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.col("n").alias("n_days"),
            F.round(F.col("s") / F.col("n"), 6).alias("mean_daily"),
            F.col("abs_cusum").alias("max_abs_cusum"),
            F.round(F.col("cum").cast("double") / F.col("i"), 6).alias(
                "mean_before"
            ),
            F.round(
                (F.col("s") - F.col("cum").cast("double"))
                / F.nullif((F.col("n") - F.col("i")).cast("long"), F.lit(0)),
                6,
            ).alias("mean_after"),
        )
    )


@register(
    "event_value_changepoint",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT event_type, CAST(SUM(v) AS DOUBLE) AS s, COUNT(*) AS n
  FROM d GROUP BY 1
),
r AS (
  SELECT d.event_type, d.day,
    ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day) AS i,
    SUM(d.v) OVER (PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    t.s, t.n
  FROM d JOIN t ON t.event_type = d.event_type
),
c AS (
  SELECT event_type, day, i, cum, s, n,
    round(abs(CAST(cum AS DOUBLE) - i * (s / n)), 6) AS abs_cusum
  FROM r
)
SELECT event_type, day AS change_day, CAST(n AS BIGINT) AS n_days,
  round(s / n, 6) AS mean_daily, abs_cusum AS max_abs_cusum,
  round(CAST(cum AS DOUBLE) / i, 6) AS mean_before,
  round((s - CAST(cum AS DOUBLE)) / NULLIF(n - i, 0), 6) AS mean_after
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY abs_cusum DESC, day) AS rn
  FROM c
) WHERE rn = 1
""",
    doc="CUSUM change-point detection (Page 1954 / Taylor's cumulative-"
    "sum charting) over each event type's daily value series: the "
    "candidate change day is argmax |CUSUM_d|, where CUSUM_d = "
    "cum_d - d*mean is the cumulative deviation from the global mean; "
    "the report carries the split means so the consumer reads the "
    "level shift directly.  The FP trap here is the RUNNING sum: "
    "engines accumulate windowed DOUBLE sums in different orders "
    "(DuckDB's segment tree vs a sequential fold), so the cumulative "
    "is kept an EXACT DECIMAL — order-invariant — and the mean enters "
    "once per row as the algebraic identity cum - i*mean (one "
    "subtraction, no FP accumulation at all); the argmax orders on "
    "the ROUNDED |CUSUM| with an earliest-day tie-break.  Scale "
    "shape: one groupBy to the daily grain, per-type windows over "
    "|days| rows (metadata-sized at any corpus scale), argmax as a "
    "rank-1 filter.  Fixed-budget semantics like the 5-round "
    "PageRank: one candidate per series; recursing into the halves "
    "(binary segmentation) would re-run the same frame per segment.",
    tags=("events", "window", "timeseries", "stats"),
)
def event_value_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    return cusum_report(d)


@register(
    "events_seasonal_anomaly",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(dayofweek(ts) AS INT) AS dow,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT dow,
         CAST(SUM(CAST(n AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*)
           AS baseline
  FROM daily GROUP BY 1
),
rt AS (
  SELECT day, d.dow, n, b.baseline,
         CAST(n AS DOUBLE) / b.baseline AS r
  FROM daily d JOIN base b ON b.dow = d.dow
),
st AS (
  SELECT CAST(SUM(CAST(round(r, 8) AS DECIMAL(28,8))) AS DOUBLE)
           / COUNT(*) AS mu,
         sqrt(CAST(SUM(CAST(round(r * r, 8) AS DECIMAL(28,8))) AS DOUBLE)
                / COUNT(*)
              - (CAST(SUM(CAST(round(r, 8) AS DECIMAL(28,8))) AS DOUBLE)
                   / COUNT(*))
                * (CAST(SUM(CAST(round(r, 8) AS DECIMAL(28,8))) AS DOUBLE)
                   / COUNT(*))) AS sd
  FROM rt
)
SELECT day, dow, n AS n_events,
       round(baseline, 4) AS dow_baseline,
       round(r, 6) AS ratio,
       round(CASE WHEN st.sd > 0 THEN (r - st.mu) / st.sd ELSE 0.0 END, 6)
         + 0.0 AS z,
       CASE WHEN st.sd > 0 THEN abs((r - st.mu) / st.sd) > 2
            ELSE FALSE END AS is_anomaly
FROM rt CROSS JOIN st
ORDER BY day, dow
""",
    doc="Seasonally-adjusted daily anomaly detection: each day's event "
    "count divided by its day-of-week baseline (the "
    "events_dow_seasonality factor), the adjusted ratios z-scored "
    "against exact corpus moments, |z| > 2 flagged — the ops-monitor "
    "view that does not page on every weekend dip, and the batch twin "
    "of what run_changepoint_monitor watches in flight.  Determinism: "
    "ratios are identical-order double divisions of exact ints; "
    "moments sum 8dp-ROUNDED ratio terms as DECIMAL (partition-order "
    "invariant, O(1) magnitudes at any event volume since the ratio "
    "normalizes scale out); sigma = 0 degenerates to z = 0 on both "
    "engines (the curriculum guard).  Spark dayofweek is 1=Sunday, "
    "DuckDB 0=Sunday, so Spark subtracts 1 (the heatmap convention).  "
    "Scale shape: one (day, dow) collapse of the event stream, then a "
    "7-row baseline join and a 1-row moments broadcast over the "
    "~30-row daily frame.",
    tags=("events", "timeseries", "profiling"),
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return seasonal_anomaly_report(daily)


def seasonal_anomaly_report(daily: DataFrame) -> DataFrame:
    """The dow-adjusted anomaly report over a (day, dow, n) frame —
    shared verbatim by the batch query above and the streaming monitor
    (streaming/jobs.py::run_seasonal_anomaly_monitor), so their parity
    holds by construction."""
    base = daily.groupBy("dow").agg(
        (
            F.sum(F.col("n").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("baseline")
    )
    rt = daily.join(F.broadcast(base), "dow").select(
        "day",
        "dow",
        "n",
        "baseline",
        (F.col("n").cast("double") / F.col("baseline")).alias("r"),
    )
    nr = F.count(F.lit(1))
    s1 = F.sum(F.round(F.col("r"), 8).cast("decimal(28,8)")).cast("double")
    s2 = F.sum(
        F.round(F.col("r") * F.col("r"), 8).cast("decimal(28,8)")
    ).cast("double")
    mu = s1 / nr
    st = rt.agg(mu.alias("mu"), F.sqrt(s2 / nr - mu * mu).alias("sd"))
    zc = F.when(
        F.col("sd") > 0, (F.col("r") - F.col("mu")) / F.col("sd")
    ).otherwise(F.lit(0.0))
    return (
        rt.crossJoin(F.broadcast(st))
        .select(
            "day",
            "dow",
            F.col("n").alias("n_events"),
            F.round(F.col("baseline"), 4).alias("dow_baseline"),
            F.round(F.col("r"), 6).alias("ratio"),
            (F.round(zc, 6) + F.lit(0.0)).alias("z"),
            F.when(F.col("sd") > 0, F.abs(zc) > 2)
            .otherwise(F.lit(False))
            .alias("is_anomaly"),
        )
        .orderBy("day", "dow")
    )


@register(
    "user_activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                    AS INT) AS anchor
  FROM days
),
streaks AS (
  SELECT user_id, COUNT(*) AS len FROM isl GROUP BY user_id, anchor
),
best AS (
  SELECT user_id, MAX(len) AS best_streak FROM streaks GROUP BY user_id
)
SELECT CAST(best_streak AS BIGINT) AS streak_days,
       COUNT(*) AS n_users
FROM best
GROUP BY 1
ORDER BY 1
""",
    doc="Longest consecutive-active-day streak per user, reported as the "
    "streak-length distribution (how many users sustain 1, 2, ... "
    "consecutive days) — the engagement-habit metric behind streak "
    "mechanics and the islands twin of user_gap_distribution's gaps "
    "view.  Classic gaps-and-islands: distinct active days, island "
    "anchor = day - row_number (consecutive days share an anchor), "
    "count per island, max per user.  Entirely integer/date "
    "arithmetic — zero float.  Scale shape: one distinct collapse to "
    "(user, day), one user-keyed window, two bounded aggregations; "
    "nothing bigger than the user-day frame ever shuffles.",
    tags=("events", "window", "sessionization"),
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id",
        F.date_sub(
            F.col("day"), F.row_number().over(w)
        ).alias("anchor"),
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    best = streaks.groupBy("user_id").agg(
        F.max("len").alias("best_streak")
    )
    return (
        best.groupBy(
            F.col("best_streak").cast("long").alias("streak_days")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("streak_days")
    )


@register(
    "conversion_delay_percentiles",
    oracle="""
WITH fv AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
),
conv AS (
  SELECT fv.user_id,
         (CAST(epoch(MIN(e.ts)) AS BIGINT)
          - CAST(epoch(fv.v_ts) AS BIGINT)) // 60 AS delay_min
  FROM fv JOIN events e
    ON e.user_id = fv.user_id
   AND e.event_type = 'purchase' AND e.ts >= fv.v_ts
  GROUP BY fv.user_id, fv.v_ts
),
h AS (SELECT delay_min, COUNT(*) AS c FROM conv GROUP BY 1),
cum AS (
  SELECT delay_min, c,
         SUM(c) OVER (ORDER BY delay_min
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
         SUM(c) OVER () AS n
  FROM h
),
nv AS (SELECT COUNT(*) AS n_viewers FROM fv)
SELECT CAST(nv.n_viewers AS BIGINT) AS n_viewers,
       CAST(MAX(cum.n) AS BIGINT) AS n_converters,
       round(CAST(MAX(cum.n) AS DOUBLE) / nv.n_viewers, 6)
         AS conversion_rate,
       MIN(CASE WHEN cc >= (n + 1) // 2 THEN delay_min END) AS p50_min,
       MIN(CASE WHEN cc >= (9 * n + 9) // 10 THEN delay_min END) AS p90_min,
       MIN(CASE WHEN cc >= (99 * n + 99) // 100 THEN delay_min END)
         AS p99_min
FROM cum CROSS JOIN nv
GROUP BY nv.n_viewers
""",
    doc="View-to-purchase conversion delay percentiles: each user's "
    "first view, their first purchase at-or-after it, the delay in "
    "whole minutes — exact p50/p90/p99 via integer ceil-rank selection "
    "((q*n+q) DIV d, the ship_delay_percentiles recipe) over the "
    "minute-domain histogram, plus the conversion rate — the funnel "
    "LATENCY readout that event_funnel_ordered's pure ordering check "
    "lacks.  Integer epoch arithmetic throughout; one rounded rate is "
    "the only double.  Scale shape: per-user first-view aggregation, "
    "one semi-join-shaped purchase match, collapse to the bounded "
    "delay-minute grid, windows on that.",
    tags=("events", "window", "mining"),
)
def conversion_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    fv = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        fv.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("v_ts")),
        )
        .groupBy("user_id", "v_ts")
        .agg(
            (
                (
                    F.unix_timestamp(F.min("p_ts"))
                    - F.unix_timestamp(F.col("v_ts"))
                )
                / F.lit(60)
            )
            .cast("long")
            .alias("delay_min")
        )
    )
    h = conv.groupBy("delay_min").agg(F.count(F.lit(1)).alias("c"))
    # The delay-minute grid spans the dataset's whole time range in
    # minutes (~500k minutes/year of traffic) — two-phase prefix sum,
    # not a global-ORDER BY window; the converter total falls out of
    # the same per-partition collect.
    from mapreducer_spark.functions.agg import global_running_sum_with_total

    cum, n_conv = global_running_sum_with_total(
        h, ["delay_min"], "c", out_name="cc"
    )
    cum = cum.withColumn("n", F.lit(int(n_conv)).cast("long"))
    nv = fv.agg(F.count(F.lit(1)).alias("n_viewers"))
    pick = lambda num, den: F.min(  # noqa: E731
        F.when(
            F.col("cc") >= F.expr(f"({num} * n + {num}) DIV {den}"),
            F.col("delay_min"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(nv))
        .groupBy("n_viewers")
        .agg(
            F.max("n").cast("long").alias("n_converters"),
            F.round(
                F.max("n").cast("double") / F.col("n_viewers"), 6
            ).alias("conversion_rate"),
            F.min(
                F.when(
                    F.col("cc") >= F.expr("(n + 1) DIV 2"),
                    F.col("delay_min"),
                )
            ).alias("p50_min"),
            pick(9, 10).alias("p90_min"),
            pick(99, 100).alias("p99_min"),
        )
        .select(
            F.col("n_viewers").cast("long").alias("n_viewers"),
            "n_converters",
            "conversion_rate",
            "p50_min",
            "p90_min",
            "p99_min",
        )
    )


@register(
    "user_lifecycle_states",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
),
seq AS (
  SELECT user_id, wk,
         LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
  FROM uw
),
states AS (
  SELECT wk,
         CASE WHEN prev_wk IS NULL THEN 'new'
              WHEN date_diff('day', prev_wk, wk) = 7 THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM seq
),
active AS (SELECT wk, COUNT(*) AS n_active FROM states GROUP BY 1),
counts AS (
  SELECT wk, state, COUNT(*) AS n_users FROM states GROUP BY 1, 2
),
churn AS (
  SELECT CAST(a.wk + 7 AS DATE) AS wk,
         a.n_active
           - COALESCE((SELECT n_users FROM counts c
                       WHERE c.wk = CAST(a.wk + 7 AS DATE)
                         AND c.state = 'retained'), 0) AS n_users
  FROM active a
  WHERE EXISTS (SELECT 1 FROM active x WHERE x.wk = CAST(a.wk + 7 AS DATE))
)
SELECT wk AS week, state, CAST(n_users AS BIGINT) AS n_users
FROM (
  SELECT wk, state, n_users FROM counts
  UNION ALL
  SELECT wk, 'churned', n_users FROM churn
)
ORDER BY week, state
""",
    doc="Weekly growth-accounting lifecycle states (the Social-Capital "
    "accounting identity): each active user-week is 'new' (first week "
    "ever), 'retained' (active the immediately previous week), or "
    "'resurrected' (returning after a gap); 'churned' at week W is "
    "last week's actives minus this week's retained — so "
    "active(W) - active(W-1) = new + resurrected - churned by "
    "construction, the decomposition growth teams actually reconcile "
    "(new_vs_returning_revenue is its revenue shadow; "
    "user_stickiness_dau_wau its intensity gauge).  Weeks via "
    "date_trunc so both engines bucket identically; churn weeks "
    "restricted to weeks that exist in the data.  Pure integer/date "
    "arithmetic.  Scale shape: one distinct collapse to user-weeks, "
    "one user-keyed lag window, dimension-sized week-level frames "
    "after.",
    tags=("events", "window", "mining"),
)
def user_lifecycle_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    seq = uw.withColumn("prev_wk", F.lag("wk").over(w))
    states = seq.select(
        "wk",
        F.when(F.col("prev_wk").isNull(), "new")
        .when(F.datediff("wk", "prev_wk") == 7, "retained")
        .otherwise("resurrected")
        .alias("state"),
    )
    states = states.localCheckpoint(eager=True)
    counts = states.groupBy("wk", "state").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    active = states.groupBy("wk").agg(F.count(F.lit(1)).alias("n_active"))
    nxt = active.select(
        F.date_add("wk", 7).alias("wk"), F.col("n_active").alias("prev_active")
    )
    retained = counts.where(F.col("state") == "retained").select(
        "wk", F.col("n_users").alias("n_retained")
    )
    week_exists = active.select("wk")
    churn = (
        nxt.join(week_exists, "wk")
        .join(retained, "wk", "left")
        .select(
            "wk",
            F.lit("churned").alias("state"),
            (
                F.col("prev_active")
                - F.coalesce(F.col("n_retained"), F.lit(0))
            )
            .cast("long")
            .alias("n_users"),
        )
    )
    return (
        counts.select("wk", "state", F.col("n_users").cast("long").alias("n_users"))
        .unionAll(churn)
        .select(F.col("wk").alias("week"), "state", "n_users")
        .orderBy("week", "state")
    )


_ATTR_WINDOW_DAYS = 7


@register(
    "multitouch_attribution",
    oracle=f"""
WITH purch AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts,
         CAST("value" AS DECIMAL(18,2)) AS amount
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT event_id, user_id, event_type, ts
  FROM events WHERE event_type IN ('view', 'click')
),
matched AS (
  SELECT p.p_id, p.amount, t.event_type,
         COUNT(*) OVER (PARTITION BY p.p_id) AS n_touches
  FROM purch p JOIN touch t
    ON t.user_id = p.user_id
   AND t.ts <= p.p_ts
   AND t.ts > p.p_ts - INTERVAL '{_ATTR_WINDOW_DAYS} days'
),
credited AS (
  SELECT event_type,
         CAST(round(CAST(amount AS DOUBLE) / n_touches, 6)
              AS DECIMAL(28,6)) AS credit,
         p_id, n_touches
  FROM matched
)
SELECT event_type AS channel,
       COUNT(*) AS n_touches_credited,
       CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases_touched,
       round(CAST(SUM(credit) AS DOUBLE), 2) AS attributed_revenue
FROM credited
GROUP BY event_type
ORDER BY channel
""",
    doc="Linear multi-touch attribution: each purchase's value is split "
    f"equally across the user's view/click touches in the "
    f"{_ATTR_WINDOW_DAYS} days before it — the marketing-analytics "
    "counterpart of purchase_attribution_asof's last-touch rule "
    "(last-touch over-credits the final click; linear is the standard "
    "first alternative) and conversion_delay_percentiles' latency "
    "view.  Determinism: per-touch credit = amount/n_touches rounds "
    "at 6dp into DECIMAL sums (partition-order invariant); the touch "
    "count per purchase is a window over exact matches.  Scale "
    "shape: the touch join is user-keyed with a bounded time-range "
    "predicate (per-user event counts are bounded, the "
    "concurrent_orders argument), one channel-level readout.",
    tags=("events", "join", "window-time", "mining"),
)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    purch = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast("decimal(18,2)").alias("amount"),
    )
    touch = e.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_type"), F.col("ts")
    )
    matched = purch.join(
        touch,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("ts") <= F.col("p_ts"))
        & (
            F.col("ts")
            > F.col("p_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS")
        ),
    ).withColumn(
        "n_touches", F.count(F.lit(1)).over(Window.partitionBy("p_id"))
    )
    credited = matched.select(
        "event_type",
        "p_id",
        F.round(
            F.col("amount").cast("double") / F.col("n_touches"), 6
        )
        .cast("decimal(28,6)")
        .alias("credit"),
    )
    return (
        credited.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_touches_credited"),
            F.countDistinct("p_id").cast("long").alias(
                "n_purchases_touched"
            ),
            F.round(F.sum("credit").cast("double"), 2).alias(
                "attributed_revenue"
            ),
        )
        .orderBy("channel")
    )


@register(
    "event_count_overdispersion",
    oracle="""
WITH uc AS (
  SELECT event_type, user_id, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         COUNT(*) AS n_users,
         CAST(SUM(CAST(c AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*) AS mu,
         CAST(SUM(CAST(c * c AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*)
           - (CAST(SUM(CAST(c AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*))
             * (CAST(SUM(CAST(c AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*))
           AS var
  FROM uc GROUP BY 1
)
SELECT event_type,
       CAST(n_users AS BIGINT) AS n_users,
       round(mu, 6) AS mean_per_user,
       round(var, 6) AS variance,
       round(var / mu, 6) AS dispersion_index,
       var / mu > 1.5 AS overdispersed
FROM m
ORDER BY event_type
""",
    doc="Overdispersion check of per-user event counts by type: the "
    "variance-to-mean dispersion index (=1 under Poisson arrivals; "
    ">1 means heavy users dominate) — the distributional assumption "
    "gate behind event_burst_detection's z-thresholds and the "
    "capacity planner's choice between Poisson and negative-binomial "
    "sizing, and the formal statement of the skew that "
    "join_key_skew_profile detects per key.  Exact integer moments "
    "(counts and squared counts in DECIMAL) folded identically in "
    "double, rounded once; the verdict compares identical doubles to "
    "a 1.5 literal.  Scale shape: one (type, user) collapse, one "
    "5-row moments aggregation.",
    tags=("events", "agg", "profiling"),
)
def event_count_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uc = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = F.count(F.lit(1))
    s1 = F.sum(F.col("c").cast("decimal(18,0)")).cast("double")
    s2 = F.sum((F.col("c") * F.col("c")).cast("decimal(28,0)")).cast(
        "double"
    )
    mu = s1 / n
    var = s2 / n - mu * mu
    return (
        uc.groupBy("event_type")
        .agg(
            n.cast("long").alias("n_users"),
            F.round(mu, 6).alias("mean_per_user"),
            F.round(var, 6).alias("variance"),
            F.round(var / mu, 6).alias("dispersion_index"),
            (var / mu > 1.5).alias("overdispersed"),
        )
        .orderBy("event_type")
    )


@register(
    "event_type_user_overlap",
    oracle="""
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
),
sizes AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_both
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT pairs.type_a, pairs.type_b,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(pairs.n_both AS BIGINT) AS n_both,
       round(CAST(pairs.n_both AS DOUBLE)
             / (sa.n + sb.n - pairs.n_both), 6) AS jaccard,
       round(CAST(pairs.n_both AS DOUBLE)
             / least(sa.n, sb.n), 6) AS containment
FROM pairs
JOIN sizes sa ON sa.event_type = pairs.type_a
JOIN sizes sb ON sb.event_type = pairs.type_b
ORDER BY type_a, type_b
""",
    doc="Audience overlap between event types: exact user-set Jaccard "
    "and containment for every type pair — 'do clickers also "
    "purchase?' as set arithmetic, the EXACT ground truth the "
    "kmv_set_operations sketch estimates (read together they close "
    "the estimate-vs-exact loop the way minhash_estimator_error does "
    "for MinHash), and the audience view behind "
    "event_markov_transitions' flow view.  Pure integer counting to "
    "two rounded divisions; the pair join is keyed on user_id with "
    "per-user type sets bounded by the 5-type domain.  Scale shape: "
    "one distinct collapse to (type, user), a user-keyed self-join "
    "with m^2-per-key on m <= 5, a 10-row readout.",
    tags=("events", "join", "profiling"),
)
def event_type_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    tu = e.select("event_type", "user_id").distinct()
    tu = tu.localCheckpoint(eager=True)
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    pairs = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("n_both").cast("double")
                / F.least("n_a", "n_b"),
                6,
            ).alias("containment"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "retention_decay_fit",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
),
first AS (SELECT user_id, MIN(wk) AS cohort FROM uw GROUP BY 1),
mx AS (SELECT MAX(wk) AS max_wk FROM uw),
cells AS (
  SELECT first.cohort,
         CAST(date_diff('day', first.cohort, uw.wk) // 7 AS INT) AS k,
         COUNT(DISTINCT uw.user_id) AS n_active
  FROM uw JOIN first ON first.user_id = uw.user_id
  GROUP BY 1, 2
),
sizes AS (SELECT cohort, n_active AS size FROM cells WHERE k = 0),
rates AS (
  SELECT cells.k,
         CAST(SUM(cells.n_active) AS DOUBLE)
           / SUM(sizes.size) AS rate
  FROM cells
  JOIN sizes ON sizes.cohort = cells.cohort
  CROSS JOIN mx
  WHERE cells.k >= 1
    AND date_diff('day', cells.cohort, mx.max_wk) // 7 >= cells.k
  GROUP BY cells.k
),
pts AS (
  SELECT k, round(ln(rate), 8) AS y FROM rates WHERE rate > 0
),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(k AS DECIMAL(18,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(k * y, 8) AS DECIMAL(28,8))) AS DOUBLE)
           AS sxy,
         CAST(SUM(CAST(k * k AS DECIMAL(28,0))) AS DOUBLE) AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_points,
       round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
         AS log_retention_slope,
       round(1.0 - exp((sxy - sx * sy / n) / (sxx - sx * sx / n)), 6)
         AS implied_weekly_churn,
       round(-0.6931471805599453
             / ((sxy - sx * sy / n) / (sxx - sx * sx / n)), 6)
         AS half_life_weeks
FROM m
WHERE n >= 2 AND sxx * n <> sx * sx AND sxy * n <> sx * sy
""",
    doc="Exponential retention-decay fit: pooled cohort retention rate "
    "at each week offset (RIGHT-CENSORING corrected — a cohort only "
    "enters the offset-k denominator if k weeks are observable for "
    "it, the mistake that makes naive retention curves look like "
    "they improve near the data edge), then log-linear OLS over the "
    "offsets: slope = weekly log-retention, giving implied weekly "
    "churn and the half-life in weeks — the single-parameter summary "
    "of user_retention_cohorts' full triangle, and the growth-side "
    "analogue of customer_survival_curve (events vs orders, "
    "exponential fit vs nonparametric KM).  Determinism: rates are "
    "identical-order divisions of exact distinct counts; ln rounds "
    "at 8dp; OLS moments are tiny decimal sums; ln(2) is a literal.  "
    "Scale shape: one distinct collapse, one cohort-offset "
    "aggregation, the fit on a handful of offsets.",
    tags=("events", "timeseries", "mining"),
)
def retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    uw = uw.localCheckpoint(eager=True)
    first = uw.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    mx = uw.agg(F.max("wk").alias("max_wk"))
    cells = (
        uw.join(first, "user_id")
        .groupBy(
            "cohort",
            (F.datediff("wk", "cohort") / 7).cast("int").alias("k"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    cells = cells.localCheckpoint(eager=True)
    sizes = cells.where(F.col("k") == 0).select(
        "cohort", F.col("n_active").alias("size")
    )
    rates = (
        cells.where(F.col("k") >= 1)
        .join(sizes, "cohort")
        .crossJoin(F.broadcast(mx))
        .where(
            (F.datediff("max_wk", "cohort") / 7).cast("int")
            >= F.col("k")
        )
        .groupBy("k")
        .agg(
            (
                F.sum("n_active").cast("double") / F.sum("size")
            ).alias("rate")
        )
    )
    pts = rates.where(F.col("rate") > 0).select(
        "k", F.round(F.log("rate"), 8).alias("y")
    )
    n = F.count(F.lit(1))
    m = pts.agg(
        n.alias("n"),
        F.sum(F.col("k").cast("decimal(18,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,8)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("k") * F.col("y"), 8).cast("decimal(28,8)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("k") * F.col("k")).cast("decimal(28,0)"))
        .cast("double")
        .alias("sxx"),
    )
    nn = F.col("n")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / nn) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / nn
    )
    # Degenerate fixture guard (both engines): <2 points or zero OLS
    # variance means no fit exists — emit zero rows instead of an ANSI
    # divide-by-zero (hit at sf0.001 where only offset k=1 survives the
    # censoring filter).  The WHERE runs before the projection, so the
    # slope expression never evaluates on the degenerate row.
    return (
        m.where(
            (nn >= 2)
            & (F.col("sxx") * nn != F.col("sx") * F.col("sx"))
            # A perfectly flat fit (zero slope numerator) has no decay
            # to report and would divide the half-life by zero.
            & (F.col("sxy") * nn != F.col("sx") * F.col("sy"))
        )
        .select(
            nn.cast("long").alias("n_points"),
            F.round(slope, 6).alias("log_retention_slope"),
            F.round(F.lit(1.0) - F.exp(slope), 6).alias(
                "implied_weekly_churn"
            ),
            F.round(F.lit(-0.6931471805599453) / slope, 6).alias(
                "half_life_weeks"
            ),
        )
    )
