"""Mergeable sketch operators — fixed-size summaries that survive 100 TB.

Spark already ships HLL (approx_count_distinct, exercised by
approx_distinct_users / user_hll_rollup) and GK quantiles
(approx_price_quantiles); this module adds the classic COUNT-MIN SKETCH
(Cormode & Muthukrishnan 2005) built entirely from DataFrame
aggregations, because CMS is the sketch a streaming/batch heavy-hitter
pipeline actually deploys: a d x w grid of counters that is

- one groupBy to build (map-side partial sums combine per cell),
- O(d*w) to store regardless of input size (here 4 x 64 = 256 cells),
- mergeable across partitions/days by cell-wise addition, and
- queryable with est(x) = min_j grid[j][h_j(x)] — never undercounts.

The query deliberately sizes w=64 BELOW the 150-user key cardinality so
collisions actually happen and the one-sided overcount guarantee is
visible in the output (est_cnt >= exact_cnt, checked per row by the
oracle).  Hashes are the cross-engine md5_int64 so the DuckDB oracle
reproduces the grid bit-for-bit — a production deployment would swap in
xxhash64 seeds exactly like the LSH path (dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducer_spark.functions.hashes import md5_int64, oracle_md5_int64
from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table

_CMS_D = 4  # hash rows
_CMS_W = 64  # counters per row (< 150 distinct users -> real collisions)
_CMS_TOPN = 20


def cms_cell_col():
    """The (j, user_id) -> cell hash, shared by the batch sketch, the
    probe side, and the Structured Streaming twin (streaming/jobs.py) —
    one definition so batch and stream can never drift."""
    return (
        md5_int64(
            F.concat_ws(
                ":", F.col("j").cast("string"), F.col("user_id").cast("string")
            )
        )
        % _CMS_W
    )


def cms_cells(ev: DataFrame) -> DataFrame:
    """CMS counter grid over a (possibly streaming) user_id frame: one
    wide-out crossJoin (d=4 rows) then ONE groupBy whose output is the
    constant-size grid.  Works unchanged as a streaming aggregation
    (complete mode) because it is a plain groupBy-count."""
    rows_j = ev.sparkSession.range(_CMS_D).select(
        F.col("id").cast("int").alias("j")
    )
    return (
        ev.crossJoin(F.broadcast(rows_j))
        .select("j", cms_cell_col().alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )



@register(
    "cms_heavy_hitters",
    oracle=f"""
WITH rows_j AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j),
cells AS (
  SELECT r.j,
         {oracle_md5_int64("CAST(r.j AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)")}
           % {_CMS_W} AS cell,
         COUNT(*) AS cnt
  FROM events e CROSS JOIN rows_j r
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
),
probes AS (
  SELECT x.user_id, r.j,
         {oracle_md5_int64("CAST(r.j AS VARCHAR) || ':' || CAST(x.user_id AS VARCHAR)")}
           % {_CMS_W} AS cell
  FROM exact x CROSS JOIN rows_j r
),
est AS (
  SELECT p.user_id, CAST(MIN(c.cnt) AS BIGINT) AS est_cnt
  FROM probes p JOIN cells c ON p.j = c.j AND p.cell = c.cell
  GROUP BY p.user_id
)
SELECT user_id, exact_cnt, est_cnt,
       est_cnt - exact_cnt AS overcount,
       est_cnt >= exact_cnt AS never_undercounts
FROM (
  SELECT x.user_id, x.exact_cnt, e.est_cnt,
         ROW_NUMBER() OVER (ORDER BY e.est_cnt DESC, x.user_id) AS rn
  FROM exact x JOIN est e ON x.user_id = e.user_id
)
WHERE rn <= {_CMS_TOPN}
""",
    doc="Count-min-sketch heavy hitters over event traffic: build a "
    "4 x 64 CMS grid of the user_id frequency stream with ONE groupBy "
    "(256 cells total, map-side combined — the counters, not the "
    "events, are what survives), estimate every candidate's count as "
    "the min over its 4 cells, and report the top-20 estimated-heaviest "
    "users with their exact counts, the overcount each absorbed from "
    "colliding keys, and the per-row proof of the CMS one-sided error "
    "bound (est >= exact, always).  Scale shape: the sketch is "
    "O(d*w) = constant-size and mergeable (daily sketches add "
    "cell-wise), the estimate join BROADCASTs the 256-cell grid, and "
    "candidate probing is a map over whatever key set you care about — "
    "at 100 TB you'd probe only a candidate list (or walk the sketch), "
    "never re-scan the raw stream.",
    tags=("sketch", "events"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    rows_j = spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))
    cells = cms_cells(ev)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = exact.crossJoin(F.broadcast(rows_j)).select(
        "user_id", "j", cms_cell_col().alias("cell")
    )
    est = (
        probes.join(F.broadcast(cells), ["j", "cell"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    # Global top-N via orderBy+limit = TakeOrderedAndProject (per-partition
    # heaps + driver merge of N rows), never a single-partition window.
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
            (F.col("est_cnt") >= F.col("exact_cnt")).alias("never_undercounts"),
        )
        .orderBy(F.col("est_cnt").desc(), "user_id")
        .limit(_CMS_TOPN)
    )
