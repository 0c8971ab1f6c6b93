"""Range-frame windows, map-typed columns, and the Unicode-faithful
tokenizer variant (SURVEY.md §2.6 / §2.7 map / §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table

_7D_SEC = 7 * 24 * 3600


@register(
    "trailing_week_revenue",
    oracle=f"""
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
    RANGE BETWEEN {_7D_SEC} PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS trailing_7d
FROM orders
""",
    doc="RANGE frame window: per-customer trailing-7-day revenue — a "
    "value-range frame (all rows within 7 days), not a row-count frame. "
    "Ordered on epoch seconds so Spark rangeBetween and SQL RANGE "
    "BETWEEN agree exactly.",
    tags=("window", "range-frame"),
)
def trailing_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-_7D_SEC, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d"),
    )


@register(
    "props_map_functions",
    oracle="""
SELECT
  event_id,
  json_keys(props)[1]                                 AS first_key,
  len(json_keys(props))                               AS n_keys,
  CAST(json_extract_string(props, '$.k') AS BIGINT)   AS k_val
FROM events
WHERE event_id % 20 = 0
""",
    doc="Map-typed columns (§2.7 map): parse events.props into "
    "map<string,bigint>, use map_keys / size / element access.",
    tags=("scalar", "map", "events"),
)
def props_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 20 == 0)
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


@register(
    "first_order_struct",
    oracle="""
SELECT
  o_custkey,
  COUNT(*) AS n_orders,
  (list(struct_pack(d := o_orderdate, k := o_orderkey)
        ORDER BY o_orderdate, o_orderkey))[1].k AS first_orderkey,
  strftime((list(struct_pack(d := o_orderdate, k := o_orderkey)
        ORDER BY o_orderdate, o_orderkey))[1].d, '%Y-%m-%d') AS first_orderdate
FROM orders
GROUP BY o_custkey
""",
    doc="Nested types end-to-end (§2.7): collect structs per key, sort the "
    "struct array (field-order comparison is identical in both engines), "
    "take the earliest. collect_list alone is partition-order-dependent; "
    "sort_array is what makes it deterministic.",
    tags=("agg", "nested"),
)
def first_order_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("o_orderdate").alias("d"), F.col("o_orderkey").alias("k")))
    )
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.element_at(pairs, 1).getField("k").alias("first_orderkey"),
        F.date_format(F.element_at(pairs, 1).getField("d"), "yyyy-MM-dd").alias(
            "first_orderdate"
        ),
    )


@register(
    "word_count_unicode",
    oracle=r"""
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT unnest(string_split_regex(lower(text), '[^\p{L}\p{N}]+')) AS word
  FROM documents
)
WHERE length(word) > 0
GROUP BY word
""",
    doc="Unicode-faithful tokenizer variant: \\p{L}\\p{N} character "
    "classes — the deterministic analogue of the reference's "
    "locale-sensitive iswalnum (reference src/mapper.c:23-29, "
    "SURVEY.md §7.4.1). Same regex class in Java regex and RE2.",
    tags=("ref", "agg", "unicode"),
)
def word_count_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col("text")), r"[^\p{L}\p{N}]+")
            ).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "word_count_ascii",
    oracle="""
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
  FROM documents
)
WHERE length(word) > 0
GROUP BY word
""",
    doc="ASCII-restricted tokenizer variant ([a-z0-9] runs after lower) — "
    "the round-1 default, kept as the explicit opt-in contrast to the "
    "Unicode \\p{L}\\p{N} flagship (functions/text.py *_ASCII constants; "
    "reference src/mapper.c iswalnum under the C locale behaves this way).",
    tags=("ref", "agg", "ascii"),
)
def word_count_ascii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreducer_spark.functions.text import SPARK_TOKEN_SPLIT_RE_ASCII

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col("text")), SPARK_TOKEN_SPLIT_RE_ASCII)
            ).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Spark 4 VARIANT type — semi-structured ingestion without a fixed schema
# ---------------------------------------------------------------------------


@register(
    "props_variant_stats",
    oracle="""
WITH corpus AS (
  SELECT CASE WHEN event_id % 97 = 0 THEN 'x' || props ELSE props END
           AS props
  FROM events
),
parsed AS (
  SELECT CASE WHEN json_valid(props)
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
  FROM corpus
)
SELECT CAST(FLOOR(k / 10) AS BIGINT) AS band,
       COUNT(*) AS n,
       MIN(k) AS min_k,
       MAX(k) AS max_k
FROM parsed
GROUP BY 1
""",
    doc="Spark 4 VARIANT ingestion of semi-structured event payloads: "
    "props parses through try_parse_json into the binary VARIANT type "
    "(schema-on-read, no fixed struct), try_variant_get pulls $.k as a "
    "typed long, and the query bands k by decade with counts/min/max.  "
    "A deterministic 1-in-97 slice of the corpus is corrupted (leading "
    "junk byte — Spark's Jackson parser forgives TRAILING garbage), so "
    "the NULL band proves the TRY semantics route malformed payloads "
    "into data instead of failing the job — the posture a 100 TB "
    "ingest of scraped JSON needs.  The DuckDB twin uses "
    "json_valid/json_extract_string; both engines band identically.",
    tags=("json", "variant", "scalars"),
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.when(
            F.col("event_id") % 97 == 0, F.concat(F.lit("x"), F.col("props"))
        )
        .otherwise(F.col("props"))
        .alias("props")
    )
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        ev.select(k.alias("k"))
        .groupBy(F.floor(F.col("k") / 10).cast("long").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
