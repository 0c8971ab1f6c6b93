"""Scalar function surface (SURVEY.md §2.7).

The reference's only scalar ops are iswalnum/towlower/"%ls : %lu"
formatting (reference src/mapper.c:23-29,85); everything else is EXT.
All expressions here are built-in Catalyst functions — whole-stage
codegen, no Python in the hot path.  Chosen for exact cross-engine
semantics with the DuckDB oracle (1-based substring, same regex class,
integer date diffs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table


@register(
    "string_functions",
    oracle="""
SELECT
  p_partkey,
  upper(p_name)                                   AS name_upper,
  substring(p_name, 1, 8)                         AS name_prefix,
  length(p_name)                                  AS name_len,
  CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_num,
  concat_ws('|', p_brand, p_type)                 AS brand_type,
  (p_type LIKE '%a%')                             AS type_has_a,
  replace(p_type, ' ', '_')                       AS type_snake,
  trim(concat(' ', p_name, ' '))                  AS name_trimmed,
  levenshtein(p_brand, 'Brand#10')                AS brand_edit_dist
FROM part
""",
    doc="substring/trim/regexp_extract/concat/like/replace (§2.7 string).",
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1)
        .cast("int")
        .alias("brand_num"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.col("p_type").like("%a%").alias("type_has_a"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.levenshtein("p_brand", F.lit("Brand#10")).alias("brand_edit_dist"),
    )


@register(
    "datetime_functions",
    oracle="""
SELECT
  o_orderkey,
  year(o_orderdate)                                   AS o_year,
  month(o_orderdate)                                  AS o_month,
  day(o_orderdate)                                    AS o_day,
  quarter(o_orderdate)                                AS o_quarter,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  datediff('day', TIMESTAMP '1995-01-01', o_orderdate)   AS days_since_epoch,
  CAST(o_orderdate AS DATE)                           AS o_date
FROM orders
WHERE o_orderkey % 10 = 0
""",
    doc="year/month/day/quarter/date_trunc/datediff (§2.7 datetime).",
    tags=("scalar", "datetime"),
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(
            F.col("o_orderdate"), F.to_timestamp(F.lit("1995-01-01"))
        ).alias("days_since_epoch"),
        F.col("o_orderdate").cast("date").alias("o_date"),
    )


@register(
    "math_functions",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  round(l_extendedprice * l_discount, 6)       AS disc_amount,
  abs(l_discount - 0.05)                       AS disc_dev,
  CAST(floor(l_quantity) AS BIGINT)            AS qty_floor,
  CAST(ceil(l_extendedprice / 100) AS BIGINT)  AS price_century,
  CAST(power(l_quantity, 2) AS DOUBLE)         AS qty_sq,
  round(ln(l_extendedprice + 1), 6)            AS log_price,
  greatest(l_tax, l_discount)                  AS max_rate,
  least(l_tax, l_discount)                     AS min_rate
FROM lineitem
WHERE l_orderkey % 50 = 0
""",
    doc="round/abs/floor/ceil/pow/log/greatest/least (§2.7 math).",
    tags=("scalar", "math"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round at 6dp, not 2: the products are ~4-decimal values, so 6dp
        # rounding never lands on a .5 boundary where Spark (HALF_UP on the
        # exact binary value) and DuckDB disagree.
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 6).alias(
            "disc_amount"
        ),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 100).alias("price_century"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "json_functions",
    oracle="""
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
FROM events
WHERE event_type = 'purchase'
""",
    doc="JSON extraction from events.props (§2.7 JSON; FIXTURES.md events).",
    tags=("scalar", "json", "events"),
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select("event_id", k.alias("k_val"), (k % 10).alias("k_mod"))


@register(
    "array_functions",
    oracle="""
SELECT
  vec_id,
  len(embedding)                                        AS dim,
  round(CAST(embedding[1] AS DOUBLE), 6)                AS first_val,
  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_sum,
  len(list_filter(embedding, x -> x > 0))               AS n_positive
FROM embeddings
""",
    doc="array/higher-order functions over array<float> (§2.7 array; "
    "size/element_at/aggregate/filter).",
    tags=("scalar", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ),
            6,
        ).alias("vec_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


# ---------------------------------------------------------------------------
# Spark 4 collations — case-insensitive equality without lower() rewrites
# ---------------------------------------------------------------------------


@register(
    "brand_collation_join",
    oracle="""
WITH cased AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand) ELSE p_brand END
           AS cased_brand
  FROM part
),
canon AS (SELECT DISTINCT p_brand FROM part)
SELECT b.p_brand AS brand, COUNT(*) AS n
FROM cased c
JOIN canon b ON lower(c.cased_brand) = lower(b.p_brand)
GROUP BY b.p_brand
""",
    doc="Spark 4 string collations (SPARK-46830): half the part rows get "
    "an upper-cased brand, then a join back to the canonical brand "
    "dimension matches on UTF8_LCASE-collated equality — no lower() "
    "rewrite on the join keys, the collation IS the comparison "
    "semantics, and Catalyst can still broadcast-hash-join on the "
    "collation-aware key.  The DuckDB twin states the same equality as "
    "lower()=lower().  This is the upgrade path for case-insensitive "
    "dimensions (emails, tags, hostnames) at scale: declare the "
    "collation once instead of scattering lower() through every "
    "predicate.",
    tags=("scalars", "collation", "join"),
)
def brand_collation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    cased = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_brand"))
        .otherwise(F.col("p_brand"))
        .alias("cased_brand")
    )
    canon = p.select("p_brand").distinct()
    lcase = lambda c: F.collate(F.col(c), "UTF8_LCASE")  # noqa: E731
    return (
        cased.join(
            F.broadcast(canon), lcase("cased_brand") == lcase("p_brand")
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
