"""The flagship: the reference's own job, Spark-first (SURVEY.md §7.1).

Reference pipeline (reference src/mapper.c:14-42 tokenize -> src/mapper.c:74-88
map-side combine -> shuffle -> src/reducer.c:23-38 final sort+sum) collapses
to one declarative plan:

    read.parquet -> lower/split/explode -> filter -> groupBy.count

Spark's HashAggregate runs the partial (map-side) aggregation automatically
— the exact contract of the reference's per-file combiner — and the shuffle
exchange replaces ~660 lines of its TCP machinery.  At 100 TB this plan is
a single wide transformation whose only shuffle carries (word, partial
count) pairs, already combined, so shuffle volume is bounded by
distinct-words x partitions, not by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducer_spark.functions.text import (
    ORACLE_TOKENS_SNIPPET,
    SPARK_TOKEN_SPLIT_RE,
)
from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table

_ORACLE_WORD_COUNT = f"""
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT {ORACLE_TOKENS_SNIPPET} AS word
  FROM documents
)
WHERE length(word) > 0
GROUP BY word
"""

_ORACLE_WORD_COUNT_TOPK = f"""
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT {ORACLE_TOKENS_SNIPPET} AS word
  FROM documents
)
WHERE length(word) > 0
GROUP BY word
ORDER BY cnt DESC, word ASC
LIMIT 25
"""


def word_count_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), SPARK_TOKEN_SPLIT_RE)).alias(
                "word"
            )
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "word_count",
    oracle=_ORACLE_WORD_COUNT,
    doc="Flagship: word count over documents.text (reference src/mapper.c + src/reducer.c).",
    tags=("ref", "agg", "flatmap"),
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_count_df(spark, sf_dir)


@register(
    "word_count_topk",
    oracle=_ORACLE_WORD_COUNT_TOPK,
    doc="Top-25 words by count (sort + limit, SURVEY.md §2.5 O1/O2); "
    "deterministic tie-break on word.",
    tags=("ref", "agg", "sort", "limit"),
)
def word_count_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy + limit compiles to TakeOrderedAndProject: a per-partition
    # top-k followed by a k-row merge on the driver — no global sort even
    # at 100 TB.
    return (
        word_count_df(spark, sf_dir)
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(25)
    )
