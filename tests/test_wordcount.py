"""Flagship word-count tests — golden fixture + oracle + properties
(SURVEY.md §5.2 items 2-4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducer_spark.functions.text import SPARK_TOKEN_SPLIT_RE
from mapreducer_spark.operators.wordcount import word_count_df
from mapreducer_spark.registry import all_queries
from tests.oracle import assert_matches_oracle


def test_golden_wordcount(spark):
    """Hand-computed golden table, mirroring the reference's canonical
    sorted reducer.out (reference src/reducer.c:23-35)."""
    rows = [
        ("The quick brown fox; the QUICK fox!",),
        ("fox 42 fox... and 42",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = (
        df.select(
            F.explode(F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE)).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("word")
        .collect()
    )
    golden = [
        ("42", 2),
        ("and", 1),
        ("brown", 1),
        ("fox", 4),
        ("quick", 2),
        ("the", 2),
    ]
    assert [(r.word, r.cnt) for r in got] == golden


def test_wordcount_matches_oracle(spark, oracle_sf_dir):
    q = all_queries()["word_count"]
    assert_matches_oracle(spark, q, oracle_sf_dir)


def test_wordcount_topk_matches_oracle(spark, oracle_sf_dir):
    q = all_queries()["word_count_topk"]
    assert_matches_oracle(spark, q, oracle_sf_dir)


def test_total_count_invariant(spark, sf_dir):
    """sum(cnt) == total token count (SURVEY.md §5.2 property test)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_tokens = (
        docs.select(
            F.explode(F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE)).alias("word")
        )
        .where(F.length("word") > 0)
        .count()
    )
    wc_sum = word_count_df(spark, sf_dir).agg(F.sum("cnt")).collect()[0][0]
    assert wc_sum == total_tokens


def test_repartition_invariance(spark, sf_dir):
    """Result invariant under input partitioning — the contract the
    reference's key->reducer assignment guarantees
    (reference src/master_manager.c:36-46)."""
    base = {(r.word, r.cnt) for r in word_count_df(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(13)
    re = (
        docs.select(
            F.explode(F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE)).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    assert {(r.word, r.cnt) for r in re} == base


def test_no_empty_or_uppercase_tokens(spark, sf_dir):
    wc = word_count_df(spark, sf_dir)
    bad = wc.where(
        (F.length("word") == 0) | (F.col("word") != F.lower("word"))
    ).count()
    assert bad == 0
