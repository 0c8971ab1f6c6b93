"""Parquet sink round-trip (SURVEY.md §2.1 S7), Python UDTF (U1), and
approx-distinct accuracy bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducer_spark.operators.wordcount import word_count_df
from mapreducer_spark.sources import load_table


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "wc_parquet")
    wc = word_count_df(spark, sf_dir)
    wc.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert {(r.word, r.cnt) for r in back.collect()} == {
        (r.word, r.cnt) for r in wc.collect()
    }
    # (nullability is not preserved by parquet round-trips; names+types are)
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in wc.schema
    ]


def test_partitioned_parquet_sink(spark, sf_dir, tmp_path):
    """Partitioned write — the 100 TB layout (partition pruning on read)."""
    out = str(tmp_path / "docs_by_lang")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # Partition pruning: filter on lang must hit PartitionFilters.
    from mapreducer_spark.plans import formatted_plan

    plan = formatted_plan(back.where(F.col("lang") == "en"))
    assert "PartitionFilters" in plan
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "lang" in pf_line, pf_line


def test_python_udtf_tokenize(spark):
    """U1: the mapper extension point as a Spark 4 Python UDTF — one
    (filename, contents) row in, N token rows out (reference
    src/mapper.c:14-42's shape)."""
    from pyspark.sql.functions import udtf
    import re

    @udtf(returnType="word: string")
    class Tokenize:
        def eval(self, text: str):
            for tok in re.split(r"[^a-z0-9]+", text.lower()):
                if tok:
                    yield (tok,)

    spark.udtf.register("tokenize_udtf", Tokenize)
    df = spark.createDataFrame([("The quick 42 fox",)], ["text"])
    df.createOrReplaceTempView("udtf_in")
    got = spark.sql(
        "SELECT t.word FROM udtf_in, LATERAL tokenize_udtf(text) t"
    ).collect()
    assert [r.word for r in got] == ["the", "quick", "42", "fox"]


def test_approx_distinct_within_rsd(spark, oracle_sf_dir):
    from mapreducer_spark.operators.relational import approx_distinct_users

    approx = {
        r.event_type: r.approx_users
        for r in approx_distinct_users(spark, oracle_sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, oracle_sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) / n < 0.1, (et, approx[et], n)


def test_hll_rollup_merge_matches_exact_within_error(spark, oracle_sf_dir):
    """Merged daily sketches must estimate the same population as a
    direct distinct count (HLL union is lossless over register maxima;
    lgK=12 default keeps relative error ~1.6%)."""
    from mapreducer_spark.operators.relational import user_hll_rollup

    approx = {
        r.event_type: r.approx_users
        for r in user_hll_rollup(spark, oracle_sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, oracle_sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) / n < 0.05, (et, approx[et], n)
