"""Spark 4 Python Data Source API: the `key : value` format as a
registered custom connector, pinned row-for-row to the production
text+split route (sources/text_corpus.read_kv_lines)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def kv_dir(spark, tmp_path_factory):
    from mapreducer_spark.sources.text_corpus import write_kv_lines

    path = str(tmp_path_factory.mktemp("kv") / "out")
    df = spark.createDataFrame(
        [("the", 42), ("a b", 7), ("zebra", 1), ("küche", 9)],
        "key string, value long",
    )
    write_kv_lines(df, path)
    return path


def test_kv_datasource_matches_text_route(spark, kv_dir):
    from mapreducer_spark.sources.kv_datasource import KvLinesDataSource
    from mapreducer_spark.sources.text_corpus import read_kv_lines

    spark.dataSource.register(KvLinesDataSource)
    via_ds = spark.read.format("kvlines").load(kv_dir)
    via_text = read_kv_lines(spark, kv_dir)
    assert via_ds.schema == via_text.schema
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, via_text.collect())
    )


def test_kv_datasource_one_partition_per_file(spark, kv_dir):
    import os

    from mapreducer_spark.sources.kv_datasource import KvLinesDataSource

    spark.dataSource.register(KvLinesDataSource)
    df = spark.read.format("kvlines").load(kv_dir)
    n_files = sum(
        1
        for f in os.listdir(kv_dir)
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(kv_dir, f))
    )
    assert df.rdd.getNumPartitions() == n_files


def test_kv_datasource_custom_separator(spark, tmp_path):
    from mapreducer_spark.sources.kv_datasource import KvLinesDataSource

    p = tmp_path / "tabs"
    p.mkdir()
    (p / "part-0.txt").write_text("alpha\t3\nbeta\t5\n", encoding="utf-8")
    spark.dataSource.register(KvLinesDataSource)
    rows = sorted(
        map(
            tuple,
            spark.read.format("kvlines")
            .option("sep", "\t")
            .load(str(p))
            .collect(),
        )
    )
    assert rows == [("alpha", 3), ("beta", 5)]


def test_kv_datasource_write_roundtrip(spark, tmp_path):
    """The custom sink's two-phase commit must leave only final part
    files, and reading them back (through the same connector) must
    reproduce the rows."""
    import os

    from mapreducer_spark.sources.kv_datasource import KvLinesDataSource

    spark.dataSource.register(KvLinesDataSource)
    out = str(tmp_path / "kvout")
    df = spark.createDataFrame(
        [("alpha", 3), ("beta", 5), ("gamma", 7)], "key string, value long"
    ).repartition(2)
    df.write.format("kvlines").mode("append").save(out)
    names = sorted(os.listdir(out))
    assert names and all(n.startswith("part-") for n in names), names
    back = sorted(
        map(tuple, spark.read.format("kvlines").load(out).collect())
    )
    assert back == [("alpha", 3), ("beta", 5), ("gamma", 7)]


def test_kv_datasource_overwrite_removes_stale_parts(spark, tmp_path):
    """mode('overwrite') must not merge with the previous generation:
    a rewrite with FEWER partitions has to delete the old part files, or
    readers see old+new rows mixed (the classic stale-part-file bug)."""
    import os

    from mapreducer_spark.sources.kv_datasource import KvLinesDataSource

    spark.dataSource.register(KvLinesDataSource)
    out = str(tmp_path / "kvout")
    gen1 = spark.createDataFrame(
        [("old_a", 1), ("old_b", 2), ("old_c", 3), ("old_d", 4)],
        "key string, value long",
    ).repartition(4)
    gen1.write.format("kvlines").mode("overwrite").save(out)
    assert len(os.listdir(out)) == 4

    gen2 = spark.createDataFrame(
        [("new_x", 10)], "key string, value long"
    ).repartition(1)
    gen2.write.format("kvlines").mode("overwrite").save(out)

    back = sorted(map(tuple, spark.read.format("kvlines").load(out).collect()))
    assert back == [("new_x", 10)], f"stale parts survived overwrite: {back}"


def test_kv_datasource_append_accumulates_generations(spark, tmp_path):
    """mode('append') must add to — never clobber — the previous
    generation's part files (per-run unique part names)."""
    from mapreducer_spark.sources.kv_datasource import KvLinesDataSource

    spark.dataSource.register(KvLinesDataSource)
    out = str(tmp_path / "kvout")
    df = spark.createDataFrame(
        [("k1", 1), ("k2", 2)], "key string, value long"
    ).repartition(2)
    df.write.format("kvlines").mode("append").save(out)
    df.write.format("kvlines").mode("append").save(out)
    back = sorted(map(tuple, spark.read.format("kvlines").load(out).collect()))
    assert back == [("k1", 1), ("k1", 1), ("k2", 2), ("k2", 2)]
