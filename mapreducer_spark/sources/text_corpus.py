"""Text-corpus source and `key : value` sink (SURVEY.md §2.1 S1-S3, S5).

The reference's native dataset is a directory of text files
(reference src/mapper.c:95-117: opendir("./data"), skip non-regular
files) and its output format is `"key : value\\n"` lines
(reference src/reducer.c:35, src/worker_manager.c:187-196).  Spark-first:

- S1 directory scan  -> spark.read.text(dir) — one partition per file
  split; non-regular files never appear (FS listing), and
  ``pathGlobFilter`` covers the DT_REG-style filtering.
- S2 whole-file read -> wholetext=True (one row per file, for
  tokenizers that need document scope).
- S3 `key : value` line source -> read.text + split on ' : '.
- S5 `key : value` sink -> concat_ws(' : ') + write.text — sorted
  within partitions to mirror the reference's canonical sorted output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_dir(
    spark: SparkSession, path: str, wholetext: bool = False, glob: str | None = None
) -> DataFrame:
    """S1/S2: directory of text files -> DataFrame[value: string]."""
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.text(path, wholetext=wholetext)


def read_kv_lines(
    spark: SparkSession, path: str, sep: str = " : "
) -> DataFrame:
    """S3: `key : value` lines -> DataFrame[key: string, value: long].

    Mirrors the reducer's input contract (reference src/reducer.c:17-21):
    key = text before the first separator, value = integer after it.
    """
    lines = spark.read.text(path)
    # Split on the FIRST separator only (keys can't contain it — the
    # same limitation as the reference's scanf parsing, noted in
    # SURVEY.md §4.4; we enforce rather than corrupt).
    key = F.substring_index("value", sep, 1)
    val = F.substring_index("value", sep, -1).cast("long")
    return lines.select(key.alias("key"), val.alias("value"))


def write_kv_lines(df: DataFrame, path: str, sep: str = " : ") -> None:
    """S5: 2-column DataFrame -> `key : value` text files.

    Output is sorted by key — matching the reference's canonical
    sorted reducer.out (reference src/reducer.c:23-35) so the directory
    concatenation is a deterministic golden artifact.  ``orderBy`` before
    a text write produces range-partitioned sorted files; readers that
    concatenate in filename order see a globally sorted stream.
    """
    key_col, value_col = df.columns[0], df.columns[1]
    (
        df.orderBy(key_col)
        .select(F.concat_ws(sep, F.col(key_col), F.col(value_col)).alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def word_count_text_dir(spark: SparkSession, data_dir: str) -> DataFrame:
    """The reference's EXACT job: word count over a directory of text
    files (reference src/mapper.c + src/reducer.c), returning the sorted
    (word, cnt) table."""
    from mapreducer_spark.functions.text import SPARK_TOKEN_SPLIT_RE

    lines = read_text_dir(spark, data_dir)
    return (
        lines.select(
            F.explode(F.split(F.lower("value"), SPARK_TOKEN_SPLIT_RE)).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("word")
    )
