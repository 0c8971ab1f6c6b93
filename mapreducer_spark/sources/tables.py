"""Parquet table sources (SURVEY.md §2.1 S4).

The driver fixtures are one parquet file per table under an sf dir
(TESTDATA.md).  At 100 TB each "table" would be a partitioned parquet
dataset; ``spark.read.parquet`` handles both shapes identically, and
Catalyst pushes filters/column pruning into the scan (verified in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 rows; part/supplier/customer scale with sf but
# stay orders of magnitude below the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier", "part", "customer")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS) in some fixture
        # generations (Spark rejects it by default; with
        # nanosAsLong it reads as int64) and as TIMESTAMP(MICROS) in
        # others (reads as TIMESTAMP_NTZ).  Normalize both to a plain
        # microsecond TimestampType: nanos are truncated with integer
        # division (a double round-trip would lose precision at ~1.7e18
        # ns; DuckDB's TIMESTAMP_NS -> python datetime conversion
        # truncates identically), NTZ is reinterpreted in the UTC
        # session zone (same wall-clock, matching DuckDB's naive read).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            return df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a CPU-bound scan UP to cluster parallelism when the
    input arrives in fewer partitions than cores.

    Small parquet fixtures land in a single input split, which serializes
    per-row-heavy operators (tokenization, n-gram scans, hashing) onto one
    core while 31 idle.  At 100 TB the scan already has thousands of
    splits, ``getNumPartitions() >= target`` holds, and this is a no-op —
    so the helper costs nothing at scale and only fixes the small-file
    regime.  The explicit ``repartition(n)`` is deliberately a
    user-specified partition count: AQE's partition coalescing respects it
    and will not merge the tiny shuffle blocks back into one task.

    Streaming frames pass through untouched (``.rdd`` is illegal on them;
    micro-batch parallelism is the source's concern).
    """
    if df.isStreaming:
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
