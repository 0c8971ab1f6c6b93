"""Warehouse ingest — the at-rest layout for 100 TB (SURVEY.md §2.1 S7+).

Converts the flat per-table parquet fixtures into the layout a real
deployment queries:

- fact tables partitioned by a pruning-friendly time key
  (orders/lineitem by year; events by day) -> partition pruning turns
  time-range scans into directory selection,
- lineitem and orders ALSO bucketed by the join key in a table-catalog
  variant (see tests/test_bucketing_and_formats.py) so the recurring
  fact-fact join pre-pays its shuffle at ingest,
- documents partitioned by lang (the dominant filter of text pipelines).

CLI:  python -m mapreducer_spark ingest --sf-dir ... --warehouse ...
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducer_spark.sources.tables import TABLES, load_table


def ingest_warehouse(
    spark: SparkSession, sf_dir: str, warehouse_dir: str
) -> dict[str, str]:
    """Write every table into the partitioned warehouse layout; returns
    {table: path}."""
    out: dict[str, str] = {}

    def path(name: str) -> str:
        p = f"{warehouse_dir}/{name}"
        out[name] = p
        return p

    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if name == "orders":
            (
                df.withColumn("o_year", F.year("o_orderdate"))
                .write.mode("overwrite")
                .partitionBy("o_year")
                .parquet(path(name))
            )
        elif name == "lineitem":
            (
                df.withColumn("l_year", F.year("l_shipdate"))
                .write.mode("overwrite")
                .partitionBy("l_year")
                .parquet(path(name))
            )
        elif name == "events":
            (
                df.withColumn("d", F.to_date("ts"))
                .write.mode("overwrite")
                .partitionBy("d")
                .parquet(path(name))
            )
        elif name == "documents":
            df.write.mode("overwrite").partitionBy("lang").parquet(path(name))
        else:
            df.write.mode("overwrite").parquet(path(name))
    return out


def read_warehouse_table(
    spark: SparkSession, warehouse_dir: str, name: str
) -> DataFrame:
    df = spark.read.parquet(f"{warehouse_dir}/{name}")
    # Drop the derived partition columns so schemas match the originals.
    for extra in ("o_year", "l_year", "d"):
        if extra in df.columns:
            df = df.drop(extra)
    return df
