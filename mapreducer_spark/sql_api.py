"""SQL entry point — the engine as a SQL surface.

Registers every fixture table as a temp view so users run plain
``spark.sql`` (the reference has no query language; this is the EXT
surface that makes the engine a drop-in analytics backend).  Also exposed
on the CLI:

    python -m mapreducer_spark sql "SELECT count(*) FROM lineitem" \
        --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreducer_spark.sources import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register all fixture tables as temp views ``{prefix}{name}``."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run SQL against the fixture tables (views registered on demand)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
