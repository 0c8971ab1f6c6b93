"""Tiny driver-side constant tables as JVM-only literal frames.

``spark.createDataFrame(python_rows)`` inside a query path materializes
through a pyspark worker task — ~1 s of interpreter spin-up PER QUERY
INVOCATION (measured on the IVF index frame, SURVEY round-4 log).  For
the metadata-sized constant relations queries need (tier bounds, decile
maps, index literals), build them as a ``range(1)`` projection of
literal structs instead: pure JVM, constant-folded, zero Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def inline_rows(
    spark: SparkSession, rows: list[tuple], names: list[str]
) -> DataFrame:
    """Literal DataFrame from a small list of Python tuples.

    Intended for METADATA-sized relations (tens to a few thousand rows
    of scalars) that join/broadcast into a query; every value becomes a
    plan literal, so don't feed it actual data."""
    if not rows:
        # explode(array()) is NullType and the field extraction below
        # would die with an opaque AnalysisException — fail clearly; an
        # empty constant relation has no inferable schema, so callers
        # must branch (see quantity_decile_stats).
        raise ValueError("inline_rows requires at least one row")
    structs = [
        F.struct(*[F.lit(v).alias(n) for v, n in zip(row, names)])
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("__s"))
        .select(*[F.col(f"__s.{n}").alias(n) for n in names])
    )
