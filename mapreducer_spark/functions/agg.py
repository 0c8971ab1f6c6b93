"""Deterministic aggregate expressions.

Double summation is order-dependent, and the driver's oracle gate hashes
values exactly (SURVEY.md §7.4.3).  Strategy: cast to DECIMAL before
SUM (exact, order-independent arithmetic), cast the final result back to
DOUBLE.  Both Spark and DuckDB produce bit-identical doubles for the same
decimal value, so partial aggregation / AQE / partition count can't change
results.  The oracle SQL must mirror the same casts — see the module
docstrings of each operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """SUM(CAST(x AS DECIMAL(18,scale))) :: DOUBLE — order-independent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    """Decimal-exact sum divided by count, as DOUBLE.

    Oracle mirror: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(*)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(F.lit(1))


# Oracle-side templates (DuckDB SQL) for the same expressions.
def oracle_dec_sum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def oracle_dec_avg(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT(*)"


def salted_group_sum(
    df,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    scale: int = 2,
    out_name: str = "total",
):
    """Two-stage salted aggregation for skewed keys (SURVEY.md §4.3).

    Stage 1 groups on (key, salt) — a hot key's rows spread across
    ``n_salts`` reducers; stage 2 merges the per-salt partials.  With
    decimal-exact sums the result is identical to a direct groupBy (the
    invariance the reference's per-distinct-key round-robin partitioner
    was trying to buy, reference src/master_manager.c:37-45).

    Note: Spark's built-in partial aggregation + AQE skew handling makes
    this unnecessary for plain sums; it's the pattern for algebraic
    aggregates whose per-key state is large (collect-style, sketches) or
    for engines/joins where one key dominates a partition.
    """
    from pyspark.sql import functions as F

    salt = F.pmod(F.xxhash64(*key_cols, F.spark_partition_id()), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.sum(F.col(value_col).cast(f"decimal(18,{scale})")).alias("__partial"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.sum("__partial").cast("double").alias(out_name))
    )
