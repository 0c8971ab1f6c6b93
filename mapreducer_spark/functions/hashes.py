"""Cross-engine deterministic hashing.

The oracle gate needs hash functions that produce IDENTICAL values in
Spark and DuckDB.  Neither engine's native 64-bit hash exists in the
other (Spark xxhash64 vs DuckDB hash), but both have md5 over UTF-8
strings.  ``md5_int64`` takes the top 15 hex digits of md5 (60 bits,
always < 2^60 so it fits signed int64 without sign issues) and parses
them as an integer:

    Spark : CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

For ops that don't need an oracle (MinHash LSH at scale), prefer the
much faster JVM-side xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int64(col: Column) -> Column:
    """Deterministic 60-bit integer hash, reproducible in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def oracle_md5_int64(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
