"""Vector expressions over array<float> embedding columns.

All JVM-side higher-order functions — no Python in the hot path
(SURVEY.md §2.10 L3).  Floats are cast to double BEFORE any arithmetic so
Spark and the DuckDB oracle (which computes on DOUBLE[]) accumulate
identically; results are rounded at 6dp in queries to absorb the ~1e-15
cross-engine noise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(x: Column) -> Column:
    return x.cast("double")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _as_double(x) * _as_double(x))
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; mirrors DuckDB list_cosine_similarity on DOUBLE[].

    A zero-norm vector has no direction: try_divide yields NULL instead of
    the DIVIDE_BY_ZERO error ANSI mode would raise (one degenerate row
    must not abort a 100 TB similarity job).  NULL similarity then drops
    out of >=threshold filters and top-k orderings naturally.
    """
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def sign_bucket(a: Column, n_bits: int = 8) -> Column:
    """LSH-ish blocking key: sign bits of the first ``n_bits`` dimensions.

    Deterministic, O(1), expressible identically in SQL — used to block
    near-duplicate search so the pairwise stage is per-bucket instead of a
    full cross join.  Scaled copies of a vector (and most near-duplicates)
    land in the same bucket.
    """
    bucket = F.lit(0)
    for i in range(1, n_bits + 1):
        bucket = bucket + F.when(
            F.element_at(a, i) >= 0, F.lit(2 ** (i - 1))
        ).otherwise(F.lit(0))
    return bucket


def oracle_sign_bucket(expr: str, n_bits: int = 8) -> str:
    """DuckDB mirror of sign_bucket (1-based list indexing, same bits)."""
    terms = [
        f"(CASE WHEN {expr}[{i}] >= 0 THEN {2 ** (i - 1)} ELSE 0 END)"
        for i in range(1, n_bits + 1)
    ]
    return "(" + " + ".join(terms) + ")"
