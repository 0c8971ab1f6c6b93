"""Data-layout expressions: Z-order (Morton) interleaving.

Multi-dimensional clustering for scan pruning — the primitive behind
Delta/Iceberg ``OPTIMIZE ZORDER BY (a, b)``: rows sorted by the
bit-interleave of two key columns land in files whose min/max ranges
are narrow in BOTH dimensions, so a predicate on either column prunes
row groups.  Pure JVM bit arithmetic, identical in DuckDB, so layouts
(and the codes themselves) are engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_Z_BITS = 16  # 16+16 interleaved bits -> 32-bit code in a BIGINT


def morton_code(x: Column, y: Column, bits: int = _Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code + F.shiftleft(
            F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        code = code + F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return code


def oracle_morton_code(x: str, y: str, bits: int = _Z_BITS) -> str:
    """DuckDB twin of morton_code over integer expressions."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def normalize_16bit(v: Column, vmin: Column, vmax: Column) -> Column:
    """Min-max scale a numeric column onto the full 16-bit interleave
    range — the per-column normalization Z-order needs so neither
    dimension's bits dominate the sort (try_divide: a constant column
    degrades to bucket 0 instead of dividing by zero)."""
    return F.coalesce(
        F.floor(
            F.try_divide(
                (v.cast("double") - vmin.cast("double")) * 65535.0,
                vmax.cast("double") - vmin.cast("double"),
            )
        ).cast("long"),
        F.lit(0),
    )
