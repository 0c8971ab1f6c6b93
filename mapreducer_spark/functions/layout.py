"""Data-layout expressions: Z-order (Morton) interleaving, n-D.

Multi-dimensional clustering for scan pruning — the primitive behind
Delta/Iceberg ``OPTIMIZE ZORDER BY (a, b, ...)``: rows sorted by the
bit-interleave of the key columns land in files whose min/max ranges
are narrow in EVERY dimension, so a predicate on any key column prunes
row groups.  Pure JVM bit arithmetic, identical in DuckDB, so layouts
(and the codes themselves) are engine-reproducible.

Bit budget: with ``n`` dimensions at ``bits`` bits each the code uses
``n * bits`` bits of a signed 64-bit long; the default per-dimension
width is ``min(16, 63 // n)`` — 16+16 for 2-D (the round-4 layout),
3x16 for 3-D, 4x15 for 4-D...  Fewer bits per dimension only coarsens
the clustering granularity (ties sort arbitrarily within a bucket),
never correctness.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_Z_BITS = 16  # per-dimension default for 2-D: 16+16 bits in a BIGINT


def default_bits(n_dims: int) -> int:
    """Per-dimension interleave width that fits n dims in a signed
    64-bit code."""
    return min(_Z_BITS, 63 // n_dims)


def morton_code_nd(cols: Sequence[Column], bits: int | None = None) -> Column:
    """Interleave the low ``bits`` bits of ``n`` non-negative ints:
    bit i of column j -> output bit ``i * n + j`` (dimension-major, so
    the 2-D case reproduces the classic x->even / y->odd layout)."""
    n = len(cols)
    if bits is None:
        bits = default_bits(n)
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed 64-bit code")
    code = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            code = code + F.shiftleft(
                F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * n + j
            )
    return code


def oracle_morton_code_nd(exprs: Sequence[str], bits: int | None = None) -> str:
    """DuckDB twin of morton_code_nd over integer SQL expressions."""
    n = len(exprs)
    if bits is None:
        bits = default_bits(n)
    terms = []
    for i in range(bits):
        for j, e in enumerate(exprs):
            terms.append(f"((({e} >> {i}) & 1) << {i * n + j})")
    return "(" + " + ".join(terms) + ")"


def morton_code(x: Column, y: Column, bits: int = _Z_BITS) -> Column:
    """2-D special case: bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    return morton_code_nd([x, y], bits)


def oracle_morton_code(x: str, y: str, bits: int = _Z_BITS) -> str:
    """DuckDB twin of morton_code over integer expressions."""
    return oracle_morton_code_nd([x, y], bits)


def normalize_16bit(v: Column, vmin: Column, vmax: Column) -> Column:
    """Min-max scale a numeric column onto the full 16-bit interleave
    range — the per-column normalization Z-order needs so neither
    dimension's bits dominate the sort (try_divide: a constant column
    degrades to bucket 0 instead of dividing by zero)."""
    return normalize_bits(v, vmin, vmax, _Z_BITS)


def normalize_bits(v: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Min-max scale a numeric column onto [0, 2^bits - 1]."""
    top = float((1 << bits) - 1)
    return F.coalesce(
        F.floor(
            F.try_divide(
                (v.cast("double") - vmin.cast("double")) * top,
                vmax.cast("double") - vmin.cast("double"),
            )
        ).cast("long"),
        F.lit(0),
    )
