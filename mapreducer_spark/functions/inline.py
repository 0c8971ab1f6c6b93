"""Tiny driver-side constant tables as JVM-only literal frames.

``spark.createDataFrame(python_rows)`` inside a query path materializes
through a pyspark worker task — ~1 s of interpreter spin-up PER QUERY
INVOCATION (measured on the IVF index frame, SURVEY round-4 log).  For
the metadata-sized constant relations queries need (tier bounds, decile
maps, index literals), build them as a ``range(1)`` projection of
literal structs instead: pure JVM, constant-folded, zero Python workers.

Two construction paths with identical results:
- SQL fast path (scalar int/float/str/bool cells): render ONE
  ``inline(array(struct(...)))`` expression string and parse it in a
  single py4j call.  The Column-object path costs ~3 py4j round trips
  PER CELL (~10 s for a 1000-row threshold table, measured on the DP
  discrete-Laplace CDF in round 10); the string path is ~50 ms for the
  same table.
- Column fallback (None, arrays, decimals, non-finite floats): the
  original per-cell ``F.lit`` struct build.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _render_sql_cells(rows: list[tuple], names: list[str]) -> str | None:
    """Render rows as ``struct(...)`` SQL literals, or None if any cell
    needs the Column fallback.  Per-column typing mirrors what the
    ``array()`` element coercion of the fallback produces: any float in
    a column makes the column DOUBLE, any out-of-int32 integer makes it
    BIGINT, bools and strings must be column-pure."""
    cols = list(zip(*rows))
    rendered: list[list[str]] = []
    for vals in cols:
        if all(isinstance(v, bool) for v in vals):
            rendered.append(["true" if v else "false" for v in vals])
        elif any(isinstance(v, bool) for v in vals):
            return None
        elif all(isinstance(v, str) for v in vals):
            # Doubled '' is a valid quote escape under BOTH values of
            # spark.sql.parser.escapedStringLiterals; backslash handling
            # is mode-dependent (escape char by default, literal when the
            # conf is set), so any backslash-bearing string takes the
            # Column fallback rather than risking a silent value change.
            if any("\\" in v for v in vals):
                return None
            rendered.append(["'" + v.replace("'", "''") + "'" for v in vals])
        elif any(isinstance(v, str) for v in vals):
            return None
        elif any(isinstance(v, float) for v in vals):
            if not all(
                isinstance(v, (int, float)) and math.isfinite(v) for v in vals
            ):
                return None
            # the D suffix makes a (non-nullable) DOUBLE literal, same
            # type AND nullability as F.lit(float)
            rendered.append([f"{float(v)!r}D" for v in vals])
        elif all(isinstance(v, int) for v in vals):
            suffix = "L" if any(abs(v) > 2**31 - 1 for v in vals) else ""
            rendered.append([f"{v}{suffix}" for v in vals])
        elif all(
            isinstance(v, (list, tuple))
            # Non-empty with >=1 float per cell: an int-only cell would
            # render array<double> here while the F.lit fallback types it
            # as an integer array, and an empty cell renders `array()`
            # (array<string>) — both schema drifts from the documented
            # identical-results contract, so they take the fallback.
            and len(v) > 0
            and any(isinstance(x, float) for x in v)
            and all(
                isinstance(x, (int, float))
                and not isinstance(x, bool)
                and math.isfinite(x)
                for x in v
            )
            for v in vals
        ):
            # array<double> cells (centroid/codebook literals): every
            # element renders as a D-suffixed double literal.
            rendered.append(
                [
                    "array(" + ", ".join(f"{float(x)!r}D" for x in v) + ")"
                    for v in vals
                ]
            )
        else:
            return None
    return ", ".join(
        "struct("
        + ", ".join(f"{cell} AS `{n}`" for cell, n in zip(row, names))
        + ")"
        for row in zip(*rendered)
    )


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
    structs_sql = _render_sql_cells(rows, names)
    if structs_sql is not None:
        return spark.range(1).selectExpr(f"inline(array({structs_sql}))")
    structs = [
        F.struct(*[F.lit(v).alias(n) for v, n in zip(row, names)])
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("__s"))
        .select(*[F.col(f"__s.{n}").alias(n) for n in names])
    )
