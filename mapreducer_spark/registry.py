"""Declarative query registry.

Every operator family in SURVEY.md §2 contributes named queries here; each
query pairs a Spark implementation ``(spark, sf_dir) -> DataFrame`` with
the equivalent DuckDB oracle SQL (or ``None`` for ops SQL can't express —
those get the driver's weaker rows-only check).

Keeping the Spark code and the oracle side by side in one object is the
whole correctness strategy: the two must alias every computed column to
the same name (the driver sorts columns by name before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the global registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import operator modules for their registration side effects.
    from mapreducer_spark import operators  # noqa: F401

    return REGISTRY
