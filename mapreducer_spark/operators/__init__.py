"""Operator modules register their queries on import (registry.py)."""

from mapreducer_spark.operators import (  # noqa: F401
    asof,
    events_time,
    relational,
    scalars,
    windows,
    wordcount,
)
