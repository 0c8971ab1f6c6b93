"""Operator modules register their queries on import (registry.py)."""

from mapreducer_spark.operators import (  # noqa: F401
    asof,
    clustering,
    curation,
    dedup,
    events_time,
    frames_maps,
    mllib_lsh,
    multimodal,
    profiling,
    python_udfs,
    relational,
    reshape,
    scalars,
    sessions,
    similarity,
    textstats,
    tpch_more,
    windows,
    wordcount,
)
