"""Operator modules register their queries on import (registry.py)."""

from mapreducer_spark.operators import wordcount  # noqa: F401
