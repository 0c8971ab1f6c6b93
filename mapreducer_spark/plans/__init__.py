from mapreducer_spark.plans.inspect import (
    executed_plan,
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "has_broadcast_hash_join",
    "pushed_filters",
]
