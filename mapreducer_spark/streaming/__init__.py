from mapreducer_spark.streaming.jobs import (
    read_events_stream,
    run_stream_to_memory,
    sessionized_stream,
    stateful_user_counts,
    windowed_counts_stream,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "sessionized_stream",
    "stateful_user_counts",
    "windowed_counts_stream",
]
