from mapreducer_spark.streaming.jobs import (
    BatchMetricsListener,
    deduped_stream,
    read_documents_stream,
    read_events_stream,
    run_foreach_batch_upsert,
    run_quality_router,
    run_stream_to_memory,
    run_windowed_to_parquet,
    sessionized_stream,
    stateful_user_counts,
    windowed_counts_stream,
)

__all__ = [
    "BatchMetricsListener",
    "deduped_stream",
    "read_documents_stream",
    "read_events_stream",
    "run_foreach_batch_upsert",
    "run_quality_router",
    "run_stream_to_memory",
    "run_windowed_to_parquet",
    "sessionized_stream",
    "stateful_user_counts",
    "windowed_counts_stream",
]
