"""Streaming twins must agree with their batch (oracle-checked) forms —
the checked surface per SURVEY.md §2.9/§7.4.5."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducer_spark.operators.events_time import events_tumbling_daily
from mapreducer_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    sessionized_stream,
    stateful_user_counts,
    windowed_counts_stream,
)


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = windowed_counts_stream(read_events_stream(spark, sf_dir))
    name, _ = run_stream_to_memory(stream, output_mode="complete")
    got = {
        (r.w_start, r.event_type): r.n_events
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.w_start, r.event_type): r.n_events
        for r in events_tumbling_daily(spark, sf_dir)
        .select("w_start", "event_type", "n_events")
        .collect()
    }
    assert got == want


def test_stream_sessions_run(spark, sf_dir):
    stream = sessionized_stream(read_events_stream(spark, sf_dir))
    name, _ = run_stream_to_memory(stream, output_mode="complete")
    n = spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c
    assert n > 0


def test_stateful_counts_match_batch(spark, sf_dir):
    stream = stateful_user_counts(read_events_stream(spark, sf_dir))
    name, _ = run_stream_to_memory(stream, output_mode="update")
    # update-mode memory sink keeps every emitted row; the LAST row per
    # user is the final state.  With AvailableNow + one input file there
    # is one batch, so rows are already final.
    got = {
        r.user_id: r.n_events for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    events = read_events_stream(spark, sf_dir)  # reuse schema path; batch read:
    from mapreducer_spark.sources import load_table

    want = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_stream_join_equals_batch(spark, sf_dir):
    from mapreducer_spark.sources import load_table
    from mapreducer_spark.streaming.jobs import click_purchase_join_stream

    stream = click_purchase_join_stream(
        read_events_stream(spark, sf_dir), read_events_stream(spark, sf_dir)
    )
    name, _ = run_stream_to_memory(stream, output_mode="append")
    got = {
        (r.user_id, r.click_id, r.purchase_id, r.secs_to_purchase)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # Batch twin: same join, plain DataFrames.
    e = load_table(spark, sf_dir, "events")
    want = {
        (r.user_id, r.click_id, r.purchase_id, r.secs_to_purchase)
        for r in click_purchase_join_stream(e, e).collect()
    }
    assert got == want and len(got) > 0
