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


def test_rate_source_smoke(spark):
    """The rate source (readStream format=rate) — the built-in synthetic
    stream for load/liveness testing; drains a couple of micro-batches
    into memory and checks monotonically increasing values."""
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM rate_smoke").collect()[0].c
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
        vals = [r.value for r in spark.sql("SELECT value FROM rate_smoke").collect()]
        assert len(set(vals)) == len(vals)
    finally:
        q.stop()


def test_corrupt_json_permissive(spark):
    """from_json malformed-record behavior: bad JSON yields NULL struct
    (the PERMISSIVE contract) instead of failing the job — the ingest
    robustness twin of the props_schema_validation gate."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"k": 1}',), ("not json",), (None,), ('{"k": "x"}',)], ["props"]
    )
    parsed = df.select(
        F.from_json("props", "k BIGINT").alias("p"),
        F.get_json_object("props", "$.k").alias("raw_k"),
    )
    rows = parsed.collect()
    assert rows[0].p.k == 1
    assert rows[1].p.k is None        # malformed -> all-NULL struct fields
    assert rows[1].raw_k is None
    assert rows[2].p is None          # NULL in -> NULL out
    assert rows[3].p.k is None        # wrong type -> NULL field


def test_transform_with_state_matches_batch(spark, sf_dir):
    """Spark 4 transformWithStateInPandas running-max == batch groupBy max.

    The transformWithState wire protocol needs google.protobuf, which
    this container does not ship (no pip installs) — skip there; the
    operator itself (streaming/jobs.py::top_value_per_user_stream) is
    complete and runs wherever protobuf is present.
    """
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from mapreducer_spark.sources import load_table
    from mapreducer_spark.streaming.jobs import top_value_per_user_stream

    stream = top_value_per_user_stream(read_events_stream(spark, sf_dir))
    name, _ = run_stream_to_memory(stream, output_mode="update")
    got = {
        r.user_id: r.max_value
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        r.user_id: r.mx
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("value").alias("mx"))
        .collect()
    }
    assert got == want


def test_stream_left_outer_join_equals_batch_up_to_watermark(spark, sf_dir):
    """Left-outer stream-stream join parity: matched rows equal the
    batch twin exactly; NULL-extended (abandoned) clicks equal the batch
    twin's unmatched set RESTRICTED to clicks whose join window fully
    expired before the final watermark — younger clicks legitimately
    stay buffered when the source drains (a purchase could still have
    arrived), so asserting full equality would be asserting the wrong
    semantics."""
    import datetime as dt

    from mapreducer_spark.sources import load_table
    from mapreducer_spark.streaming.jobs import click_abandonment_stream

    stream = click_abandonment_stream(
        read_events_stream(spark, sf_dir), read_events_stream(spark, sf_dir)
    )
    name, _ = run_stream_to_memory(stream, output_mode="append")
    got = spark.sql(f"SELECT * FROM {name}").collect()
    got_matched = {
        (r.user_id, r.click_id, r.purchase_id, r.secs_to_purchase)
        for r in got
        if r.purchase_id is not None
    }
    got_abandoned = {r.click_id for r in got if r.purchase_id is None}

    e = load_table(spark, sf_dir, "events")
    want = click_abandonment_stream(e, e).collect()
    want_matched = {
        (r.user_id, r.click_id, r.purchase_id, r.secs_to_purchase)
        for r in want
        if r.purchase_id is not None
    }
    assert got_matched == want_matched and len(got_matched) > 0

    # Global join watermark = min over BOTH inputs' (max event time -
    # delay); a click/view event later than the last purchase does not
    # advance the purchase side.
    max_click = max(
        r.ts for r in e.where(F.col("event_type") == "click").select("ts").collect()
    )
    max_purch = max(
        r.ts
        for r in e.where(F.col("event_type") == "purchase").select("ts").collect()
    )
    final_wm = min(max_click, max_purch) - dt.timedelta(hours=1)
    horizon = dt.timedelta(minutes=30)
    want_abandoned_flushed = {
        r.click_id
        for r in want
        if r.purchase_id is None and r.click_ts + horizon < final_wm
    }
    assert want_abandoned_flushed  # the bound must actually bite
    assert got_abandoned >= want_abandoned_flushed
    # and nothing emitted as abandoned that the batch twin matched
    assert not (got_abandoned & {c for (_, c, _, _) in want_matched})


def test_streaming_observed_metrics_reach_listener(spark, sf_dir):
    """df.observe(...) on a streaming frame must surface its per-batch
    metric rows through StreamingQueryListener progress — the wiring a
    production job uses for custom counters (batch side of the same
    API: plans/metrics.py::observe_counts)."""
    from mapreducer_spark.streaming.jobs import BatchMetricsListener

    listener = BatchMetricsListener().attach(spark)
    try:
        src = read_events_stream(spark, sf_dir).observe(
            "event_counters",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value")).alias("total_value"),
        )
        agg = src.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        name, _ = run_stream_to_memory(agg, output_mode="complete")
        batches = listener.wait_for_batches(1)
        observed = [
            b["observed"]["event_counters"]
            for b in batches
            if b["observed"].get("event_counters")
            and b["observed"]["event_counters"].get("n_rows")
        ]
        assert observed, batches
        total_rows = sum(o["n_rows"] for o in observed)
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert total_rows == n_events
    finally:
        listener.detach(spark)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Event-time semantics under LATE data, including the subtlety the
    docs gloss over: the watermark is a LOWER BOUND on dropping, not an
    instant cutoff.  A late row that arrives while its window's state is
    still alive (batch 2 here — eviction for window W happens in the
    state-cleanup phase of the batch whose watermark passed W.end) is
    STILL MERGED; only rows arriving after eviction are discarded.  The
    test pins both halves: the pre-eviction late row counts, the
    post-eviction one does not.  (The driver's batch oracles can't see
    this — it is pure streaming-state behavior.)"""
    import datetime as dt
    import time

    src = str(tmp_path / "late_src")
    base = dt.datetime(2024, 3, 1, 0, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long"
        )

    # File 1: two rows in window 00:00 plus a 12:00 row -> watermark
    # becomes 11:00 after this batch.
    mk(
        [
            (1, base + dt.timedelta(minutes=10), 1),
            (2, base + dt.timedelta(minutes=20), 2),
            (3, base + dt.timedelta(hours=12), 3),
        ]
    ).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)  # distinct mod-times keep file order deterministic
    # File 2: a late row for window 00:00 arriving BEFORE that window's
    # state eviction -> merged (watermark 11:00 already, state alive).
    mk([(4, base + dt.timedelta(minutes=30), 4)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    # File 3: another late row for window 00:00 arriving AFTER batch 2's
    # cleanup evicted it -> dropped.
    mk(
        [
            (5, base + dt.timedelta(minutes=40), 5),
            (6, base + dt.timedelta(hours=13), 6),
        ]
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )
    name, _ = run_stream_to_memory(stream, output_mode="append")
    got = {r.w_start: r.n for r in spark.sql(f"SELECT * FROM {name}").collect()}
    # Window 00:00 closed with rows 1, 2 and the pre-eviction late row 4;
    # the post-eviction late row 5 must NOT appear (a batch groupBy
    # would count 4).
    assert got.get(base) == 3, got


def test_streaming_bloom_bitmap_equals_batch(spark, sf_dir):
    """The streaming Bloom bitmap (fixed geometry, no distinct — Bloom
    insertion is idempotent) drained over the documents fixture must
    equal the batch bitmap built over the DISTINCT bench grams with the
    same m_bits, word for word."""
    from pyspark.sql import functions as F

    from mapreducer_spark.operators.curation import _BENCH_SOURCE
    from mapreducer_spark.operators.sketches import (
        bloom_bitmap,
        doc_gram_frame,
    )
    from mapreducer_spark.sources import load_table
    from mapreducer_spark.streaming.jobs import (
        bloom_words_stream,
        read_documents_stream,
        run_stream_to_memory,
    )

    m_bits = 4096
    name, q = run_stream_to_memory(
        bloom_words_stream(read_documents_stream(spark, sf_dir), m_bits)
    )
    try:
        streamed = {r.word_idx: r.word for r in spark.table(name).collect()}
    finally:
        q.stop()
    params = spark.range(1).select(F.lit(m_bits).cast("long").alias("m_bits"))
    bench = (
        doc_gram_frame(load_table(spark, sf_dir, "documents"))
        .where(F.col("source") == _BENCH_SOURCE)
        .select("gram")
        .distinct()
    )
    batch = {r.word_idx: r.word for r in bloom_bitmap(bench, params).collect()}
    assert streamed == batch
    assert streamed  # non-vacuous: some words must have bits set


def test_streaming_cms_grid_equals_batch(spark, sf_dir):
    """The streaming CMS sketch (constant-size state: the 4 x 64 counter
    grid) drained over the fixture must equal the batch sketch cell for
    cell — sketch-building is pure mergeable aggregation, so batch/
    stream parity is exact, not approximate."""
    from mapreducer_spark.operators.sketches import cms_cells
    from mapreducer_spark.sources import load_table
    from mapreducer_spark.streaming.jobs import (
        cms_cells_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    name, q = run_stream_to_memory(
        cms_cells_stream(read_events_stream(spark, sf_dir))
    )
    try:
        streamed = {
            (r.j, r.cell): r.cnt for r in spark.table(name).collect()
        }
    finally:
        q.stop()
    batch = {
        (r.j, r.cell): r.cnt
        for r in cms_cells(
            load_table(spark, sf_dir, "events").select("user_id")
        ).collect()
    }
    assert streamed == batch


def test_rolling_wau_matches_pure_python_reference(spark, sf_dir):
    """Brute-force parity for the fan-out WAU: per report day, the
    distinct users with >= 1 event in the trailing 7 days, computed
    naively in Python over the raw events."""
    import datetime as dt
    from collections import defaultdict

    from mapreducer_spark.operators.events_time import (
        _WAU_WINDOW_DAYS,
        rolling_weekly_active_users,
    )
    from mapreducer_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("ts", "user_id")
        .collect()
    )
    by_day = defaultdict(set)
    for r in rows:
        by_day[r.ts.date()].add(r.user_id)
    days = sorted(by_day)
    expected = {}
    all_report_days = set()
    for d in days:
        for k in range(_WAU_WINDOW_DAYS):
            all_report_days.add(d + dt.timedelta(days=k))
    max_day = max(days)
    for rd in sorted(all_report_days):
        if rd > max_day:
            continue
        users = set()
        for k in range(_WAU_WINDOW_DAYS):
            users |= by_day.get(rd - dt.timedelta(days=k), set())
        expected[rd] = len(users)

    got = {
        r.report_day: r.active_users
        for r in rolling_weekly_active_users(spark, sf_dir).collect()
    }
    assert got == expected
