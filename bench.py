#!/usr/bin/env python
"""Benchmark harness — runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing counts full execution (collect to the driver via count+write-less
materialization): we force computation with ``df.write.format('noop')``
which executes the whole plan without sink cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreducer_spark.registry import all_queries  # noqa: E402
from mapreducer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Strict order parsing, BEFORE any Spark work (ADVICE r11):
    # 'shuffle'/'Shuffled'/etc. must ERROR immediately, not silently run
    # sorted order and skew an intended A/B.
    order_env = os.environ.get("SPARK_GRAFT_BENCH_ORDER", "")
    shuffle_seed: int | None = None
    if order_env in ("", "sorted"):
        order_desc = "sorted"
    elif order_env == "shuffled" or (
        order_env.startswith("shuffled:")
        and order_env.split(":", 1)[1].isdigit()
    ):
        shuffle_seed = int(order_env.split(":")[1]) if ":" in order_env else 0
        order_desc = f"shuffled:{shuffle_seed}"
    else:
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_ORDER={order_env!r} not recognized — "
            "use '', 'sorted', 'shuffled' or 'shuffled:<seed>'"
        )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(
        app_name="mapreducer-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("WARN")

    # MLlib-tagged queries are library-parity demos of operators whose
    # production implementations (dedup_minhash_lsh, ann_ivf_topk) are
    # already benched; the MLlib approxSimilarityJoin is ~10x slower by
    # construction and would only measure MLlib, not this engine.
    queries = {
        n: q for n, q in all_queries().items() if "mllib" not in q.tags
    }
    timings: dict[str, float] = {}

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plan, not session startup; run one full query (codegen, shuffle
    # machinery, AQE) plus a generic join+window+explode warmer so the
    # first timed query of each operator family doesn't pay the one-time
    # whole-stage-codegen compile for that machinery.  (Measured: the
    # first window+join-heavy query in a cold session runs ~2x its warm
    # time purely from JIT/codegen.)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreducer_spark.operators.wordcount import word_count_df
    from mapreducer_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    word_count_df(spark, sf_dir).write.format("noop").mode("overwrite").save()
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(F.explode(F.array("l_quantity", "l_discount")).alias("x"))
        .groupBy()
        .agg(F.sum("x"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    import gc

    from mapreducer_spark.functions.memo import clear_session_caches

    # Per-query numbers are COLD: session memos (shared pair graphs, BPE
    # segmentation, Lloyd artifacts, ...) are cleared before every timed
    # query, so each value is that query's own cost, reproducible under
    # any execution order (VERDICT r10 #2 — a memo warmed by an earlier
    # query made neardup_clusters read 0.143 s, an ordering artifact the
    # 2x gate then consumed).  SPARK_GRAFT_BENCH_ORDER=shuffled:<seed>
    # runs the same set in a seeded shuffle for the order-independence A/B.
    ordered = sorted(queries.items())
    if shuffle_seed is not None:
        import random

        random.Random(shuffle_seed).shuffle(ordered)
    print(f"bench order: {order_desc} ({len(ordered)} queries)", file=sys.stderr)

    def _time_once(q) -> float:
        # cold per query: session memos cleared before EVERY rep, so the
        # reading is the query's own cost (VERDICT r10 #2).  The local df
        # ref dies with this frame — see the gc note below.
        clear_session_caches()
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        del df
        return round(time.perf_counter() - t0, 3)

    # First readings carry session-position JIT/codegen variance (order
    # A/B r11: the same query read 8.3 s third-in-order vs 1.4 s late;
    # p10/p90 order-ratio 0.63/1.34).  For the slow tail — where that
    # variance actually moves the total — re-time once (memos cleared
    # again, still cold) and report min-of-2: the steady-state cold cost,
    # with the first readings kept alongside for transparency
    # (VERDICT r11 #3).  Threshold 2.5 s: at r11 numbers that re-times
    # ~60/328 queries (~1/5 of wall added, most of the variance removed).
    _RETIME_OVER_SEC = 2.5
    first_pass: dict[str, float] = {}
    # Explicit retime population (ADVICE r12): a retimed query whose
    # SECOND rep was slower keeps its first reading, so inferring the
    # population from first_pass != timings under-reports it — record
    # both readings for every retimed query instead.
    retimed_reps: dict[str, list[float]] = {}

    for i, (name, q) in enumerate(ordered):
        t = _time_once(q)
        first_pass[name] = t
        if t > _RETIME_OVER_SEC:
            t2 = _time_once(q)
            retimed_reps[name] = [t, t2]
            t = min(t, t2)
        timings[name] = t
        # Drop the Python-side DataFrame refs and periodically break
        # reference CYCLES so Spark's ContextCleaner can reclaim
        # localCheckpoint blocks between queries: with 260+ queries in
        # one session, lazily-collected cyclic refs pinned enough
        # block-manager memory that late-alphabet queries ran ~1.5x
        # slower than early ones (measured corr 0.53 between run
        # position and inflation; a per-query full gc flattened it to
        # -0.07 — SURVEY §8 r8).  Every 16 queries bounds the
        # accumulation without paying ~260 full collections.
        if i % 16 == 15:
            gc.collect()

    total = round(sum(timings.values()), 3)

    # The driver captures only the TAIL of stdout (~2 KB) and parses the
    # last line: round 1's full per-query dict (~2.5 KB for 73 queries)
    # overflowed the window and the line arrived truncated -> unparseable.
    # Emit a line guaranteed to fit (full dict if it fits, else the
    # slowest queries — the perf-relevant ones) and write the complete
    # timings to bench_full.json alongside this script.
    full = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": sf_val,
        "order": order_desc,
        "timing_policy": (
            "cold per query (memos cleared each rep); min-of-2 for "
            f"queries whose first reading exceeded {_RETIME_OVER_SEC}s"
        ),
        "retimed_reps": {n: retimed_reps[n] for n in sorted(retimed_reps)},
        "first_pass_total_sec": round(sum(first_pass.values()), 3),
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json"),
        "w",
    ) as f:
        json.dump(full, f, indent=1, sort_keys=True)

    # stdout line: keep it small — the per-rep detail lives only in
    # bench_full.json
    slim = {k: v for k, v in full.items() if k != "retimed_reps"}
    line = json.dumps(slim, separators=(",", ":"))
    budget = 1600
    if len(line) > budget:
        payload = dict(slim)
        payload["queries_note"] = (
            f"slowest NNN/{len(timings)}; full set in bench_full.json"
        )
        shown: dict[str, float] = {}
        for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
            trial = dict(payload, queries=dict(shown, **{name: sec}))
            if len(json.dumps(trial, separators=(",", ":"))) > budget:
                break
            shown[name] = sec
        payload["queries"] = shown
        payload["queries_note"] = (
            f"slowest {len(shown)}/{len(timings)}; full set in bench_full.json"
        )
        line = json.dumps(payload, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
