#!/usr/bin/env python
"""Per-query cost decomposition for the optimization round: for each
named query, time fn() CONSTRUCTION (driver-coordinated work: eager
checkpoints, metadata collects, Lloyd/greedy rounds) separately from
the noop-sink EXECUTION of the returned frame, and count executed jobs.

Build-heavy queries need driver-round-trip surgery (fold/pin work);
exec-heavy queries need plan surgery (shuffles, replication, joins).

Usage: python tools/profile_queries_r13.py query [query ...]
Prints one JSON line per query: {"query", "build_sec", "exec_sec",
"jobs"} — bench.py methodology (same session factory, warmers, cold
memos per query).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducer_spark.registry import all_queries  # noqa: E402
from mapreducer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile-r13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreducer_spark.functions.memo import clear_session_caches
    from mapreducer_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    qs = all_queries()
    tracker = spark.sparkContext.statusTracker()
    for name in sys.argv[1:]:
        q = qs[name]
        clear_session_caches()
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        print(
            json.dumps(
                {
                    "query": name,
                    "build_sec": round(t1 - t0, 3),
                    "exec_sec": round(t2 - t1, 3),
                    "jobs": j1 - j0,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
