#!/usr/bin/env python
"""Focused A/B bench for a query family — the quiet-host re-measure
tool VERDICT r7 #2 asks for (driver-to-driver bench drift in the IVF /
profile-similarity families trended up two rounds with the code
untouched; settle noise-vs-regression with back-to-back runs on a
quiet host).

Mirrors bench.py's methodology exactly (same session factory, same
warmers, same noop-sink timing) but over a named subset, run N passes
back-to-back so co-tenant bursts show up as pass-to-pass variance
instead of silently skewing one number.

Usage: python tools/bench_family.py [--passes N] query [query ...]
Prints one JSON line: {"sf": ..., "passes": [{name: sec}, ...],
"min": {name: sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducer_spark.registry import all_queries  # noqa: E402
from mapreducer_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--cold",
        action="store_true",
        help="clear session memo caches before every timed query "
        "(bench.py's policy) so each number is the query's own cost",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench-family",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

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

    from mapreducer_spark.functions.memo import clear_session_caches

    qs = all_queries()
    passes: list[dict[str, float]] = []
    for _ in range(args.passes):
        timings: dict[str, float] = {}
        for name in args.queries:
            if args.cold:
                clear_session_caches()
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 3)
        passes.append(timings)
    best = {
        name: min(p[name] for p in passes) for name in args.queries
    }
    print(
        json.dumps(
            {"sf_dir": sf_dir, "passes": passes, "min": best},
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
