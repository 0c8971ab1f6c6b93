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
    # machinery, AQE) so the alphabetically-first timed query doesn't pay
    # residual warmup.
    from mapreducer_spark.operators.wordcount import word_count_df
    from mapreducer_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    word_count_df(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name, q in sorted(queries.items()):
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
