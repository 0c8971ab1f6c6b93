#!/usr/bin/env python
"""Skew rehearsal: MEASURE what a hot key does to a shuffle join and
what the two mitigations (AQE skew-join splitting, explicit salting)
buy, instead of asserting plan shapes alone.

Builds a pathologically skewed fact table in memory (N rows, ``hot``
fraction all carrying ONE key, the rest uniform over 100k keys), joins
it to a small-but-not-broadcastable dim (broadcast threshold forced to
-1 so the shuffle join actually happens), and times three plans that
all produce identical results:

  plain      sort-merge join, AQE skew handling OFF  — the naive plan
  aqe        same join, AQE skewJoin ON              — runtime splitting
  salted     functions.agg.salted_join               — explicit rewrite

Emits one JSON line:
  {"rows": N, "hot_frac": f, "timings_sec": {...}, "rows_out": {...}}

Run: python tools/skew_probe.py [n_rows] [hot_frac]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreducer_spark.functions.agg import salted_join  # noqa: E402
from mapreducer_spark.session import get_spark  # noqa: E402

N_KEYS = 100_000
HOT_KEY = 7


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark(
        app_name="skew-probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Force the real shuffle join: no broadcast escape hatch.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )

    fact = (
        spark.range(n_rows)
        .select(
            F.when(
                (F.col("id") % 1_000_000) < int(hot_frac * 1_000_000),
                F.lit(HOT_KEY),
            )
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
            .cast("long")
            .alias("k"),
            (F.col("id") % 1000).cast("long").alias("v"),
        )
        .localCheckpoint(eager=True)  # timings exclude input generation
    )
    # salted_join's contract wants distinct key names (fact.k == dim.dk).
    dim = (
        spark.range(N_KEYS)
        .select(
            F.col("id").alias("dk"), (F.col("id") * 3).cast("long").alias("w")
        )
        .localCheckpoint(eager=True)
    )

    def timed(label: str, build) -> tuple[float, int]:
        best, rows = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            df = build()
            rows = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3), rows

    def plain():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        return (
            fact.join(dim, fact["k"] == dim["dk"])
            .groupBy("k")
            .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        )

    def aqe():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # skew splitting only kicks in past these bounds; the defaults
        # (256 MB) are tuned for executor-sized partitions, not a local
        # probe, so scale them to the probe's data volume.
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB"
        )
        return (
            fact.join(dim, fact["k"] == dim["dk"])
            .groupBy("k")
            .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        )

    def salted():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        return (
            salted_join(fact, dim, "k", "dk", n_salts=32, tiebreaker="v")
            .groupBy("k")
            .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        )

    timings, rows_out = {}, {}
    for label, build in [("plain", plain), ("aqe", aqe), ("salted", salted)]:
        timings[label], rows_out[label] = timed(label, build)

    assert len(set(rows_out.values())) == 1, f"result drift: {rows_out}"
    print(
        json.dumps(
            {
                "rows": n_rows,
                "hot_frac": hot_frac,
                "hot_key_rows": int(hot_frac * n_rows),
                "timings_sec": timings,
                "rows_out": rows_out["plain"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
