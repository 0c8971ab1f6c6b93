"""Registry-wide survey of executed-plan BroadcastExchange sizes.

The unbounded-broadcast class: an explicit F.broadcast() hint on a
frame that GROWS with the data ships the whole dimension to every
executor at 100 TB (auto-broadcasts degrade gracefully — Spark's stats
stop choosing them).  Methodology mirrors tools/window_survey.py: run
every query at two scales, record max broadcast rows, and diff — a
frame whose broadcast size scales ~linearly with sf is a grower; cross-
reference growers against explicit F.broadcast sites before adjudicating.

Usage: python tools/broadcast_survey.py <sf_dir> <out_jsonl> [start [end]]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducer_spark.plans.inspect import broadcast_exchange_rows
from mapreducer_spark.registry import all_queries
from mapreducer_spark.session import get_spark


def main() -> None:
    # --hints-only: disable stats-driven auto-broadcast so every
    # BroadcastExchange left in the executed plan comes from an explicit
    # F.broadcast() hint (or a broadcast-NL cross join) — the sites that
    # do NOT degrade gracefully when the frame grows.
    args = [a for a in sys.argv[1:] if a != "--hints-only"]
    hints_only = "--hints-only" in sys.argv
    sf_dir = args[0]
    out_path = args[1]
    names = sorted(all_queries())
    start = int(args[2]) if len(args) > 2 else 0
    end = int(args[3]) if len(args) > 3 else len(names)
    spark = get_spark(
        app_name="broadcast-survey",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_PROBE_MEM", "24g"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if hints_only:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    qs = all_queries()
    with open(out_path, "a") as out:
        for name in names[start:end]:
            t0 = time.time()
            try:
                df = qs[name].fn(spark, sf_dir)
                df.collect()
                rows = broadcast_exchange_rows(df)
                rec = {
                    "name": name,
                    "broadcasts": rows,
                    "sec": round(time.time() - t0, 2),
                }
            except Exception as e:  # noqa: BLE001 — survey, record and go on
                rec = {"name": name, "error": str(e)[:200]}
            out.write(json.dumps(rec) + "\n")
            out.flush()
    spark.stop()


if __name__ == "__main__":
    main()
