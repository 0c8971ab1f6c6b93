"""Round-10 FULL-registry 10x sweep (VERDICT r9 #3).

The r9 default sweep covered 205 of 318 names (every never-driver-sampled
name); this runs the WHOLE registry so no name lacks a current 10x row:

- default leg: every oracle-backed query except the frozen-index
  families (their oracles must render 10x centroid literals — separate
  leg) and the three adjudicated exclusions below — appended to
  tools/oracle_at_scale_r10b_default_run.jsonl;
- frozen leg (run with SPARK_GRAFT_ORACLE_SF=<repo>/.scale10/sf1):
  the ann_*/ivf_*/semdedup names — oracle_at_scale_r10b_frozen_run.jsonl;
- rows-only leg: the no-oracle queries (HLL, xxhash64 LSH) plus the
  adjudicated oracle-side exclusions (neardup_clusters /
  corpus_after_neardup_dedup: DuckDB re-inlines the pair CTE into every
  recursive step, minutes per step at 10x — Spark side is probed in
  tools/probe_sweep2_r6.jsonl; user_activity_similarity_blocked: the
  LSH bit resolution legitimately adapts away from the gate-rendered
  oracle at 10x).  These execute at 10x under the scan + window budgets
  and record row counts — oracle_at_scale_r10b_rowsonly_run.jsonl.

Usage: python tools/sweep_r10b.py {default|frozen|rowsonly} [start [end]]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducer_spark.oracle import assert_matches_oracle  # noqa: E402
from mapreducer_spark.registry import all_queries  # noqa: E402
from mapreducer_spark.session import get_spark  # noqa: E402

SCALE10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale10",
    "sf1",
)

FROZEN_PREFIXES = ("ann_ivf", "ann_pq", "ann_index", "ivf_", "semdedup")
ORACLE_EXCLUDED = {
    "neardup_clusters",
    "corpus_after_neardup_dedup",
    "user_activity_similarity_blocked",
}


def legs() -> dict[str, list[str]]:
    qs = all_queries()
    default, frozen, rowsonly = [], [], []
    for name in sorted(qs):
        if qs[name].oracle is None or name in ORACLE_EXCLUDED:
            rowsonly.append(name)
        elif name.startswith(FROZEN_PREFIXES):
            frozen.append(name)
        else:
            default.append(name)
    return {"default": default, "frozen": frozen, "rowsonly": rowsonly}


def main() -> None:
    leg = sys.argv[1]
    names = legs()[leg]
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    end = int(sys.argv[3]) if len(sys.argv) > 3 else len(names)
    names = names[start:end]
    out_path = os.path.join(
        os.path.dirname(__file__), f"oracle_at_scale_r10b_{leg}_run.jsonl"
    )
    spark = get_spark(
        app_name=f"sweep-r10-{leg}",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_PROBE_MEM", "24g"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    with open(out_path, "a") as out:
        for name in names:
            t0 = time.perf_counter()
            if leg == "rowsonly":
                from mapreducer_spark.plans.inspect import (
                    MAX_EXECUTED_SCANS_PER_TABLE,
                    UNPARTITIONED_WINDOW_MAX_ROWS,
                    executed_filescan_counts,
                    unpartitioned_window_input_rows,
                )

                try:
                    df = qs[name].fn(spark, SCALE10)
                    n = len(df.collect())
                    assert all(
                        v <= MAX_EXECUTED_SCANS_PER_TABLE
                        for v in executed_filescan_counts(df).values()
                    ), "scan budget"
                    assert all(
                        0 <= v <= UNPARTITIONED_WINDOW_MAX_ROWS
                        for v in unpartitioned_window_input_rows(df)
                    ), "window budget"
                    status = f"rows-only OK ({n} rows)"
                except Exception as exc:  # noqa: BLE001
                    status = f"ERR: {str(exc)[:200]}"
            else:
                try:
                    assert_matches_oracle(spark, qs[name], SCALE10)
                    status = "MATCH"
                except AssertionError as exc:
                    status = f"MISMATCH: {str(exc)[:200]}"
            row = {
                "query": name,
                "sf": "10x-sf0.1",
                "status": status,
                "sec": round(time.perf_counter() - t0, 1),
            }
            out.write(json.dumps(row) + "\n")
            out.flush()
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
