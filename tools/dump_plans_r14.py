#!/usr/bin/env python
"""Dump `explain formatted` plans for named queries into plans/r14/
as <query>_<suffix>.txt — the optimization round's before/after plan
evidence (OPTIMIZATION_r14.md).

Usage: python tools/dump_plans_r14.py <suffix> <query> [<query> ...]

Repaired vs the r13 tool (VERDICT r13 #7): checkpoint-terminated
queries (simhash, MMR, Lloyd consumers, ...) used to dump as a useless
8-line `Scan ExistingRDD` stub because the final localCheckpoint severs
the tree.  With ``--nocheckpoint`` this tool makes every
DataFrame.localCheckpoint an identity (plan-shape no-op) while the
query FUNCTION builds, so the dump shows the real operator tree feeding
each checkpoint.  The dumped plan is therefore the PRE-materialization
logical shape: multi-referenced frames re-expand textually in it (the
checkpoints exist precisely to stop that at runtime), so Exchange/scan
COUNTS in a --nocheckpoint dump overstate executed work — read the
shape, not the counts, and compare like with like (both dumps taken in
the same mode).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducer_spark.plans import formatted_plan  # noqa: E402
from mapreducer_spark.registry import all_queries  # noqa: E402
from mapreducer_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--nocheckpoint"]
    nocheckpoint = "--nocheckpoint" in sys.argv[1:]
    suffix = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="dump-plans-r14",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    if nocheckpoint:
        # Patch the RUNTIME DataFrame class (Spark 4's classic session
        # returns pyspark.sql.classic.dataframe.DataFrame, which
        # overrides the base method — patching pyspark.sql.DataFrame
        # alone silently does nothing).
        runtime_cls = type(spark.range(1))
        runtime_cls.localCheckpoint = (  # type: ignore[method-assign]
            lambda self, eager=True: self
        )
    qs = all_queries()
    for name in names:
        from mapreducer_spark.functions.memo import clear_session_caches

        clear_session_caches()
        df = qs[name].fn(spark, sf_dir)
        mode = "_nocp" if nocheckpoint else ""
        path = os.path.join(out_dir, f"{name}_{suffix}{mode}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
