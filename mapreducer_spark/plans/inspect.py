"""Plan-inspection helpers — the 100 TB posture is TESTED, not assumed.

tests/test_plans.py uses these to assert that filters reach the parquet
scan (PushedFilters), projections prune columns (ReadSchema), and dim
joins broadcast instead of shuffling.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (explain() only prints)."""
    qe = df._jdf.queryExecution()  # type: ignore[attr-defined]
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan — runs the query.  Under AQE the
    pre-execution plan is just 'AdaptiveSparkPlan isFinalPlan=false';
    codegen spans and runtime join choices only exist after execution."""
    # Execute through the Dataset's own QueryExecution (a write would
    # create a separate one and leave this plan un-finalized).
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
