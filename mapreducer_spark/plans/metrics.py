"""Runtime metrics extraction — observability for the engine.

Two complementary tools:

- ``observe_counts``: attach named aggregate observations to a DataFrame
  (Spark's ``observe`` API) — zero-cost streaming-safe metrics collected
  during the SAME execution, no second pass.
- ``node_metrics``: after execution, walk the final (post-AQE) physical
  plan and report per-operator SQL metrics (rows output, spill sizes…)
  — what you'd read off the Spark UI, programmatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach row-count + null-free observation; read after an action:

        df2, obs = observe_counts(df)
        df2.collect(); obs.get  # {'n_rows': ...}
    """
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs


def node_metrics(df: DataFrame) -> list[dict]:
    """Execute ``df`` and return [{node, metric, value}] from the final
    physical plan (post-AQE)."""
    df.collect()
    qe = df._jdf.queryExecution()  # type: ignore[attr-defined]
    out: list[dict] = []

    def walk(node) -> None:
        name = node.nodeName()
        metrics = node.metrics()
        it = metrics.iterator()
        while it.hasNext():
            kv = it.next()
            out.append(
                {
                    "node": name,
                    "metric": kv._1(),
                    "value": kv._2().value(),
                }
            )
        children = node.children().iterator()
        while children.hasNext():
            walk(children.next())
        # AQE wraps finished stages; descend into materialized subtrees.
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        elif name.endswith("QueryStage"):
            walk(node.plan())

    walk(qe.executedPlan())
    return out


def scan_output_rows(df: DataFrame) -> int:
    """Rows produced by the (first) file scan — how much partition
    pruning / row-group skipping actually let through.  (Row-group
    granularity: a pushed filter on an unsorted single-row-group file
    still reads every row; partitioned layouts are what make this drop.)
    """
    for m in node_metrics(df):
        if "Scan" in m["node"] and m["metric"] == "numOutputRows":
            return int(m["value"])
    raise ValueError("no scan node with numOutputRows metric found")
