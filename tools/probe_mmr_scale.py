#!/usr/bin/env python
"""MMR re-rank scale probe (VERDICT r11 #4): prove the greedy re-rank
stage stays flat as the QUERY SET grows 100x.

The MMR pool is queries x k rows and the pairwise stage queries x k^2 —
both "metadata-sized" only while the query count is small.  This probe
grows n_queries 5 -> 50 -> 500 (100x) over the fixture embeddings,
builds the brute-force pool at each size, and times the RE-RANK stage
(pairwise + k greedy rounds) separately from the pool build.  The claim
under test: re-rank cost is O(queries x k^2) with a flat-or-falling
per-pair cost — i.e. the driver-side LOOP adds rounds, not data-scaled
work, so a 100 TB deployment can widen the query set freely; the
corpus-scaled stage is the retrieval that feeds the pool.

Writes one JSON line per size to stdout and appends to
tools/probe_mmr_scale_r12.jsonl:
  {"n_queries": N, "pool_rows": ..., "pairwise_rows": ...,
   "pool_sec": ..., "rerank_sec": ..., "us_per_pair": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapreducer_spark.functions.vectors import cosine  # noqa: E402
from mapreducer_spark.operators import similarity as sim  # noqa: E402
from mapreducer_spark.session import get_spark  # noqa: E402
from mapreducer_spark.sources import load_table  # noqa: E402

N_QUERIES = (5, 50, 500)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="probe-mmr-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    em = load_table(spark, sf_dir, "embeddings")
    n_vec = em.count()
    out_path = os.path.join(
        os.path.dirname(__file__), "probe_mmr_scale_r12.jsonl"
    )
    with open(out_path, "a") as out:
        for nq in N_QUERIES:
            if nq > n_vec:
                break
            # Brute-force pool at this query-set size (the similarity_topk
            # shape with a parameterized query count).
            t0 = time.perf_counter()
            q = em.where(F.col("vec_id") < nq).select(
                F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
            )
            c = em.select("vec_id", F.col("embedding").alias("cv"))
            s = F.round(cosine(F.col("qv"), F.col("cv")), 6)
            w = Window.partitionBy("q_id").orderBy(
                F.col("sim").desc(), F.col("vec_id")
            )
            pool = (
                c.crossJoin(F.broadcast(q))
                .where(F.col("q_id") != F.col("vec_id"))
                .select("q_id", "vec_id", s.alias("sim"))
                .withColumn("rnk", F.row_number().over(w))
                .where(F.col("rnk") <= sim._TOP_K)
                .select("q_id", "vec_id", F.col("sim").alias("rel"))
                .localCheckpoint(eager=True)
            )
            pool_rows = pool.count()
            pool_sec = time.perf_counter() - t0
            # The stage under test: pairwise + k greedy rounds.
            t0 = time.perf_counter()
            selected = sim._mmr_rerank(spark, sf_dir, pool)
            n_sel = selected.count()
            rerank_sec = time.perf_counter() - t0
            pairwise_rows = pool_rows * (sim._TOP_K - 1)
            row = {
                "n_queries": nq,
                "pool_rows": pool_rows,
                "n_selected": n_sel,
                "pairwise_rows": pairwise_rows,
                "pool_sec": round(pool_sec, 3),
                "rerank_sec": round(rerank_sec, 3),
                "us_per_pair": round(rerank_sec / pairwise_rows * 1e6, 2),
                "sf_dir": sf_dir,
            }
            line = json.dumps(row, separators=(",", ":"))
            print(line, flush=True)
            out.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
