#!/usr/bin/env python
"""Generate a 10x synthetic fixture ("sf1") from sf0.1 for the scale
rehearsal of the iterative operators (VERDICT r5 #4).

The iterative tail (PageRank, connected components, triangles,
recursive BFS, LSH near-dup) costs rounds x shuffle; its 100x behavior
was extrapolated from the sf0.001->sf0.1 probe.  This produces a 10x
bigger input the right way for graph/dedup semantics:

- orders / lineitem / documents are replicated 10x with SHIFTED keys
  (k * <disjoint offset> per copy) — ten structurally-identical but
  DISJOINT subgraphs / sub-corpora, so |V|, |E|, and cluster counts all
  grow 10x.  Naive row duplication would only multiply edge weights
  (same graph, heavier edges) and duplicate doc_ids, which tests
  nothing.
- document TEXT is letter-rotated per copy (translate over a 10-letter
  alphabet, rotation k), so cross-copy documents are NOT near-dups and
  the corpus keeps sf0.1's duplicate DENSITY at 10x the rows.  With
  identical cross-copy texts every doc gained 9 exact twins: LSH bucket
  groups of ~20, ~45x the edges, and the connected-components probe
  measured 10x density, not 10x scale (first run: 2.6 s -> 75 s).
- document doc_id shift (10k per copy) stays far below the synthesized
  near-dup variant offsets (+1M / +3M in operators/dedup.py), so the
  variant id spaces of different copies never collide.
- every other table is byte-copied; they are dimension-sized and not on
  the probed operators' hot paths.

Output (default /root/repo/.scale10/sf1) is a full fixture dir readable
by load_table, so tools/scaling_probe.py picks it up as a 4th scale.
Not committed (gitignored): ~120 MB of derived parquet, regenerable in
~30 s with this script.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale10", "sf1"
)
COPIES = 10

# key column -> per-copy shift (disjoint: shift * COPIES stays far from
# any other id space, incl. dedup.py's +1M/+3M synthesized variants)
SHIFTS = {
    "orders": {"o_orderkey": 1_000_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000},
    "documents": {"doc_id": 10_000},
    # user_id shifts too: ten DISJOINT user populations keep the
    # per-user event density of sf0.1 (duplicating rows under the same
    # users would 10x density, not scale — same pitfall as the
    # identical-text documents).  Copies' users no longer join the
    # orders custkeys, which is fine: the events-based probe targets
    # (user-profile similarity, sessionization) are events-only.
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
}

COPY_AS_IS = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "embeddings",
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    alpha = "etaoinshrd"  # 10 most frequent letters -> thorough scramble
    for table, shifts in SHIFTS.items():
        repl = [
            f"CAST({col} + k * {off} AS BIGINT) AS {col}"
            for col, off in shifts.items()
        ]
        if table == "documents":
            rotations = " ".join(
                f"WHEN k = {k} THEN translate(text, '{alpha}', "
                f"'{alpha[k:] + alpha[:k]}')"
                for k in range(1, COPIES)
            )
            repl.append(f"(CASE WHEN k = 0 THEN text {rotations} END) AS text")
        replace = ", ".join(repl)
        con.sql(
            f"""
            COPY (
              SELECT t.* REPLACE ({replace})
              FROM '{SRC}/{table}.parquet' t, range({COPIES}) r(k)
            ) TO '{out}/{table}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)
            """
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    for table in COPY_AS_IS:
        shutil.copyfile(f"{SRC}/{table}.parquet", f"{out}/{table}.parquet")
        print(f"{table}: copied")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
