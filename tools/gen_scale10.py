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
- embeddings are replicated 10x with a PER-COPY RANDOM ROTATION
  (seeded orthogonal Q_k via QR of a Gaussian; copy 0 = identity) and
  vec_id shifted 10k per copy (far below the +1M synthesized-variant
  id space in operators/similarity.py).  A rotation preserves every
  WITHIN-copy pairwise cosine exactly — sf0.1's near-dup/cluster
  density carries over per copy — while cross-copy similarities become
  ~N(0, 1/d) noise, so no spurious cross-copy near-dups (the embedding
  analog of the letter-rotated text; naive byte-copying was why the
  similarity family was excluded from the 10x oracle program through
  round 6: the vectors carried no new information).  Per-copy
  perturb-with-noise was rejected: renormalized additive noise scales
  EVERY within-copy cosine by ~1/(1+sigma^2 d), destroying the density
  the rehearsal is supposed to preserve.
- every other table is byte-copied; they are dimension-sized and not on
  the probed operators' hot paths.

After regenerating, re-freeze the sf1 ANN indexes (the fingerprint
guard will otherwise refuse to serve/render oracles for the changed
fixture):

    python tools/train_ivf_index.py  /root/repo/.scale10/sf1
    python tools/train_pq_codebooks.py /root/repo/.scale10/sf1

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
]

EMB_SEED = 20260814
EMB_ID_SHIFT = 10_000


def write_rotated_embeddings(out: str) -> int:
    """10x embeddings: per-copy seeded random rotation + disjoint ids."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = src.column("vec_id").to_numpy()
    label = src.column("label").to_numpy()
    emb = np.asarray(src.column("embedding").to_pylist(), dtype=np.float64)
    d = emb.shape[1]
    rng = np.random.default_rng(EMB_SEED)
    parts = []
    for k in range(COPIES):
        if k == 0:
            rot = emb
        else:
            q, r = np.linalg.qr(rng.standard_normal((d, d)))
            # Sign-fix so Q is unique given the Gaussian draw (QR sign
            # ambiguity would otherwise make regeneration BLAS-dependent
            # in more than ULPs).
            q = q * np.sign(np.diag(r))
            rot = emb @ q
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + k * EMB_ID_SHIFT, pa.int64()),
                    "embedding": pa.array(
                        [row for row in rot.astype(np.float32)],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array(label, pa.int32()),
                }
            )
        )
    table = pa.concat_tables(parts)
    pq.write_table(table, f"{out}/embeddings.parquet", compression="zstd")
    return table.num_rows


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
    n = write_rotated_embeddings(out)
    print(f"embeddings: {n} rows (9 rotated copies + identity)")
    print(f"wrote {out}")
    print(
        "NOTE: re-freeze the sf1 ANN indexes now — "
        "python tools/train_ivf_index.py /root/repo/.scale10/sf1 && "
        "python tools/train_pq_codebooks.py /root/repo/.scale10/sf1"
    )


if __name__ == "__main__":
    main()
