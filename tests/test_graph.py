"""Graph-operator structure tests (beyond the oracle hash checks).

The headline here is the PageRank rank-vector size switch (VERDICT r4
#2): above _PR_BROADCAST_MAX_V vertices the per-round join falls back
from a broadcast of the rank vector to a keyed shuffle.  The fallback
branch can never trigger on fixture-sized graphs, so it is forced by
patching the cap to zero and asserted EQUAL to the broadcast path —
the per-edge decimal-rounded contributions make both partitionings
bit-identical, which is exactly what lets a 100 TB run switch plans
without changing answers.
"""

from __future__ import annotations

import pytest

from mapreducer_spark.operators import graph


def _collect_ranks(spark, sf_dir):
    rows = graph.part_copurchase_pagerank(spark, sf_dir).collect()
    return sorted((r.v, r.pagerank) for r in rows)


def test_pagerank_shuffle_fallback_matches_broadcast(spark, sf_dir, monkeypatch):
    broadcast_ranks = _collect_ranks(spark, sf_dir)
    assert broadcast_ranks, "graph should be non-empty at fixture scale"
    monkeypatch.setattr(graph, "_PR_BROADCAST_MAX_V", 0)
    shuffle_ranks = _collect_ranks(spark, sf_dir)
    assert shuffle_ranks == broadcast_ranks


def test_pagerank_mass_conserved(spark, sf_dir):
    """Sum of ranks stays ~1 on a dangling-free symmetric graph: the
    (1-d)/n teleport plus d * (full contribution mass) is a probability
    distribution at every round."""
    rows = graph.part_copurchase_pagerank(spark, sf_dir).collect()
    total = sum(r.pagerank for r in rows)
    assert total == pytest.approx(1.0, abs=1e-4)


def test_cc_shuffle_fallback_matches_broadcast(spark, sf_dir, monkeypatch):
    """connected_components has the same broadcast-or-shuffle switch as
    PageRank (label vector vs edge list); force the over-cap branch and
    assert identical clustering.  Calls connected_components directly —
    going through neardup_clusters would hit the session memo and
    silently skip the shuffle branch on the second call."""
    from mapreducer_spark.operators import clustering
    from mapreducer_spark.operators.dedup import neardup_jaccard_blocked

    pairs = neardup_jaccard_blocked(spark, sf_dir).select("id_a", "id_b")

    def _labels():
        rows = clustering.connected_components(pairs, "id_a", "id_b").collect()
        return sorted((r.v, r.comp) for r in rows)

    broadcast_out = _labels()
    assert broadcast_out
    monkeypatch.setattr(clustering, "_CC_BROADCAST_MAX_V", 0)
    assert _labels() == broadcast_out


def test_connected_components_matches_union_find(spark):
    """Third-implementation parity on RANDOM graphs: the iterative
    Spark label propagation vs a pure-Python union-find with min-label
    canonicalization.  The fixture's near-dup graph (and its recursive-
    CTE oracle) only exercises small dense cliques; these sweep sparse
    graphs, a high-diameter path (pointer-jumping depth), and isolated
    edges."""
    import random

    cases = []
    for seed, n, m in [(11, 120, 60), (12, 200, 400), (13, 50, 8)]:
        rng = random.Random(seed)
        cases.append(
            [
                (rng.randrange(n), rng.randrange(n))
                for _ in range(m)
            ]
        )
    # 300-vertex path: diameter stress for the pointer-jumping rounds.
    cases.append([(i, i + 1) for i in range(300)])

    from mapreducer_spark.operators.clustering import connected_components

    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comps: dict[int, list[int]] = {}
        for v in parent:
            comps.setdefault(find(v), []).append(v)
        expect = {
            v: min(members) for members in comps.values() for v in members
        }

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r.v: r.comp
            for r in connected_components(df, "id_a", "id_b").collect()
        }
        assert got == expect


def test_asof_join_matches_pandas_merge_asof(spark):
    """Third-implementation parity on RANDOM (key, time) data including
    duplicate left times and right rows at exactly-equal times (the
    '<=' boundary): the union+window as-of join vs pandas merge_asof
    (direction='backward', allow_exact_matches=True).  The right side
    is pre-deduplicated per (key, time) — the operator's documented
    contract — so both engines resolve ties identically."""
    import random

    import pandas as pd

    from mapreducer_spark.operators.asof import asof_join

    rng = random.Random(99)
    left = [
        (rng.randrange(8), rng.randrange(50), i) for i in range(300)
    ]  # (k, t, event_id)
    right_raw = [
        (rng.randrange(8), rng.randrange(50), rng.randrange(1000))
        for _ in range(120)
    ]  # (k, t, payload)
    # Dedup right per (k, t) keeping max payload (operator contract).
    best: dict[tuple, int] = {}
    for k, t, p in right_raw:
        best[(k, t)] = max(best.get((k, t), -1), p)
    right = [(k, t, p) for (k, t), p in best.items()]

    ldf = spark.createDataFrame(left, "k long, t long, event_id long")
    rdf = spark.createDataFrame(right, "rk long, rt long, payload long")
    got = {
        r.event_id: r.payload
        for r in asof_join(
            ldf, rdf, "k", "rk", "t", "rt", ["payload"]
        ).collect()
    }

    lpd = pd.DataFrame(left, columns=["k", "t", "event_id"]).sort_values(
        ["t", "event_id"], kind="mergesort"
    )
    rpd = pd.DataFrame(right, columns=["k", "rt", "payload"]).sort_values(
        "rt", kind="mergesort"
    )
    merged = pd.merge_asof(
        lpd,
        rpd,
        left_on="t",
        right_on="rt",
        left_by="k",
        right_by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    expect = {
        int(r.event_id): (None if pd.isna(r.payload) else int(r.payload))
        for r in merged.itertuples()
    }
    assert got == expect


def test_triangles_counts_each_corner(spark, sf_dir):
    """Every triangle credits exactly 3 corners, so sum(n_triangles) is
    divisible by 3 and positive on the fixture's synthesized near-dups
    only if triangles exist at all (structure check, not an oracle)."""
    rows = graph.neardup_triangles(spark, sf_dir).collect()
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0
