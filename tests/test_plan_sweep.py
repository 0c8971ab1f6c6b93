"""Repo-wide physical-plan sweep: EVERY registered query's plan is held
to the scale invariants the per-query plan tests assert piecemeal —

1. no CartesianProduct except documented broadcast-scalar/tiny-side
   sites (each whitelisted entry is a deliberate design, not an
   accident Catalyst fell into);
2. no row-at-a-time Python evaluation (BatchEvalPython) anywhere —
   Python only enters via Arrow (ArrowEvalPython / mapInPandas /
   FlatMapGroupsInPandas).

A new query that accidentally plans a cartesian join or a per-row UDF
fails here before it ever reaches a bench or the driver."""

from __future__ import annotations

import pytest

from mapreducer_spark.plans.inspect import formatted_plan
from mapreducer_spark.registry import all_queries

QUERIES = all_queries()

@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_invariants(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # No whitelist: even the deliberate all-pairs/broadcast-scalar sites
    # (user_activity_similarity, similarity_topk, gram matrix) plan as
    # BroadcastNestedLoopJoin, never CartesianProduct — a CartesianProduct
    # node means neither side was broadcastable, which is always a bug
    # at 100 TB.
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
    assert "BatchEvalPython" not in plan, (
        f"{name} uses row-at-a-time Python eval"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_complex_typed_result_columns(spark, sf_dir, name):
    """Registry-wide: no declared query may emit array/map/struct columns.

    The driver's value-hash canonicalizer cannot hash list cells — a
    complex-typed output column is a guaranteed ``err`` row the first
    time the driver samples the query (the round-6
    ``inverted_index_rare_terms`` red row, and the latent
    ``embedding_centroid_per_label`` copy of it).  Asserting over the
    whole registry makes the defect class structurally dead: a new query
    with an un-flattened list output fails here before it ships.
    """
    from tests.oracle import assert_scalar_schema

    assert_scalar_schema(name, QUERIES[name].fn(spark, sf_dir))


def test_rows_only_queries_respect_scan_budget(spark, sf_dir):
    """The oracle gate asserts the executed-scan budget for every
    oracle-backed query as a side effect of collecting it (r9,
    tests/oracle.py); the handful of rows-only queries (HLL sketches,
    the xxhash64 LSH path) never pass through it, so execute them here
    and hold them to the same ceiling."""
    from mapreducer_spark.plans.inspect import (
        MAX_EXECUTED_SCANS_PER_TABLE,
        UNPARTITIONED_WINDOW_MAX_ROWS,
        executed_filescan_counts,
        unpartitioned_window_input_rows,
    )

    rows_only = [n for n, q in QUERIES.items() if q.oracle is None]
    assert rows_only, "expected at least the HLL/xxhash64 rows-only set"
    for name in rows_only:
        df = QUERIES[name].fn(spark, sf_dir)
        df.collect()
        for table, n_scans in executed_filescan_counts(df).items():
            assert n_scans <= MAX_EXECUTED_SCANS_PER_TABLE, (
                f"{name}: executed plan reads {table!r} {n_scans} times"
            )
        # Same single-partition window budget the oracle gate asserts
        # (tests/oracle.py) — rows-only queries get it here.
        for n_rows in unpartitioned_window_input_rows(df):
            assert 0 <= n_rows <= UNPARTITIONED_WINDOW_MAX_ROWS, (
                f"{name}: unpartitioned Window over {n_rows} rows"
            )
