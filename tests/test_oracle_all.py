"""The main correctness gate, locally: every registered query with an
oracle must hash-match DuckDB at sf0.01 — exactly what the driver checks
(SURVEY.md §5.2 item 2).  Rows-only queries must at least run and return
a deterministic row count twice.
"""

from __future__ import annotations

import pytest

from mapreducer_spark.registry import all_queries
from tests.oracle import assert_matches_oracle

QUERIES = all_queries()
ORACLE_BACKED = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_query_matches_oracle(spark, oracle_sf_dir, name):
    assert_matches_oracle(spark, QUERIES[name], oracle_sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_deterministic(spark, oracle_sf_dir, name):
    q = QUERIES[name]
    df1 = q.fn(spark, oracle_sf_dir)
    n1 = df1.count()
    n2 = q.fn(spark, oracle_sf_dir).count()
    assert n1 == n2
    assert n1 >= 0


def test_gate_rejects_wrong_results(spark, oracle_sf_dir):
    """Negative control: the gate must actually FAIL on wrong output —
    value drift, row-count drift, column-name drift, and float/int type
    drift each have to trip an assertion.  Guards against the harness
    ever becoming vacuous (a bug in normalization or hashing that made
    everything 'match' would silently greenlight the whole suite)."""
    from dataclasses import replace

    from mapreducer_spark.registry import REGISTRY

    base = REGISTRY["word_count"]

    wrong_value = replace(
        base, oracle=base.oracle.replace("SELECT", "SELECT", 1) + " LIMIT 3"
    )
    with pytest.raises(AssertionError):
        assert_matches_oracle(spark, wrong_value, oracle_sf_dir)

    # Same rows, one value off by one.
    off_by_one = replace(
        base,
        oracle=f"SELECT word, cnt + CASE WHEN word = 'the' THEN 1 ELSE 0 END "
        f"AS cnt FROM ({base.oracle})",
    )
    with pytest.raises(AssertionError):
        assert_matches_oracle(spark, off_by_one, oracle_sf_dir)

    # Same values, wrong column name.
    renamed = replace(
        base, oracle=f"SELECT word AS wrd, cnt FROM ({base.oracle})"
    )
    with pytest.raises(AssertionError):
        assert_matches_oracle(spark, renamed, oracle_sf_dir)

    # Same values, DOUBLE where Spark emits BIGINT (type-tag drift).
    retyped = replace(
        base,
        oracle=f"SELECT word, CAST(cnt AS DOUBLE) AS cnt FROM ({base.oracle})",
    )
    with pytest.raises(AssertionError):
        assert_matches_oracle(spark, retyped, oracle_sf_dir)
