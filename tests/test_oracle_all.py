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
