"""Malformed-JSON parity for the props_schema_validation gate.

The fixture's props are all well-formed, so the declared query never
exercises the invalid-JSON branch — this test builds an events table
whose props cover every malformed shape (bad syntax, single quotes,
non-object top level, empty, NULL, wrong-typed / missing / negative k)
and asserts Spark and DuckDB agree cell-for-cell through the same
oracle gate used for the declared queries (ADVICE r2: PERMISSIVE
from_json alone cannot see malformed JSON; the corrupt-record column
can).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import mapreducer_spark.operators  # noqa: F401  (populates REGISTRY)
from mapreducer_spark.registry import REGISTRY
from tests.oracle import TABLES, assert_matches_oracle

PROPS_CASES = [
    '{"k": 1}',        # valid, integer k
    '{"k": 7}',
    '{"k": -3}',       # negative k
    '{"k": "x"}',      # non-integer k
    '{"k": null}',     # k present but null -> missing
    '{"j": 5}',        # k absent -> missing
    "not json",        # malformed -> invalid
    "{'k':1}",         # single quotes: invalid under strict grammar
    "[1, 2]",          # valid JSON, not an object -> invalid
    "42",              # valid JSON scalar -> invalid
    "",                # empty -> invalid
    None,              # NULL props -> invalid
]


@pytest.fixture(scope="module")
def dirty_sf_dir(tmp_path_factory) -> str:
    sf = tmp_path_factory.mktemp("dirty_sf")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        if t != "events":
            os.symlink(f"{src}/{t}.parquet", sf / f"{t}.parquet")
    n = len(PROPS_CASES)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                           pa.timestamp("us")),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(["probe"] * n),
            "value": pa.array([float(i) for i in range(n)]),
            "props": pa.array(PROPS_CASES, pa.string()),
        }
    )
    pq.write_table(table, sf / "events.parquet")
    return str(sf)


def test_props_schema_validation_malformed_parity(spark, dirty_sf_dir):
    assert_matches_oracle(
        spark, REGISTRY["props_schema_validation"], dirty_sf_dir
    )


def test_props_schema_validation_malformed_counts(spark, dirty_sf_dir):
    row = REGISTRY["props_schema_validation"].fn(spark, dirty_sf_dir).collect()[0]
    assert row.n_rows == len(PROPS_CASES)
    # not json, {'k':1}, [1,2], 42, "", NULL
    assert row.invalid_json == 6
    # {"k": null}, {"j": 5}
    assert row.missing_k == 2
    assert row.non_integer_k == 1   # {"k": "x"}
    assert row.negative_k == 1      # {"k": -3}
    assert row.min_k == -3
    assert row.max_k == 7
