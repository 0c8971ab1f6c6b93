"""Test-side alias of the in-package correctness gate.

The gate core moved into the package (mapreducer_spark/oracle.py) so the
CLI `verify` command shares the exact normalization/assert contract with
the test suite; every historical ``tests.oracle`` import keeps working
through this module.
"""

from mapreducer_spark.oracle import (  # noqa: F401
    TABLES,
    _canon,
    _normalize,
    assert_matches_oracle,
    assert_scalar_schema,
    duck_connection,
    run_duck,
    run_spark,
)
