"""The correctness-gate core (SURVEY.md §5.2), shipped IN the package.

Lives here (not only under tests/) so the CLI `verify` command enforces
the exact same normalization contract as the test-suite gate — ad-hoc
stringified comparison diverged from it (driver-hash hazards like
-0.0 vs 0.0 and engine float repr), which is why cmd_verify now imports
this module.  tests/oracle.py re-exports these names unchanged.

Runs a registered query's Spark DataFrame and its DuckDB oracle SQL on the
same sf dir, normalizes both to (sorted column names, canonicalized cell
values), and asserts the row multisets match EXACTLY — mirroring the
driver's order-insensitive value hash, which tolerates no float fuzz.
Queries must therefore bake determinism in (decimal-based sums, explicit
rounding), not rely on the comparator to forgive.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        # Escape the path for the SQL string literal — a quote in the
        # fixture path must not break (or smuggle SQL into) the DDL.
        p = f"{sf_dir}/{t}.parquet".replace("'", "''")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(v):
    """Canonical, TYPE-TAGGED cell value.

    Stricter than Python equality on purpose: the driver hashes
    stringified values, where 1036 (BIGINT) != 1036.0 (DOUBLE), so a
    Spark/DuckDB type drift must fail here too.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, float):
        return ("f", "NaN" if math.isnan(v) else repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return (
            "t",
            v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"),
        )
    if isinstance(v, dt.date):
        return ("D", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def assert_scalar_schema(name: str, df) -> None:
    """Reject array/map/struct-typed result columns in a declared query.

    The driver's canonicalizer (pandas sort_values/factorize over
    stringified cells) throws ``TypeError: unhashable type: 'list'`` on a
    complex-typed column — the query reds out as ``err`` with no hash
    comparison at all (the round-6 ``inverted_index_rare_terms`` row).
    The local gate used to canonicalize lists to tuples and pass, which
    made it LAXER than the driver's; ban the whole class here instead,
    same pattern as the HUGEINT rejection below.  Queries that compute a
    list (posting lists, centroids) must flatten it — ``array_join`` to
    a string, or explode to one row per element.
    """
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed result column(s) {complex_cols} "
        "(array/map/struct) — the driver's hash harness cannot "
        "canonicalize them; flatten with array_join() or explode"
    )


def run_spark(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def run_duck(con, sql: str) -> tuple[list[str], list[tuple]]:
    rel = con.sql(sql)
    # DuckDB types SUM(integer) as HUGEINT (int128).  Python fetchall()
    # converts it to a plain int — invisible here — but the driver's value
    # stringification renders int128 differently from Spark's BIGINT, so a
    # HUGEINT result column is a guaranteed hash mismatch at the driver
    # even when every value is identical (the round-2
    # props_schema_validation red row).  Ban it at the gate: wrap the
    # aggregate in CAST(... AS BIGINT).
    hugeint = [
        c
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not hugeint, (
        f"oracle result has HUGEINT column(s) {hugeint}; "
        "wrap the aggregate in CAST(... AS BIGINT)"
    )
    # Same class of driver-hash hazard as HUGEINT: complex-typed oracle
    # columns (LIST/STRUCT/MAP) can't be canonicalized by the driver's
    # pandas harness.  The Spark side is checked by assert_scalar_schema;
    # ban the oracle side symmetrically so a drift can't hide.
    complex_cols = [
        c
        for c, t in zip(rel.columns, rel.types)
        if any(k in str(t).upper() for k in ("[]", "LIST", "STRUCT", "MAP"))
    ]
    assert not complex_cols, (
        f"oracle result has complex-typed column(s) {complex_cols}; "
        "flatten with array_to_string() or UNNEST"
    )
    return list(rel.columns), rel.fetchall()


def run_spark_gated(spark, query, sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Run the query's Spark side and assert every EXECUTED-PLAN
    structural budget (the 100 TB posture checks that ride along with
    every correctness collect).  Shared by assert_matches_oracle, the
    rows-only sweep leg, and the cached 10x sweep (tools/sweep_r11.py),
    so no verification path can skip a budget."""
    sdf = query.fn(spark, sf_dir)
    assert_scalar_schema(query.name, sdf)
    scols, srows = run_spark(sdf)
    # Rescan budget on the just-executed plan (free — run_spark already
    # collected): no query may read the same table more than
    # MAX_EXECUTED_SCANS_PER_TABLE times.  This is the structural kill
    # for the r8 corr-matrix defect class (a unionAll fan-out silently
    # re-executing its input subtree per branch — 12 executed scans).
    from mapreducer_spark.plans.inspect import (
        BROADCAST_HINTED_MAX_ROWS,
        MAX_EXECUTED_SCANS_PER_TABLE,
        UNPARTITIONED_WINDOW_MAX_ROWS,
        executed_filescan_counts,
        hinted_broadcast_rows,
        unpartitioned_window_input_rows,
    )

    for table, n_scans in executed_filescan_counts(sdf).items():
        assert n_scans <= MAX_EXECUTED_SCANS_PER_TABLE, (
            f"{query.name}: executed plan reads table {table!r} "
            f"{n_scans} times (budget {MAX_EXECUTED_SCANS_PER_TABLE}) — "
            "a branch is re-executing its input subtree; localCheckpoint "
            "the shared frame or emit branches via F.stack"
        )
    # Single-partition window budget (r10, whitelist-free — the
    # structural kill for the r9 vocab_growth_curve class): any Window
    # node with an empty partition spec must sit on a domain-bounded
    # frame.  Data-dimension frames cross the bound by sf0.01/sf0.1;
    # fix with functions/agg.py's two-phase global_row_number /
    # global_running_sum helpers.
    for n_rows in unpartitioned_window_input_rows(sdf):
        assert 0 <= n_rows <= UNPARTITIONED_WINDOW_MAX_ROWS, (
            f"{query.name}: unpartitioned Window over {n_rows} rows "
            f"(budget {UNPARTITIONED_WINDOW_MAX_ROWS}) — a global "
            "window collapses its whole input into ONE task; use the "
            "two-phase helpers in functions/agg.py"
        )
    # Hinted-broadcast budget (r11, whitelist-free — the structural kill
    # for the unbounded-broadcast class the r10 audit cleared by hand):
    # every HINT-FORCED BroadcastExchange must carry a domain-bounded
    # frame.  Stats/AQE-chosen broadcasts are exempt by attribution —
    # Spark stops choosing those when the side outgrows its bytes
    # threshold, while a hint ships the frame to every executor no
    # matter how large it grows.  Fix: drop the hint (the planner still
    # broadcasts small frames on its own) or bound the frame.
    for n_rows in hinted_broadcast_rows(sdf):
        assert 0 <= n_rows <= BROADCAST_HINTED_MAX_ROWS, (
            f"{query.name}: hint-forced BroadcastExchange over {n_rows} "
            f"rows (budget {BROADCAST_HINTED_MAX_ROWS}) — an explicit "
            "broadcast() on a frame that grows with the data OOMs at "
            "100 TB; drop the hint or bound the frame"
        )
    return scols, srows


def result_digest(cols: list[str], rows: list[tuple]) -> dict:
    """Stable digest of a normalized result — what the cached 10x sweep
    stores per (query, oracle-SQL hash, fixture fingerprint) so unchanged
    oracles need not re-run DuckDB (VERDICT r10 #4).  The hash is over
    the SAME canonicalization assert_matches_oracle compares with, so a
    cache-hit comparison is exactly as strict as a live one."""
    import hashlib

    norm = _normalize(cols, rows)
    return {
        "cols": sorted(cols),
        "n": len(rows),
        "hash": hashlib.sha256(repr(norm).encode()).hexdigest(),
    }


def assert_matches_oracle(spark, query, sf_dir: str, max_report: int = 5) -> None:
    """query: a registry.Query with fn + oracle."""
    assert query.oracle is not None, f"{query.name}: no oracle SQL declared"
    scols, srows = run_spark_gated(spark, query, sf_dir)
    con = duck_connection(sf_dir)
    try:
        dcols, drows = run_duck(con, query.oracle)
    finally:
        con.close()

    assert sorted(scols) == sorted(dcols), (
        f"{query.name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{query.name}: row count mismatch spark={len(srows)} duck={len(drows)}"
    )
    s_norm = _normalize(scols, srows)
    d_norm = _normalize(dcols, drows)
    if s_norm != d_norm:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
        ][:max_report]
        raise AssertionError(
            f"{query.name}: value mismatch on {len([1 for a, b in zip(s_norm, d_norm) if a != b])}"
            f" rows; first diffs (row_idx, spark, duck): {diffs}"
        )
