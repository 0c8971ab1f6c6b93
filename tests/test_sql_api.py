"""SQL entry point + frame-sampling stub tests."""

from __future__ import annotations

import pytest

from mapreducer_spark.sql_api import sql
from tests.oracle import duck_connection


def test_sql_matches_duckdb(spark, oracle_sf_dir):
    q = """
    SELECT l_returnflag, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """
    got = {(r.l_returnflag, r.n) for r in sql(spark, oracle_sf_dir, q).collect()}
    con = duck_connection(oracle_sf_dir)
    try:
        want = set(con.sql(q).fetchall())
    finally:
        con.close()
    assert got == want


def test_sql_join_across_views(spark, sf_dir):
    q = """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """
    rows = sql(spark, sf_dir, q).collect()
    assert sum(r.n_customers for r in rows) == 150


def test_frame_sampling_stub(spark, sf_dir):
    from mapreducer_spark.operators.multimodal import sampled_frames

    frames = sampled_frames(spark, sf_dir)
    sample = frames.where(frames.doc_id == 0).orderBy("frame_idx").collect()
    assert len(sample) >= 1
    # every 4th 16-byte frame, deterministic
    assert [r.frame_idx for r in sample] == list(range(0, 4 * len(sample), 4))
    assert all(1 <= len(r.frame_bytes) <= 16 for r in sample)


# ---------------------------------------------------------------------------
# Pure-SQL front end proof: for these registered queries the ORACLE SQL
# TEXT ITSELF runs unchanged on Spark (via sql_api temp views) and
# produces the registered DataFrame query's exact result.  Combined with
# the oracle gate (DataFrame == DuckDB running the same text), this
# proves one shared ANSI-SQL text executes identically on all three
# surfaces: Spark SQL, the DataFrame API, and DuckDB.
# ---------------------------------------------------------------------------

SHARED_TEXT_QUERIES = sorted(
    [
        "agg_stats",
        "approx_distinct_error_report",
        "approx_price_quantiles",
        "brand_collation_join",
        "brand_supplier_revenue",
        "copurchase_bfs_recursive",
        "cube_orders",
        "custkeys_1996_and_1997",
        "custkeys_1996_not_1997",
        "custkeys_except_all",
        "custkeys_intersect_all",
        "customer_distribution",
        "customer_order_counts",
        "customer_spend_distribution",
        "customers_with_1997_orders",
        "customers_without_recent_orders",
        "disjunctive_predicate_revenue",
        "event_funnel_ordered",
        "event_type_funnel",
        "forecast_revenue",
        "grouping_sets_revenue",
        "idle_rich_customers",
        "incremental_daily_agg",
        "large_order_customers",
        "late_shipment_priority",
        "lateral_top_customers",
        "lineitem_constraint_checks",
        "local_supplier_volume",
        "math_functions",
        "monthly_gap_fill",
        "moving_avg_spend",
        "nation_revenue",
        "order_minmax_norm_pandas",
        "part_copurchase_pagerank",
        "pivot_status_revenue",
        "price_histogram",
        "price_qty_regression",
        "pricing_summary",
        "priority_lateness_matrix",
        "quantity_decile_stats",
        "rank_dense_ntile",
        "referential_integrity_checks",
        "returned_items_topn",
        "rollup_revenue",
        "running_customer_spend",
        "segment_modal_priority",
        "small_quantity_revenue",
        "stats_moments",
        "string_functions",
        "suppliers_above_avg_revenue",
        "top_orders_per_customer",
        "top_revenue_orders",
        "top_supplier_revenue",
        "union_all_keys",
        "unpivot_order_metrics",
        "user_customer_full_outer",
        "waiting_suppliers_q21ish",
        "warehouse_table_stats",
        "zorder_codes",
        "zorder_codes_3d",
    ]
)


@pytest.mark.parametrize("name", SHARED_TEXT_QUERIES)
def test_shared_sql_text_runs_on_spark(spark, sf_dir, name):
    """spark.sql(<the DuckDB oracle text, verbatim>) over sql_api temp
    views must equal the registered DataFrame implementation exactly
    (driver-style normalization: sorted columns, type-tagged values)."""
    from mapreducer_spark.registry import all_queries
    from mapreducer_spark.sql_api import register_views
    from tests.oracle import _normalize, run_spark

    q = all_queries()[name]
    assert q.oracle is not None
    register_views(spark, sf_dir)
    scols, srows = run_spark(spark.sql(q.oracle))
    dcols, drows = run_spark(q.fn(spark, sf_dir))
    assert _normalize(scols, srows) == _normalize(dcols, drows)


def test_shared_sql_slice_is_representative():
    """The shared-text slice must keep covering the core shape families
    (joins, aggs, windows, set ops, recursion, TPC-H analogues) — a
    shrinking list would quietly weaken the three-surface proof."""
    assert len(SHARED_TEXT_QUERIES) >= 20
    assert len(set(SHARED_TEXT_QUERIES)) == len(SHARED_TEXT_QUERIES)
