"""SQL entry point + frame-sampling stub tests."""

from __future__ import annotations

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
