"""Warehouse ingest — the at-rest layout for 100 TB (SURVEY.md §2.1 S7+).

Converts the flat per-table parquet fixtures into the layout a real
deployment queries:

- fact tables partitioned by a pruning-friendly time key
  (orders/lineitem by year; events by day) -> partition pruning turns
  time-range scans into directory selection,
- lineitem and orders ALSO bucketed by the join key in a table-catalog
  variant (see tests/test_bucketing_and_formats.py) so the recurring
  fact-fact join pre-pays its shuffle at ingest,
- documents partitioned by lang (the dominant filter of text pipelines).

CLI:  python -m mapreducer_spark ingest --sf-dir ... --warehouse ...
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducer_spark.sources.tables import TABLES, load_table


def ingest_warehouse(
    spark: SparkSession, sf_dir: str, warehouse_dir: str
) -> dict[str, str]:
    """Write every table into the partitioned warehouse layout; returns
    {table: path}."""
    out: dict[str, str] = {}

    def path(name: str) -> str:
        p = f"{warehouse_dir}/{name}"
        out[name] = p
        return p

    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if name == "orders":
            (
                df.withColumn("o_year", F.year("o_orderdate"))
                .write.mode("overwrite")
                .partitionBy("o_year")
                .parquet(path(name))
            )
        elif name == "lineitem":
            (
                df.withColumn("l_year", F.year("l_shipdate"))
                .write.mode("overwrite")
                .partitionBy("l_year")
                .parquet(path(name))
            )
        elif name == "events":
            (
                df.withColumn("d", F.to_date("ts"))
                .write.mode("overwrite")
                .partitionBy("d")
                .parquet(path(name))
            )
        elif name == "documents":
            df.write.mode("overwrite").partitionBy("lang").parquet(path(name))
        else:
            df.write.mode("overwrite").parquet(path(name))
    return out


def read_warehouse_table(
    spark: SparkSession, warehouse_dir: str, name: str
) -> DataFrame:
    df = spark.read.parquet(f"{warehouse_dir}/{name}")
    # Drop the derived partition columns so schemas match the originals.
    for extra in ("o_year", "l_year", "d"):
        if extra in df.columns:
            df = df.drop(extra)
    return df


def merge_upsert(
    updates: DataFrame,
    target_dir: str,
    key_cols: list,
    order_cols: list,
) -> None:
    """Batch MERGE-INTO emulation over a plain-parquet target: keep the
    latest row per key across (existing ∪ updates), where "latest" is
    max over ``order_cols``.

    Plain parquet has no transactional merge, so the commit protocol is
    write-to-side-directory + rename swap — the same generation dance
    the streaming foreachBatch upsert uses (streaming/jobs.py), factored
    for batch callers.  The previous generation stays intact until the
    new one is fully written: a task retry mid-write re-reads valid
    data, and a crash leaves either the old or the new state, never a
    mix.  (A table format — Iceberg/Delta — replaces the rename with a
    metadata commit; everything above it is unchanged.)
    """
    import os
    import shutil
    import uuid

    from pyspark.sql import Window

    spark = updates.sparkSession
    # Only a MISSING target means "first generation".  Any other read
    # failure (corrupt footer, transient IO) must propagate: treating it
    # as empty state would let the rename swap below silently replace —
    # and then delete — the previous generation's data.
    if os.path.exists(target_dir):
        existing = spark.read.parquet(target_dir).select(*updates.columns)
    else:
        existing = None
    merged = updates if existing is None else updates.unionByName(existing)
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    tmp_dir = f"{target_dir}.tmp-{uuid.uuid4().hex[:8]}"
    latest.write.mode("overwrite").parquet(tmp_dir)
    old_dir = f"{target_dir}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(target_dir):
        os.rename(target_dir, old_dir)
    os.rename(tmp_dir, target_dir)
    shutil.rmtree(old_dir, ignore_errors=True)


def compact_parquet_dir(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files and swap it in via rename.

    Streaming sinks and incremental batch appends accumulate files far
    below the efficient scan size; at 100 TB the resulting task-per-file
    scheduling and footer overhead dominate reads.  This is the
    maintenance pass a table format runs as 'OPTIMIZE' — here over plain
    parquet with the same temp-dir + rename generation swap as
    merge_upsert (old data intact until the new generation is complete).

    Swap semantics (NOT atomic, local-FS only — same contract as
    merge_upsert): the visible name changes via TWO sequential
    os.renames, so a crash between them leaves the dataset reachable
    only under its ``.old-*`` generation name (data is never lost, but
    ``path`` is briefly absent and a concurrent reader can fail
    mid-swap).  POSIX rename also doesn't exist on object stores (S3
    "rename" is copy+delete).  Single-writer maintenance windows are
    the intended use; a production deployment on shared/object storage
    should use a table format (Delta/Iceberg) whose manifest commit IS
    atomic, or a versioned-generation directory plus a manifest flip.

    Returns the number of files written.
    """
    import math
    import os
    import shutil
    import uuid

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp_dir = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    # coalesce, not repartition: compaction must not shuffle — it only
    # concatenates scan partitions into fewer output files.
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp_dir)
    old_dir = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old_dir)
    os.rename(tmp_dir, path)
    shutil.rmtree(old_dir, ignore_errors=True)
    return n_files


def write_zordered(
    df: DataFrame,
    cols: "list[str] | tuple[str, ...]",
    path: str,
    n_files: int = 8,
) -> None:
    """Z-order clustered parquet layout (the OPTIMIZE ZORDER primitive),
    n-dimensional: range-partition + sort the frame by the Morton
    interleave of the key columns, so every output file's min/max range
    is narrow in EVERY dimension and a predicate on ANY key column
    prunes row groups via parquet statistics.  At 100 TB this is the
    difference between a full scan and touching a handful of files for
    a multi-dimension selective query; the write itself is one range
    shuffle.  Per-dimension bit width shrinks as dimensions grow
    (layout.default_bits) so the code always fits a signed 64-bit long.
    """
    from mapreducer_spark.functions.layout import (
        default_bits,
        morton_code_nd,
        normalize_bits,
    )

    if isinstance(cols, str):
        raise TypeError("cols must be a sequence of column names")
    bits = default_bits(len(cols))
    # Normalize EVERY dimension to the full per-dimension bit range
    # first (min-max scaling, one tiny agg broadcast back).
    # Unnormalized columns are the classic Z-order failure: whichever
    # column uses higher bit positions dominates the sort and the other
    # dimensions get no locality at all (caught by the layout test
    # before this fix).  Production table formats do the same via
    # per-column range ids.
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(c).alias(f"__min{i}"))
        aggs.append(F.max(c).alias(f"__max{i}"))
    stats = df.agg(*aggs)
    with_stats = df.crossJoin(F.broadcast(stats))
    zc = morton_code_nd(
        [
            normalize_bits(
                F.col(c), F.col(f"__min{i}"), F.col(f"__max{i}"), bits
            )
            for i, c in enumerate(cols)
        ],
        bits,
    )
    drop_cols = [f"__min{i}" for i in range(len(cols))] + [
        f"__max{i}" for i in range(len(cols))
    ]
    (
        with_stats.withColumn("__z", zc)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *drop_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


# Z-order recipes for the warehouse's fact tables: the 2-3 selective
# columns ad-hoc analytics actually filter on together.  (The time key
# stays a DIRECTORY partition in ingest_warehouse — Z-order is the
# within-partition complement, not a replacement.)
_WAREHOUSE_ZORDER: dict[str, tuple[str, ...]] = {
    "orders": ("o_custkey", "o_totalprice"),
    "events": ("user_id", "value"),
    "lineitem": ("l_partkey", "l_suppkey", "l_quantity"),
}


def ingest_warehouse_zordered(
    spark: SparkSession,
    sf_dir: str,
    warehouse_dir: str,
    n_files: int = 8,
    tables: list[str] | None = None,
) -> dict[str, str]:
    """Z-order clustered variant of the warehouse fact tables
    (VERDICT r4 #4): each table in _WAREHOUSE_ZORDER is rewritten
    sorted by the Morton interleave of its recipe columns (lineitem
    demonstrates the 3-D code).  Returns {table: path}.  Dimension
    tables don't benefit (broadcast-joined, never range-scanned) and
    are left to ingest_warehouse.  ``tables`` restricts the rewrite to
    a subset (each table costs a stats agg + range shuffle + sort)."""
    out: dict[str, str] = {}
    for name, cols in _WAREHOUSE_ZORDER.items():
        if tables is not None and name not in tables:
            continue
        p = f"{warehouse_dir}/{name}_z"
        write_zordered(load_table(spark, sf_dir, name), list(cols), p, n_files)
        out[name] = p
    return out
