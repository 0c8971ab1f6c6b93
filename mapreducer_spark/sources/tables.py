"""Parquet table sources (SURVEY.md §2.1 S4).

The driver fixtures are one parquet file per table under an sf dir
(TESTDATA.md).  At 100 TB each "table" would be a partitioned parquet
dataset; ``spark.read.parquet`` handles both shapes identically, and
Catalyst pushes filters/column pruning into the scan (verified in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 rows; part/supplier/customer scale with sf but
# stay orders of magnitude below the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier", "part", "customer")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS) in some fixture
        # generations (Spark rejects it by default; with
        # nanosAsLong it reads as int64) and as TIMESTAMP(MICROS) in
        # others (reads as TIMESTAMP_NTZ).  Normalize both to a plain
        # microsecond TimestampType: nanos are truncated with integer
        # division (a double round-trip would lose precision at ~1.7e18
        # ns; DuckDB's TIMESTAMP_NS -> python datetime conversion
        # truncates identically), NTZ is reinterpreted in the UTC
        # session zone (same wall-clock, matching DuckDB's naive read).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            return df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a CPU-bound scan UP to cluster parallelism when the
    input arrives in fewer partitions than cores.

    Small parquet fixtures land in a single input split, which serializes
    per-row-heavy operators (tokenization, n-gram scans, hashing) onto one
    core while 31 idle.  At 100 TB the scan already has thousands of
    splits, ``getNumPartitions() >= target`` holds, and this is a no-op —
    so the helper costs nothing at scale and only fixes the small-file
    regime.  The explicit ``repartition(n)`` is deliberately a
    user-specified partition count: AQE's partition coalescing respects it
    and will not merge the tiny shuffle blocks back into one task.

    Streaming frames pass through untouched (``.rdd`` is illegal on them;
    micro-batch parallelism is the source's concern).

    The "already parallel?" decision reads LEAF-FILE SIZES, not
    ``df.rdd`` (optimization r13, guide §1.2/§7.3): ``.rdd`` forces
    physical planning and — under AQE — executes upstream broadcast
    stages (measured 0.1-0.5 s plus a driver job PER CALL at build
    time, across ~70 call sites).  The estimate reproduces Spark's own
    split packing (total bytes + one openCost per file, divided by
    maxPartitionBytes); every call site feeds a scan (possibly
    select/filter/broadcast-join on top), so the file list is the
    scan's true input.  Frames with no resolvable files (future
    checkpointed/derived inputs) fall back to the old ``.rdd`` check.
    """
    if df.isStreaming:
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    est = _estimated_scan_splits(df, saturate_at=target)
    if est is not None:
        if est >= target:
            return df
        return df.repartition(target)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _size_to_bytes(s: str) -> int:
    s = s.strip().lower()
    mult = 1
    for suf, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
        ("b", 1),
    ):
        if s.endswith(suf):
            mult = m
            s = s[: -len(suf)]
            break
    return int(s) * mult


def _uri_size(uri: str, sc) -> int | None:
    """Length of one leaf file: a local stat for ``file:`` URIs, a
    Hadoop ``FileStatus.getLen`` through the JVM gateway for everything
    else (s3a/hdfs/abfs/...), so the metadata fast path survives the
    100 TB object-storage posture instead of silently resurrecting the
    ``.rdd`` planning job (VERDICT r13 #3/#6).  The Hadoop FileSystem
    instance is cached per (scheme, authority) by Hadoop itself, so the
    per-file cost is one metadata RPC, bounded further by the caller's
    saturation early-exit.  None = unstattable (caller falls back)."""
    import os
    from urllib.parse import unquote, urlparse

    p = urlparse(uri)
    if p.scheme in ("", "file"):
        try:
            return os.path.getsize(unquote(p.path))
        except OSError:
            return None
    try:
        jvm = sc._jvm
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
        return int(fs.getFileStatus(path).getLen())
    except Exception:
        return None


def _estimated_scan_splits(
    df: DataFrame, saturate_at: int | None = None
) -> int | None:
    """ceil((bytes + n_files * openCost) / maxPartitionBytes) over the
    frame's leaf files, from driver-side metadata only.  None when any
    file is unstattable or a conf value is unparseable (caller falls
    back to the .rdd check).  ``saturate_at`` short-circuits the file
    walk once the running estimate reaches it — the caller only needs
    the >= comparison, and the estimate is monotone in the files seen,
    so a thousands-of-files production scan stats a handful of objects.

    Deliberately NOT the full FilePartition formula (which clamps the
    split size to max(openCost, totalBytes/minPartitionNum)): on
    single-row-group files the clamped count says "32 splits" while
    only the row-group-bearing split does work, and overestimating
    parallelism here would skip a repartition that CPU-bound per-row
    operators genuinely need.  bytes/maxPartitionBytes underestimates
    (a lower bound on row-group-bearing splits), so the error direction
    is always a cheap extra repartition of a small input, never a
    serialized scan.  Known caveat (ADVICE r13): ``inputFiles`` ignores
    partition pruning, so a heavily-pruned partitioned scan can read
    high — every current call site feeds an unpruned leaf scan."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    try:
        conf = df.sparkSession.conf
        mpb = _size_to_bytes(
            conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
        open_cost = _size_to_bytes(
            conf.get("spark.sql.files.openCostInBytes", "4m")
        )
    except Exception:
        return None
    if mpb <= 0:
        return None
    sc = df.sparkSession.sparkContext
    total = 0
    for n_seen, uri in enumerate(files, start=1):
        size = _uri_size(uri, sc)
        if size is None:
            return None
        total += size
        if saturate_at is not None:
            est = max(1, -(-(total + n_seen * open_cost) // mpb))
            if est >= saturate_at:
                return est
    return max(1, -(-(total + len(files) * open_cost) // mpb))
