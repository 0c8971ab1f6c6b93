"""`key : value` files as a first-class Spark 4 Python Data Source.

text_corpus.read_kv_lines covers the reference's reducer-input format
(reference src/reducer.c:17-21) by post-processing spark.read.text;
this module re-expresses the SAME format as a registered custom
connector using the Spark 4 Python Data Source API (SPARK-44076), so it
composes like any built-in format:

    spark.dataSource.register(KvLinesDataSource)
    spark.read.format("kvlines").option("sep", " : ").load(path)

Why both exist: the text+split route is the production path (JVM scan,
codegen, pushdown); the DataSource route is the EXTENSIBILITY demo —
the seam where a real deployment would wire a format Spark genuinely
cannot read (a bespoke binary log layout, a service snapshot dump), with
partition planning per file and Arrow-batched Python readers.  A parity
test (tests/test_kv_datasource.py) pins both routes to identical rows.

Scale notes: partitions() returns one InputPartition per file, so a
directory of N files fans out to N parallel reader tasks exactly like
the built-in file sources; each reader streams a single file
(iterator, not a materialized list), keeping memory flat regardless of
file size.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

_KV_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("value", LongType()),
    ]
)


class _KvFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class KvLinesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.root = options["path"]
        self.sep = options.get("sep", " : ")

    def partitions(self) -> list[InputPartition]:
        # One partition per regular file — the reference's opendir +
        # DT_REG filter (mapper.c:95-117) restated as partition planning.
        if os.path.isfile(self.root):
            return [_KvFilePartition(self.root)]
        parts = [
            _KvFilePartition(os.path.join(self.root, name))
            for name in sorted(os.listdir(self.root))
            if os.path.isfile(os.path.join(self.root, name))
            and not name.startswith(("_", "."))
        ]
        if not parts:
            raise FileNotFoundError(f"no kv files under {self.root!r}")
        return parts

    def read(self, partition: _KvFilePartition) -> Iterator[tuple]:
        sep = self.sep
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                # First-separator split: same contract as read_kv_lines
                # (keys can't contain the separator; reference scanf
                # limitation, SURVEY.md §4.4).
                head, _, tail = line.partition(sep)
                try:
                    yield head, int(tail)
                except ValueError:
                    yield head, None


class KvLinesDataSource(DataSource):
    """spark.read.format("kvlines") — the reference's reducer.out format."""

    @classmethod
    def name(cls) -> str:
        return "kvlines"

    def schema(self) -> StructType:
        return _KV_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return KvLinesReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "DataSourceWriter":
        return KvLinesWriter(self.options, overwrite)


class _KvCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class KvLinesWriter(DataSourceWriter):
    """Per-task writer: each partition streams to a uniquely-named part
    file under a task-temporary name; commit() renames the full set into
    place and abort() removes stragglers — the standard two-phase file
    sink protocol, so a failed/speculative task never leaves a partial
    part file visible (reference src/reducer.c:23-35 wrote one sorted
    file with no atomicity; this is the distributed restatement).

    Mode semantics (commit-time, driver-side, after every task succeeded):
    every generation's part files carry a unique run suffix
    (``part-NNNNN-<run>.txt``), so a commit can never clobber an earlier
    generation's files.  ``append`` just renames the new set in.
    ``overwrite`` renames the new generation in FIRST and deletes the
    previous generation's files LAST — a driver crash mid-commit leaves
    a superset (old + new merged) rather than an empty or truncated
    table, and the previous generation is never gone before the new one
    is fully visible.  Remaining non-atomic window, by design: a reader
    listing the directory between the first new rename and the last old
    delete merges both generations; a true point-in-time swap needs a
    manifest layer — that's exactly what sources/snapshots.py adds on
    top (commit = one O_EXCL manifest create), so use snapshot_write
    when readers must never observe the transition.

    SINGLE CONCURRENT COMMITTER per directory (ADVICE r7): overwrite's
    crash-safety story assumes overwrite commits do not interleave.  Two
    drivers overwriting at once can each list the pre-existing files as
    ``stale`` before either renames its generation in, so neither
    deletes the other's new files and readers see both new generations
    merged PERMANENTLY (not just during the transient window above) —
    there is no run ordering a directory listing could resolve without a
    manifest, and ``append`` legitimately needs every run live, so the
    reader cannot filter to "newest run" either.  Serialize overwrite
    commits externally, or use sources/snapshots.py, whose O_EXCL
    versioned manifests make concurrent writers rebase instead of merge."""

    def __init__(self, options: dict, overwrite: bool = False) -> None:
        self.root = options["path"]
        self.sep = options.get("sep", " : ")
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.root, exist_ok=True)
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(
            self.root, f"_tmp-part-{pid:05d}-{uuid.uuid4().hex[:8]}.txt"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(f"{row[0]}{self.sep}{row[1]}\n")
                n += 1
        return _KvCommit(tmp, n)

    def commit(self, messages: list[WriterCommitMessage]) -> None:
        import uuid

        run = uuid.uuid4().hex[:8]
        if self.overwrite:
            stale = [
                name
                for name in os.listdir(self.root)
                if name.startswith("part-") and name.endswith(".txt")
            ]
            # New generation IN first (unique run suffix: cannot collide
            # with the stale set), stale generation OUT last — a crash
            # in between leaves old+new merged, never an empty table.
            for i, m in enumerate(messages):
                final = os.path.join(self.root, f"part-{i:05d}-{run}.txt")
                os.replace(m.path, final)
            for name in stale:
                try:
                    os.remove(os.path.join(self.root, name))
                except OSError:
                    pass  # concurrent overwrite already removed it
        else:
            for i, m in enumerate(messages):
                final = os.path.join(self.root, f"part-{i:05d}-{run}.txt")
                os.replace(m.path, final)

    def abort(self, messages: list[WriterCommitMessage]) -> None:
        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass
