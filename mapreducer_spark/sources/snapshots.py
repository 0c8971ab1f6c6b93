"""Snapshot-versioned parquet tables: time travel on a plain filesystem.

The reference's only sink rewrites one file in place (src/reducer.c:9 —
``freopen("reducer.out")``): a crash mid-write loses the previous
result.  ingest.merge_upsert already upgraded that to a rename swap;
this module adds the last production step — an Iceberg/Delta-style
METADATA COMMIT over immutable data generations:

    table_dir/
      _versions/v00000042.json   <- manifests: one tiny json per commit
      gen-<uuid>/                <- immutable parquet data generations

- A writer materializes a NEW generation dir (never touching live
  data), then publishes it by creating the next manifest file with
  O_EXCL — a single atomic filesystem operation, so commits are O(1)
  metadata regardless of data size, concurrent writers conflict on the
  version number and retry (optimistic concurrency), and a reader
  always resolves a fully-written generation — there is no moment when
  the table is partially visible.
- Readers pin a version for time travel (``version=N``) or take the
  latest.  Every historical version stays readable until expired.
- ``op="append"`` versions list the head's generations plus the new
  one — append is a metadata-only commit, and a conflict loser REBASES
  onto the winner's manifest before retrying, so concurrent appenders
  never lose each other's rows.
- ``snapshot_delete`` / ``snapshot_delete_where`` commit MERGE-ON-READ
  equality-delete files (``del-<uuid>/``): targeted GDPR-style deletes
  with O(|delete set|) write cost, reconciled at read by scoped anti
  joins and folded into clean generations by compact/merge.
- ``snapshot_expire`` removes generations unreferenced by the kept
  manifests (VACUUM), plus age-graced ORPHAN generations that a dead
  writer materialized but never committed.

At 100 TB nothing changes structurally: generations are directories of
parquet written by a full cluster, the commit is still one small file,
and a real object store swaps O_EXCL for a conditional PUT.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_VERSIONS = "_versions"
_GEN_PREFIX = "gen-"
_DEL_PREFIX = "del-"
_MAX_COMMIT_RETRIES = 20


def _versions_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _VERSIONS)


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_versions_dir(table_dir), f"v{version:08d}.json")


def _list_versions(table_dir: str) -> list[int]:
    vdir = _versions_dir(table_dir)
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in os.listdir(vdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version), encoding="utf-8") as f:
        return json.load(f)


def _manifest_dirs(manifest: dict) -> list[str]:
    """Generation dirs composing a version (legacy manifests carried a
    single ``data_dir``; append versions carry the full list)."""
    dirs = manifest.get("data_dirs")
    if dirs is None:
        dirs = [manifest["data_dir"]]
    return list(dirs)


def _manifest_delete_dirs(manifest: dict) -> list[str]:
    """Delete-file generations applying to a version (merge-on-read)."""
    return list(manifest.get("delete_dirs") or [])


def _reconciled_frame(
    spark: SparkSession, table_dir: str, manifest: dict
) -> DataFrame:
    """A version's rows with its delete files applied (merge-on-read).

    Each delete generation is an EQUALITY-DELETE file: a parquet dir of
    rows whose columns form the equality key (full rows for
    delete-these-rows, a key subset for delete-by-key).  Scoping follows
    Iceberg's sequence-number rule: a delete applies only to the data
    generations that existed when it was committed
    (``delete_applies_to``), so a LATER append re-inserting an equal row
    is NOT suppressed.  Reconciliation: group data dirs by their
    applicable delete set, LEFT ANTI JOIN each group on the delete
    file's columns (null-safe), union the groups.  Delete sets are
    typically key lists — Spark's size stats broadcast them
    automatically, so at 100 TB this reads as scan + broadcast-anti.
    """
    from functools import reduce as _reduce

    from pyspark.sql import functions as F

    data_dirs = _manifest_dirs(manifest)
    del_dirs = _manifest_delete_dirs(manifest)
    applies = manifest.get("delete_applies_to", {})
    groups: dict[tuple, list[str]] = {}
    for d in data_dirs:
        key = tuple(
            dd for dd in del_dirs if d in applies.get(dd, data_dirs)
        )
        groups.setdefault(key, []).append(d)
    parts = []
    for key, dirs in groups.items():
        df = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(table_dir, d) for d in dirs]
        )
        for dd in key:
            deld = spark.read.parquet(os.path.join(table_dir, dd))
            cond = _reduce(
                lambda a, b: a & b,
                [df[c].eqNullSafe(deld[c]) for c in deld.columns],
            )
            df = df.join(deld, cond, "left_anti")
        parts.append(df)
    return _reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
    )


def snapshot_write(
    df: DataFrame,
    table_dir: str,
    op: str = "overwrite",
    tag: str | None = None,
) -> int:
    """Commit ``df`` as a new snapshot version of ``table_dir``; returns
    the committed version number.

    ``op="overwrite"`` replaces the table; ``op="append"`` adds ``df``
    on top of the head version (the new manifest lists the head's
    generation dirs plus the new one — data is never rewritten or
    copied, the commit only grows the metadata list, Iceberg-style).
    ``tag`` is an opaque idempotency label recorded in the manifest
    (e.g. the streaming publisher's ``batch-<id>`` — its txnAppId
    equivalent); it has no effect on resolution.

    Data first (immutable generation dir), manifest last (atomic O_EXCL
    create).  On a version-number conflict with a concurrent writer the
    loser RETRIES WITH REBASE: it re-reads the (new) head manifest,
    recomputes its generation list and row count on top of it, and
    re-commits at the next number.  The generation is already on disk,
    so a retry re-publishes metadata, never re-writes data — and two
    interleaved appenders both land: each loser's rebase chains the
    winner's generations, so no committed rows are ever dropped
    (tests/test_metrics_and_ingest.py two-writer stress).
    """
    # op="merge" is NOT accepted here: a merge result is a function of
    # the head it read, so it must commit through snapshot_merge's
    # compare-and-swap loop — this writer's blind rebase would
    # re-publish a stale merge over a concurrent commit (ADVICE r8).
    if op not in ("overwrite", "append"):
        raise ValueError(f"unknown snapshot op {op!r}")
    os.makedirs(_versions_dir(table_dir), exist_ok=True)
    gen = f"{_GEN_PREFIX}{uuid.uuid4().hex[:12]}"
    gen_dir = os.path.join(table_dir, gen)
    df.write.mode("error").parquet(gen_dir)
    n_rows = df.sparkSession.read.parquet(gen_dir).count()

    for _ in range(_MAX_COMMIT_RETRIES):
        # Rebase: resolve the CURRENT head each attempt, so a commit
        # that lost the previous race builds on the winner's manifest.
        versions = _list_versions(table_dir)
        version = (versions[-1] + 1) if versions else 0
        data_dirs, rows = [gen], n_rows
        delete_dirs: list[str] = []
        delete_applies: dict = {}
        if op == "append" and versions:
            try:
                head = _read_manifest(table_dir, versions[-1])
            except (OSError, ValueError):
                continue  # head manifest mid-write/expired; re-resolve
            data_dirs = _manifest_dirs(head) + [gen]
            rows = head.get("rows", 0) + n_rows
            # Merge-on-read deletes ride along: they scope to the data
            # dirs present when they were committed (delete_applies_to),
            # so the appended generation is untouched by them.
            delete_dirs = _manifest_delete_dirs(head)
            delete_applies = head.get("delete_applies_to", {})
        manifest = {
            "version": version,
            "data_dirs": data_dirs,
            "op": op,
            "rows": rows,
            "committed_at": time.time(),
        }
        if delete_dirs:
            manifest["delete_dirs"] = delete_dirs
            manifest["delete_applies_to"] = delete_applies
        if tag is not None:
            manifest["tag"] = tag
        try:
            # Re-anchor the orphan-sweep grace window to COMMIT time:
            # the gen dir's last natural mtime bump was the end of the
            # parquet write, but validation count() + up to
            # _MAX_COMMIT_RETRIES rebases can pass between that and the
            # manifest create, and snapshot_expire measures its grace
            # from the dir mtime (ADVICE r7).
            try:
                os.utime(gen_dir)
            except OSError:
                pass
            # O_EXCL: exactly one writer can publish this version number.
            with open(_manifest_path(table_dir, version), "x", encoding="utf-8") as f:
                json.dump(manifest, f)
            return version
        except FileExistsError:
            continue  # lost the race; rebase onto the new head and retry
    raise RuntimeError(
        f"could not commit to {table_dir!r} after "
        f"{_MAX_COMMIT_RETRIES} version conflicts"
    )


def snapshot_read(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    as_of: float | None = None,
) -> DataFrame:
    """Read a snapshot table — latest version, a pinned historical
    ``version``, or the newest version committed at or before the unix
    timestamp ``as_of`` (``TIMESTAMP AS OF`` time travel; resolution
    uses each manifest's ``committed_at``, so it answers "what did
    readers see at time T" — Iceberg/Delta semantics).  ``version`` and
    ``as_of`` are mutually exclusive.

    Schema EVOLUTION across generations is first-class: an append whose
    DataFrame adds columns widens the table (``mergeSchema`` over the
    version's generation dirs — a real lakehouse table grows columns
    over its lifetime), with rows from pre-widening generations reading
    the added columns as NULL.  Time travel is unaffected: a pinned
    historical version only lists its own generations, so it reads with
    exactly the schema the table had then.  The merge is scoped to the
    resolved version's dirs — one footer read per generation, no
    history-wide scan.
    """
    if version is not None and as_of is not None:
        raise ValueError("pass either version or as_of, not both")
    versions = _list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions under {table_dir!r}")
    if as_of is not None:
        # Newest manifest committed at or before the cutoff.  Scans
        # manifests newest-first and stops at the first hit, so the
        # common "recent timestamp" case reads O(1) manifests.
        for v in reversed(versions):
            m = _read_manifest(table_dir, v)
            if m.get("committed_at", 0) <= as_of:
                version = v
                break
        else:
            raise ValueError(
                f"no version of {table_dir!r} existed at or before "
                f"as_of={as_of} (earliest committed_at: "
                f"{_read_manifest(table_dir, versions[0]).get('committed_at')})"
            )
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(
            f"version {version} not found in {table_dir!r} "
            f"(available: {versions})"
        )
    manifest = _read_manifest(table_dir, version)
    if _manifest_delete_dirs(manifest):
        # Merge-on-read: apply the version's equality-delete files.
        return _reconciled_frame(spark, table_dir, manifest)
    paths = [os.path.join(table_dir, d) for d in _manifest_dirs(manifest)]
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def snapshot_merge(
    updates: DataFrame,
    table_dir: str,
    key_cols: list,
    order_cols: list,
    tag: str | None = None,
    _test_pre_commit_hook=None,
) -> int:
    """MERGE INTO at the snapshot layer: upsert ``updates`` into the
    table's head (latest row per ``key_cols`` across existing ∪ updates,
    "latest" = max over ``order_cols`` with updates outranking existing
    rows on ties) and commit the result as a NEW VERSION; returns the
    committed version number.

    This is the transactional sibling of ``ingest.merge_upsert`` (whose
    rename swap destroys history): here every pre-merge version stays
    time-travel-readable, the commit is the same O_EXCL manifest create
    with optimistic retry, and a crash mid-merge leaves the head
    untouched.  A first merge into an empty table is just the deduped
    updates.  Schema evolution composes: updates may ADD columns (the
    head reads through mergeSchema, pre-existing rows take NULL).

    The merged result is materialized as one new full generation
    (op="merge" manifest) — the Delta/Iceberg copy-on-write MERGE
    strategy.  The merge-on-read sibling exists for DELETES
    (snapshot_delete): reading through snapshot_read means a merge also
    FOLDS any outstanding delete files into its clean generation.

    Tie semantics: an update row with order_cols EQUAL to the existing
    row's wins (__src=1 beats 0 in the ordering), so re-merging the
    same batch is idempotent AND an explicit correction with an
    unchanged timestamp still lands.

    Concurrency (r9): a merge result is a FUNCTION of the head it read,
    so the commit is a COMPARE-AND-SWAP on that head — attempt exactly
    ``head + 1``, and on losing the race RE-READ the new head and
    RE-MERGE before retrying (snapshot_compact's loop, bounded by
    ``_MAX_COMPACT_RETRIES``).  The previous implementation committed
    through snapshot_write, whose op="merge" conflict retry re-published
    the SAME stale merged generation at the next version number —
    silently dropping whatever a concurrent append/merge had committed
    in between (the r8 advisor's lost-update race).  Each losing
    attempt's generation dir is abandoned to the orphan sweep.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = updates.sparkSession
    last_err: str | None = None
    for _ in range(_MAX_COMPACT_RETRIES):
        versions = _list_versions(table_dir)
        head_v = versions[-1] if versions else None
        if head_v is not None:
            existing = snapshot_read(
                spark, table_dir, version=head_v
            ).withColumn("__src", F.lit(0))
            tagged = updates.withColumn("__src", F.lit(1))
            # unionByName with allowMissingColumns: the schema-evolution
            # path (updates add a column -> existing rows read NULL).
            unioned = existing.unionByName(
                tagged, allowMissingColumns=True
            )
        else:
            unioned = updates.withColumn("__src", F.lit(1))
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.col(c).desc() for c in order_cols], F.col("__src").desc()
        )
        merged = (
            unioned.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )
        os.makedirs(_versions_dir(table_dir), exist_ok=True)
        gen = f"{_GEN_PREFIX}{uuid.uuid4().hex[:12]}"
        gen_dir = os.path.join(table_dir, gen)
        merged.write.mode("error").parquet(gen_dir)
        n_rows = spark.read.parquet(gen_dir).count()
        if _test_pre_commit_hook is not None:
            _test_pre_commit_hook()
        target_v = (head_v + 1) if head_v is not None else 0
        manifest = {
            "version": target_v,
            "data_dirs": [gen],
            "op": "merge",
            "rows": n_rows,
            "committed_at": time.time(),
        }
        if head_v is not None:
            manifest["merged_from"] = head_v
        if tag is not None:
            manifest["tag"] = tag
        try:
            os.utime(gen_dir)
        except OSError:
            pass
        try:
            with open(
                _manifest_path(table_dir, target_v), "x", encoding="utf-8"
            ) as f:
                json.dump(manifest, f)
            return target_v
        except FileExistsError:
            # Concurrent commit took our target version: its rows are
            # not in our merged generation, so restart from the NEW
            # head (never chain manifests — that is append's rebase,
            # wrong for a whole-table rewrite).
            last_err = f"lost CAS race at version {target_v}"
            continue
    raise RuntimeError(
        f"could not merge into {table_dir!r} after "
        f"{_MAX_COMPACT_RETRIES} head changes ({last_err})"
    )


def snapshot_delete(
    deletes: DataFrame,
    table_dir: str,
    tag: str | None = None,
    _test_pre_commit_hook=None,
) -> int:
    """MERGE-ON-READ targeted delete (GDPR-style): commit ``deletes`` as
    an EQUALITY-DELETE generation — no data generation is rewritten; the
    head's rows stay on disk and readers reconcile (anti join on the
    delete file's columns) at read time.  Returns the committed version.

    ``deletes``' columns are the equality key: pass full rows to delete
    exactly those rows, or a key-column subset (e.g. just ``user_id``)
    to delete every row matching the keys.  The columns must be a subset
    of the table's columns.

    Scoping (Iceberg's sequence-number rule, recorded as
    ``delete_applies_to``): the delete applies only to the data
    generations present in the head it was committed against — a later
    append that re-inserts an equal row is NOT suppressed.  History is
    preserved: time-travel to a pre-delete version still reads the
    deleted rows; ``snapshot_compact`` / ``snapshot_merge`` fold deletes
    into a clean full generation, and ``snapshot_expire`` reclaims
    delete files no kept manifest references.

    Commit is the same CAS loop as merge: the manifest (and the
    reconciled row count) are functions of the head, so on losing the
    race the new head is re-read and re-counted; the delete generation
    itself is head-independent and is reused across retries.

    Write cost is O(|delete set|) — the copy-on-write alternative
    (snapshot_merge of survivors) rewrites the whole table to drop a
    handful of rows; read cost is one broadcast-sized anti join per
    outstanding delete file, bounded by compaction cadence.
    """
    spark = deletes.sparkSession
    os.makedirs(_versions_dir(table_dir), exist_ok=True)
    gen = f"{_DEL_PREFIX}{uuid.uuid4().hex[:12]}"
    gen_dir = os.path.join(table_dir, gen)
    deletes.write.mode("error").parquet(gen_dir)
    del_cols = set(spark.read.parquet(gen_dir).columns)

    last_err: str | None = None
    for _ in range(_MAX_COMPACT_RETRIES):
        versions = _list_versions(table_dir)
        if not versions:
            raise FileNotFoundError(
                f"no snapshot versions under {table_dir!r}"
            )
        head_v = versions[-1]
        head = _read_manifest(table_dir, head_v)
        head_df = snapshot_read(spark, table_dir, version=head_v)
        missing = del_cols - set(head_df.columns)
        if missing:
            raise ValueError(
                f"delete columns {sorted(missing)} not in table columns "
                f"{sorted(head_df.columns)}"
            )
        applies = dict(head.get("delete_applies_to", {}))
        applies[gen] = _manifest_dirs(head)
        manifest = {
            "version": head_v + 1,
            "data_dirs": _manifest_dirs(head),
            "delete_dirs": _manifest_delete_dirs(head) + [gen],
            "delete_applies_to": applies,
            "op": "delete",
            "committed_at": time.time(),
        }
        # Reconciled count THROUGH the new manifest (exact, one job) so
        # downstream rows accounting (append chains) stays truthful.
        manifest["rows"] = _reconciled_frame(
            spark, table_dir, manifest
        ).count()
        if tag is not None:
            manifest["tag"] = tag
        if _test_pre_commit_hook is not None:
            _test_pre_commit_hook()
        try:
            os.utime(gen_dir)
        except OSError:
            pass
        try:
            with open(
                _manifest_path(table_dir, head_v + 1), "x", encoding="utf-8"
            ) as f:
                json.dump(manifest, f)
            return head_v + 1
        except FileExistsError:
            # Concurrent commit took our version: the delete generation
            # is head-independent, but its scope and the row count are
            # not — re-resolve the new head and retry.
            last_err = f"lost CAS race at version {head_v + 1}"
            continue
    raise RuntimeError(
        f"could not commit delete to {table_dir!r} after "
        f"{_MAX_COMPACT_RETRIES} head changes ({last_err})"
    )


def snapshot_delete_where(
    spark: SparkSession,
    table_dir: str,
    predicate: str,
    tag: str | None = None,
) -> int:
    """DELETE WHERE at the snapshot layer: materialize the head rows
    matching the SQL ``predicate`` as an equality-delete file and commit
    it merge-on-read (see snapshot_delete).  The delete file holds the
    full matched rows — a GDPR audit can time-travel to the delete
    version and read exactly what was removed.  Returns the committed
    version number."""
    head = snapshot_read(spark, table_dir)
    matched = head.where(predicate)
    return snapshot_delete(matched, table_dir, tag=tag)


def snapshot_read_incremental(
    spark: SparkSession,
    table_dir: str,
    since_version: int,
    version: int | None = None,
) -> DataFrame:
    """Read only the rows ADDED between ``since_version`` (exclusive)
    and ``version`` (inclusive; default head) — the append-only
    incremental-consumption fast path (Delta's readChangeFeed /
    Iceberg's incremental scan for appends): generations listed by the
    target manifest but not by the base manifest are exactly the
    appended data, so the read touches only NEW files — no row-level
    diff, no scan of the base (contrast snapshot_diff, which computes
    row-level insert/delete/update CDC and must read both sides).

    Raises if the range crosses a non-append commit (overwrite / merge
    / compact rewrite data, so "new generations" would not mean "added
    rows"); callers fall back to snapshot_diff for those ranges.
    """
    versions = _list_versions(table_dir)
    if since_version not in versions:
        raise ValueError(
            f"since_version {since_version} not found in {table_dir!r}"
        )
    if version is None:
        version = versions[-1]
    if version not in versions or version < since_version:
        raise ValueError(
            f"bad version range {since_version}..{version} for {table_dir!r}"
        )
    for v in versions:
        if since_version < v <= version:
            op = _read_manifest(table_dir, v).get("op")
            if op != "append":
                raise ValueError(
                    f"version {v} is op={op!r}: the range crosses a "
                    "non-append commit; use snapshot_diff for row-level "
                    "CDC instead"
                )
    base = set(_manifest_dirs(_read_manifest(table_dir, since_version)))
    target = _manifest_dirs(_read_manifest(table_dir, version))
    new_dirs = [d for d in target if d not in base]
    if not new_dirs:
        # Zero new generations: an empty frame WITH the table's schema.
        return snapshot_read(spark, table_dir, version=version).limit(0)
    paths = [os.path.join(table_dir, d) for d in new_dirs]
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def snapshot_diff(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int,
    key_cols: list,
) -> DataFrame:
    """Change-data-capture between two snapshot versions: one row per
    changed key with ``change`` in {insert, delete, update} plus the
    old/new value structs — the read-side complement of the versioned
    writer (what a downstream incremental consumer reads instead of
    re-scanning the full table).

    One full-outer join on the key columns; value comparison is a
    null-safe struct equality, so NULL-bearing columns diff correctly.
    At scale both sides are parquet scans with key-hash shuffles — cost
    is proportional to the two versions, not to history length.
    """
    old = snapshot_read(spark, table_dir, from_version)
    new = snapshot_read(spark, table_dir, to_version)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema drift between versions: {old.columns} vs {new.columns}"
        )
    from pyspark.sql import functions as F

    value_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(*key_cols, F.struct(*value_cols).alias("old_value"))
    n = new.select(*key_cols, F.struct(*value_cols).alias("new_value"))
    j = o.join(n, list(key_cols), "full_outer")
    change = (
        F.when(F.col("old_value").isNull(), F.lit("insert"))
        .when(F.col("new_value").isNull(), F.lit("delete"))
        .when(
            ~F.col("old_value").eqNullSafe(F.col("new_value")),
            F.lit("update"),
        )
    )
    return j.select(
        *key_cols, change.alias("change"), "old_value", "new_value"
    ).where(F.col("change").isNotNull())


def snapshot_history(table_dir: str) -> list[dict]:
    """All manifests, oldest first."""
    return [_read_manifest(table_dir, v) for v in _list_versions(table_dir)]


_MAX_COMPACT_RETRIES = 5


def snapshot_compact(
    spark: SparkSession,
    table_dir: str,
    target_rows_per_file: int = 1_000_000,
    _test_pre_commit_hook=None,
) -> int:
    """OPTIMIZE: rewrite the head version's generations into ONE
    right-sized generation and commit it as a new version (op
    ``"compact"``).  Returns the committed version number.

    Why it exists: a long-lived append table accumulates one generation
    dir per commit (a streaming publisher adds one per batch), and each
    generation carries its own small files — the classic lakehouse
    small-file problem.  Readers then pay per-file open cost and the
    scheduler per-split overhead.  Compaction is METADATA-COMPATIBLE
    maintenance: the new manifest lists a single generation holding the
    same rows, history still time-travels (pinned versions keep their
    original generation lists until expired), and ``snapshot_expire``
    reclaims the superseded generations once no kept manifest references
    them.

    Concurrency: compaction must NOT blind-rebase like append does — an
    append that lands between the compactor's read and its commit holds
    rows the compacted generation doesn't have, so chaining manifests
    would silently drop them.  Instead the commit is a COMPARE-AND-SWAP
    on the head version: the compactor attempts exactly ``head + 1``,
    and on losing the race it RESTARTS from the new head (re-reads,
    re-compacts, bounded by ``_MAX_COMPACT_RETRIES``) — Delta's
    OPTIMIZE conflict semantics.  The abandoned generation is left for
    the orphan sweep.

    ``target_rows_per_file`` sizes the rewrite: ceil(rows / target)
    output files via repartition — at 100 TB the same rewrite runs as a
    full-cluster job and the commit is still one manifest create.
    ``_test_pre_commit_hook`` is a test seam invoked after the compacted
    generation is on disk and before the commit attempt (how the race
    test interleaves a concurrent append deterministically).
    """
    last_err: str | None = None
    for _ in range(_MAX_COMPACT_RETRIES):
        versions = _list_versions(table_dir)
        if not versions:
            raise FileNotFoundError(f"no snapshot versions under {table_dir!r}")
        head_v = versions[-1]
        head = _read_manifest(table_dir, head_v)
        n_rows = head.get("rows", 0)
        n_files = max(1, -(-max(n_rows, 1) // target_rows_per_file))
        df = snapshot_read(spark, table_dir, version=head_v)
        gen = f"{_GEN_PREFIX}{uuid.uuid4().hex[:12]}"
        gen_dir = os.path.join(table_dir, gen)
        df.repartition(n_files).write.mode("error").parquet(gen_dir)
        if _test_pre_commit_hook is not None:
            _test_pre_commit_hook()
        manifest = {
            "version": head_v + 1,
            "data_dirs": [gen],
            "op": "compact",
            "rows": n_rows,
            "compacted_from": head_v,
            "committed_at": time.time(),
        }
        try:
            os.utime(gen_dir)
        except OSError:
            pass
        try:
            with open(
                _manifest_path(table_dir, head_v + 1), "x", encoding="utf-8"
            ) as f:
                json.dump(manifest, f)
            return head_v + 1
        except FileExistsError:
            # Concurrent commit landed on our target version: its rows
            # are not in our generation, so restart from the NEW head
            # (never chain — that is append's rebase, wrong here).
            last_err = f"lost CAS race at version {head_v + 1}"
            continue
    raise RuntimeError(
        f"could not compact {table_dir!r} after {_MAX_COMPACT_RETRIES} "
        f"head changes ({last_err})"
    )


_ORPHAN_GRACE_SEC = 24 * 3600
# Floor under orphan_grace_sec: the sweep must never race an in-flight
# commit, and a writer can legitimately spend minutes between its last
# gen-dir touch and the manifest create (validation count + rebase
# retries on a busy table).  snapshot_write re-touches the gen dir just
# before each commit attempt, so the exposure is one attempt's latency —
# 5 min bounds that with a wide margin (ADVICE r7).
_MIN_ORPHAN_GRACE_SEC = 300


def snapshot_expire(
    table_dir: str,
    keep_last: int = 1,
    orphan_grace_sec: float = _ORPHAN_GRACE_SEC,
) -> list[int]:
    """VACUUM: drop all but the last ``keep_last`` versions and delete
    data generations no kept manifest references.  Returns the expired
    version numbers.

    Manifests are removed BEFORE their data dirs: a reader that already
    resolved an expiring manifest may fail on the vanished generation
    (same contract as Iceberg's expire_snapshots), but the kept versions
    are never in danger because their generations are never touched.

    Also sweeps ORPHANED generations — gen dirs referenced by NO
    manifest at all, left behind when a writer died between the data
    write and the manifest commit (or exhausted its conflict retries).
    Without this they accumulate forever, since the manifest-driven
    expiry above only ever sees committed generations (ADVICE r6).  An
    orphan is only removed once its directory mtime is older than
    ``orphan_grace_sec`` (default 24 h, floor ``_MIN_ORPHAN_GRACE_SEC``),
    so an IN-FLIGHT commit whose manifest hasn't landed yet is never
    raced: snapshot_write re-touches the gen dir immediately before each
    manifest-create attempt, anchoring the window to commit time rather
    than to the end of the parquet write.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if orphan_grace_sec < _MIN_ORPHAN_GRACE_SEC:
        raise ValueError(
            f"orphan_grace_sec must be >= {_MIN_ORPHAN_GRACE_SEC} "
            "(a smaller window can sweep an in-flight commit's "
            "generation out from under its manifest)"
        )
    versions = _list_versions(table_dir)
    expire, keep = versions[:-keep_last], versions[-keep_last:]
    keep_gens: set[str] = set()
    for v in keep:
        m = _read_manifest(table_dir, v)
        keep_gens.update(_manifest_dirs(m))
        keep_gens.update(_manifest_delete_dirs(m))
    expire_gens: set[str] = set()
    for v in expire:
        m = _read_manifest(table_dir, v)
        expire_gens.update(_manifest_dirs(m))
        expire_gens.update(_manifest_delete_dirs(m))
    expire_gens -= keep_gens
    for v in expire:
        os.remove(_manifest_path(table_dir, v))
    for gen in expire_gens:
        shutil.rmtree(os.path.join(table_dir, gen), ignore_errors=True)
    # Orphan sweep: on-disk (data or delete) generations no surviving
    # manifest references, older than the grace window.
    now = time.time()
    for name in os.listdir(table_dir):
        if (
            not name.startswith((_GEN_PREFIX, _DEL_PREFIX))
            or name in keep_gens
        ):
            continue
        path = os.path.join(table_dir, name)
        try:
            if now - os.path.getmtime(path) < orphan_grace_sec:
                continue
        except OSError:
            continue  # vanished under us (concurrent expire)
        shutil.rmtree(path, ignore_errors=True)
    return expire
