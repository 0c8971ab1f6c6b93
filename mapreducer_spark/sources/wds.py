"""WebDataset-style tar-shard I/O — the interchange format multimodal
training jobs actually consume (Beaumont et al. img2dataset / WebDataset
convention: a dataset is a directory of ``.tar`` shards; each sample is a
run of files sharing a basename key, one file per modality/extension,
e.g. ``000042.jpg`` + ``000042.json``).

Spark-first shape:

- **Writer** (``write_wds_shards``): deterministic content-hash shard
  assignment (the ``corpus_shard_assignment`` recipe — reruns place every
  sample in the same shard) and ONE ``groupBy(shard).applyInPandas`` that
  packs each shard's samples into a tar and returns a manifest row — the
  sink is expressed as a transformation, so 1000 executors write 1000
  shards in parallel and the driver only sees the manifest.  Tar entries
  are emitted with pinned mtime/uid/gid, samples sorted by key and files
  by extension, so shard bytes are REPRODUCIBLE: writing the same frame
  twice yields byte-identical shards (tested) — which is what makes
  shard-level caching/rsync of a regenerated dataset work.
- **Reader** (``read_wds_shards``): ``binaryFile`` scan of the shard glob
  + Arrow-batched ``tarfile`` extraction back to (shard, key, ext,
  payload) rows.  Each tar is one ``binaryFile`` row, so shard size is
  the read-parallelism unit, exactly as in WebDataset training loaders.

Stdlib ``tarfile``/``io`` only — no external deps.  Payloads are opaque
``binary`` (the multimodal column contract, operators/multimodal.py);
this module moves bytes, never decodes them.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducer_spark.functions.hashes import md5_int64

_MANIFEST_SCHEMA = "shard string, n_samples long, n_files long, n_bytes long"


def write_wds_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
) -> DataFrame:
    """Pack ``df`` — rows of (key string, ext string, payload binary) —
    into ``n_shards`` WebDataset tar shards under ``out_dir``; returns
    the manifest DataFrame (shard, n_samples, n_files, n_bytes).

    Shard assignment is the deterministic content hash md5(key) %
    n_shards: a rerun (or a backfill of one corrupted shard) reproduces
    the identical placement, and all of a key's files land in the same
    shard next to each other — the sample-contiguity contract WebDataset
    readers rely on.  The manifest is the ONLY thing that crosses back
    to the driver; calling ``.collect()`` on it (a few rows) is the
    commit point.
    """
    os.makedirs(out_dir, exist_ok=True)
    shard = (md5_int64(F.col("key")) % n_shards).cast("int")

    def pack(pdf):
        import pandas as pd

        shard_id = int(pdf["shard_id"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard_id:06d}.tar")
        # Sample-contiguous, fully deterministic member order.
        pdf = pdf.sort_values(["key", "ext"], kind="mergesort")
        n_bytes = 0
        with tarfile.open(path, "w") as tf:
            for key, ext, payload in zip(
                pdf["key"], pdf["ext"], pdf["payload"]
            ):
                data = bytes(payload)
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                # Pin every nondeterministic tar header field so shard
                # bytes are reproducible run-to-run.
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
                n_bytes += len(data)
        return pd.DataFrame(
            {
                "shard": [os.path.basename(path)],
                "n_samples": [int(pdf["key"].nunique())],
                "n_files": [len(pdf)],
                "n_bytes": [n_bytes],
            }
        )

    return (
        df.select("key", "ext", "payload", shard.alias("shard_id"))
        .groupBy("shard_id")
        .applyInPandas(pack, schema=_MANIFEST_SCHEMA)
    )


def read_wds_shards(spark: SparkSession, pattern: str) -> DataFrame:
    """Read WebDataset tar shards matching ``pattern`` back into rows of
    (shard, key, ext, payload).  One ``binaryFile`` row per tar — shard
    size is the parallelism unit; extraction is Arrow-batched and
    streams members from an in-memory BytesIO, never touching local
    disk.

    Memory contract: each WHOLE tar is held in executor memory while it
    is unpacked (binaryFile delivers the full content column), so shards
    must be sized well under the executor heap — the writer's
    ``max_shard_bytes`` default keeps them so; enforce the same bound on
    foreign shards before pointing this reader at them.

    Foreign-shard edge (ADVICE r8): a tar member with NO dot in its name
    is legal WebDataset-adjacent input; ``rpartition('.')`` used to
    file it under key='' with the whole name as ext, silently merging
    all such members into one sample.  Dotless names now keep the full
    member name as the KEY with ext='' — each stays its own sample and
    nothing is dropped."""

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            shards, keys, exts, payloads = [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        key, dot, ext = m.name.rpartition(".")
                        if not dot:
                            # Dotless member: the whole name is the key.
                            key, ext = m.name, ""
                        shards.append(name)
                        keys.append(key)
                        exts.append(ext)
                        payloads.append(tf.extractfile(m).read())
            yield pd.DataFrame(
                {
                    "shard": shards,
                    "key": keys,
                    "ext": exts,
                    "payload": payloads,
                }
            )

    return (
        spark.read.format("binaryFile")
        .load(pattern)
        .select("path", "content")
        .mapInPandas(
            extract, schema="shard string, key string, ext string, payload binary"
        )
    )
