"""Multimodal columns (SURVEY.md §2.10 L5).

Media assets are opaque ``binary`` payloads + typed metadata structs —
the standard 100 TB layout (bytes inline in parquet or pointers to object
storage; metadata columns for pruning).  The container has no image/audio
libraries, so the DECODE step is stubbed (deterministic fake, clearly
marked); everything Spark-side — schema, batching, Arrow exchange,
partition behavior — is real and tested.

``multimodal_metadata`` is the oracle-checked query: payload synthesis
(UTF-8 bytes of text as a stand-in asset), byte length, sha256 digest,
and a metadata struct — exercising binary columns end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mapreducer_spark.functions.text import ORACLE_TOKEN_LIST_SNIPPET
from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table

ASSET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("content_type", StringType()),
        StructField("byte_len", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("byte_len", LongType()),
    ]
)


def assets_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset table synthesized from documents (payload = UTF-8
    bytes standing in for image data)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/fake").alias("content_type"),
        F.octet_length(payload).cast("long").alias("byte_len"),
    )


try:  # Optional dependency: real decode activates when PIL is present.
    from PIL import Image as _PILImage
except ImportError:  # default container has no imaging libs
    _PILImage = None

# Content types routed through the real decoder (when available); the
# synthesized fixture assets are "image/fake" and always use the
# deterministic stand-in, so fixture hashes never depend on PIL.
_REAL_IMAGE_TYPES = frozenset(
    {"image/png", "image/jpeg", "image/bmp", "image/gif"}
)


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decoder: Arrow-batched, one pandas frame per parquet
    row-group-ish batch — the real shape of a 100 TB media decode stage.

    Rows with a real image content type decode through PIL when that
    optional dependency is importable (``_decode_real``); everything
    else — and every row when PIL is absent — uses the deterministic
    fake (dimensions derived from payload bytes) so the pipeline is
    testable end-to-end in a bare container.
    """
    for pdf in batches:
        lens = pdf["payload"].map(len)
        # Deterministic fake "decode": dimensions derived from content.
        widths = (lens % 640 + 16).astype("int64")
        heights = (lens % 480 + 16).astype("int64")
        if _PILImage is not None:
            mask = pdf["content_type"].isin(_REAL_IMAGE_TYPES)
            if mask.any():
                dims = pdf.loc[mask, "payload"].map(_decode_real)
                widths = widths.copy()
                heights = heights.copy()
                widths.loc[mask] = dims.map(lambda t: t[0])
                heights.loc[mask] = dims.map(lambda t: t[1])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": widths.astype("int32"),
                "height": heights.astype("int32"),
                "n_frames": pd.Series([1] * len(pdf), dtype="int32"),
                "byte_len": lens.astype("int64"),
            }
        )


def _decode_real(payload: bytes) -> tuple[int, int]:
    """Real image decode -> (width, height) via PIL when importable;
    loud NotImplementedError otherwise (reference contract is bytes in,
    records out — src/mapper.c:44-66 — at the media modality)."""
    if _PILImage is None:
        raise NotImplementedError(
            "real image decode requires PIL — not available in this "
            "container; decode_image_batch uses the deterministic fake "
            "instead"
        )
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        return im.width, im.height


def decoded_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal pipeline: binary scan -> Arrow-batched decode."""
    return assets_df(spark, sf_dir).mapInPandas(
        decode_image_batch, schema=DECODED_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames_batch(
    batches: Iterator[pd.DataFrame], every_n: int = 4
) -> Iterator[pd.DataFrame]:
    """Video-modality stub: sample every Nth 'frame' from each payload.

    Real frame extraction needs ffmpeg (absent here); the deterministic
    stand-in treats the payload as fixed 16-byte frames and keeps every
    ``every_n``-th — the Spark-side shape (1 row in -> K frame rows out,
    Arrow-batched, frame bytes as binary) is exactly the production one.
    """
    for pdf in batches:
        out_ids, out_idx, out_bytes = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            frames = [
                payload[i : i + 16] for i in range(0, len(payload), 16)
            ]
            for j in range(0, len(frames), every_n):
                out_ids.append(doc_id)
                out_idx.append(j)
                out_bytes.append(bytes(frames[j]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int32"),
                "frame_bytes": out_bytes,
            }
        )


def sampled_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary scan -> Arrow-batched 1->K frame expansion (video stub)."""
    return assets_df(spark, sf_dir).mapInPandas(
        sample_frames_batch, schema=FRAME_SCHEMA
    )


@register(
    "multimodal_metadata",
    oracle="""
SELECT
  doc_id,
  octet_length(encode(text))          AS byte_len,
  sha256(text)                        AS digest,
  'image/fake'                        AS content_type,
  (octet_length(encode(text)) > 256)  AS is_large
FROM documents
""",
    doc="Binary payload plumbing: synthesize asset bytes, compute length + "
    "sha256 digest + metadata (L5). Decode stage itself is the "
    "mapInPandas pipeline in decoded_assets() (tested, not oracled).",
    tags=("llm", "multimodal"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = assets_df(spark, sf_dir)
    return a.select(
        "doc_id",
        "byte_len",
        F.sha2("payload", 256).alias("digest"),
        "content_type",
        (F.col("byte_len") > 256).alias("is_large"),
    )


# --------------------------------------------------------------------------
# Round 2: image resize + audio feature extraction (stubs with real
# Spark plumbing, SURVEY.md §2.10 L5)
# --------------------------------------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_bytes", BinaryType()),
    ]
)

_RESIZE_TARGET = (64, 64)


def resize_images_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas image-resize stage.

    Real resizing needs PIL/libvips (absent in this container); the
    deterministic stand-in emits a fixed-size byte strided sample of the
    payload, so output size is bounded like a real thumbnail.  The Spark
    side — binary in, fixed-dimensions binary out, Arrow batches — is
    the production shape: at 100 TB this is a map-only stage whose
    output is ~3 orders of magnitude smaller than its input, so it runs
    BEFORE any shuffle/repartition in a media pipeline.
    """
    w, h = _RESIZE_TARGET
    target_len = w * h // 64  # stub thumbnail byte budget
    for pdf in batches:
        out = []
        for payload in pdf["payload"]:
            stride = max(1, len(payload) // target_len)
            out.append(bytes(payload[::stride][:target_len]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pd.Series([w] * len(pdf), dtype="int32"),
                "height": pd.Series([h] * len(pdf), dtype="int32"),
                "resized_bytes": out,
            }
        )


def resized_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary scan -> Arrow-batched resize (image-modality stub)."""
    return assets_df(spark, sf_dir).mapInPandas(
        resize_images_batch, schema=RESIZED_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", IntegerType()),
    ]
)


_AUDIO_WINDOW_BYTES = 256


def audio_features_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas audio feature extraction: treat the payload as signed
    8-bit PCM and compute per-window RMS + zero-crossing counts.

    Unlike the image/video stages this is NOT a stub — byte-level DSP
    needs only numpy, so the features are real; swapping in a true codec
    front-end (ffmpeg decode to PCM) would change only the first line.
    1 row in -> K window rows out, the shape of any framing stage
    (spectrograms, VAD, chunked ASR) at scale.
    """
    import numpy as np

    for pdf in batches:
        ids, idxs, rmss, zcs = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
            n_win = len(samples) // _AUDIO_WINDOW_BYTES
            for wi in range(n_win):
                w = samples[
                    wi * _AUDIO_WINDOW_BYTES : (wi + 1) * _AUDIO_WINDOW_BYTES
                ]
                ids.append(doc_id)
                idxs.append(wi)
                rmss.append(round(float(np.sqrt(np.mean(w * w))), 6))
                zcs.append(int(np.sum(np.signbit(w[:-1]) != np.signbit(w[1:]))))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "window_idx": pd.Series(idxs, dtype="int32"),
                "rms": pd.Series(rmss, dtype="float64"),
                "zero_crossings": pd.Series(zcs, dtype="int32"),
            }
        )


def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary scan -> Arrow-batched windowed audio features."""
    return assets_df(spark, sf_dir).mapInPandas(
        audio_features_batch, schema=AUDIO_FEATURE_SCHEMA
    )


@register(
    "doc_embedding_join",
    oracle=r"""
SELECT
  d.doc_id,
  d.lang,
  len(list_filter(string_split_regex(lower(d.text), '[^\p{L}\p{N}]+'),
                  x -> length(x) > 0)) AS n_tokens,
  round(sqrt(list_sum(list_transform(e.embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS emb_norm
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
    doc="Cross-modal join: text stats and embedding norm for the same "
    "asset in one row (documents.doc_id = embeddings.vec_id) — the "
    "canonical multimodal-table layout where each modality is its own "
    "columnar table joined on the asset key. One shuffle on the key "
    "(or zero with co-bucketed ingest, see tests/test_bucketing*).",
    tags=("llm", "multimodal", "join"),
)
def doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreducer_spark.functions.text import SPARK_TOKEN_SPLIT_RE

    d = load_table(spark, sf_dir, "documents")
    em = load_table(spark, sf_dir, "embeddings")
    n_tokens = F.size(
        F.filter(
            F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
            lambda x: F.length(x) > 0,
        )
    )
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return d.join(em, d.doc_id == em.vec_id).select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.round(F.sqrt(sq_sum), 6).alias("emb_norm"),
    )


_PAIR_MIN_TOKENS = 5
_PAIR_MIN_BYTES = 64
_PAIR_CAPTION_TOKENS = 32


@register(
    "multimodal_training_pairs",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, text,
         {ORACLE_TOKEN_LIST_SNIPPET} AS t
  FROM documents
),
emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT
  toks.doc_id,
  array_to_string(t[1:{_PAIR_CAPTION_TOKENS}], ' ') AS caption,
  len(t)                                            AS n_tokens,
  octet_length(encode(text))                        AS byte_len,
  sha256(text)                                      AS payload_digest,
  round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS emb_norm
FROM toks
JOIN emb ON emb.vec_id = toks.doc_id
WHERE len(t) >= {_PAIR_MIN_TOKENS}
  AND octet_length(encode(text)) >= {_PAIR_MIN_BYTES}
""",
    doc="Multimodal TRAINING-PAIR ASSEMBLY (the step after decode in an "
    "image-text pipeline): join the text side (leading-token caption, "
    "token count), the binary side (payload length + sha256 digest — "
    "the dedup/provenance key), and the embedding side (L2 norm as the "
    "quality proxy) into one gated training record per document; pairs "
    "below the token/byte floors are filtered out.  All three joins are "
    "keyed on doc_id, so at scale this is one co-partitioned shuffle "
    "(or zero with bucketed tables); no modality's payload is ever "
    "shuffled more than once.",
    tags=("llm", "multimodal"),
)
def multimodal_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreducer_spark.functions.text import SPARK_TOKEN_SPLIT_RE
    from mapreducer_spark.functions.vectors import norm

    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
        lambda x: F.length(x) > 0,
    )
    text_side = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        toks.alias("t"),
    ).select(
        "doc_id",
        F.array_join(F.slice("t", 1, _PAIR_CAPTION_TOKENS), " ").alias(
            "caption"
        ),
        F.size("t").alias("n_tokens"),
        F.length("payload").alias("byte_len"),
        F.sha2("payload", 256).alias("payload_digest"),
    )
    em = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            norm(F.transform("embedding", lambda x: x.cast("double"))), 6
        ).alias("emb_norm"),
    )
    return (
        text_side.join(em, "doc_id")
        .where(
            (F.col("n_tokens") >= _PAIR_MIN_TOKENS)
            & (F.col("byte_len") >= _PAIR_MIN_BYTES)
        )
        .select(
            "doc_id",
            "caption",
            "n_tokens",
            "byte_len",
            "payload_digest",
            "emb_norm",
        )
    )
