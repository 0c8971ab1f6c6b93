"""MLlib LSH variants (SURVEY.md §7.3): the library-native twins of the
hand-rolled LSH paths in dedup.py / similarity.py.

- MinHashLSH over HashingTF'd token shingles -> approxSimilarityJoin
- BucketedRandomProjectionLSH over embeddings -> approxNearestNeighbors

Fixed seeds make both deterministic.  These are **parity demos, not
production paths** (the custom implementations in dedup.py /
similarity.py carry the hash-checked semantics), so they are covered by
``tests/test_llm_ops.py`` rather than registered as driver queries —
MLlib's hash families aren't SQL-expressible, and a permanently
rows-only driver row carries no information.
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    HashingTF,
    MinHashLSH,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducer_spark.functions.text import SPARK_TOKEN_SPLIT_RE
from mapreducer_spark.operators.dedup import docs_with_near_dups, shingle_col
from mapreducer_spark.sources import load_table

_SEED = 42


def dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH near-dup pairs (L2, library variant): 3-token
    shingles -> HashingTF(2^18) -> MinHashLSH(4 tables),
    approxSimilarityJoin at shingle-Jaccard distance <= 0.3.  Shingles,
    not raw tokens: token-level Jaccard saturates on small vocabularies
    (68k false pairs on the fixture corpus).  Deterministic (seed pinned).
    Tests-only parity twin of ``dedup.minhash_lsh_pairs``."""
    corpus = docs_with_near_dups(spark, sf_dir)
    toks = F.filter(
        F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE), lambda x: F.length(x) > 0
    )
    with_toks = corpus.select("doc_id", toks.alias("toks")).where(
        F.size("toks") > 0
    )
    shingled = with_toks.select(
        "doc_id", shingle_col(F.col("toks")).alias("tokens")
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(shingled)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=4, seed=_SEED
    )
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.3, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round(F.col("jaccard_dist"), 6).alias("jaccard_dist"),
        )
    )


def ann_random_projection_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH ANN over embeddings (L3,
    library variant): Euclidean buckets, approx join within distance
    1.45.  Deterministic (seed pinned).  Tests-only parity twin of the
    custom IVF/sign-bucket paths in similarity.py."""
    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("v")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="v",
        outputCol="hashes",
        bucketLength=0.5,
        numHashTables=4,
        seed=_SEED,
    )
    model = brp.fit(em)
    queries = em.where(F.col("vec_id") < 5)
    # Random 64-dim embeddings with ~unit norms sit at pairwise Euclidean
    # distance ~sqrt(2); 1.45 keeps genuine near neighbors without
    # degenerating into a cross join.
    pairs = model.approxSimilarityJoin(queries, em, 1.45, distCol="euclid_dist")
    return (
        pairs.where(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("q_id"),
            F.col("datasetB.vec_id").alias("vec_id"),
            F.round(F.col("euclid_dist"), 6).alias("euclid_dist"),
        )
    )
