"""Similarity search over embeddings (SURVEY.md §2.10 L3).

- ``similarity_topk``: exact brute-force cosine top-k — the baseline.
  Query side is tiny and BROADCAST; candidates stream by, so the plan is
  a map-side nested loop + per-query top-k (TakeOrdered-like via window),
  no shuffle of the candidate table.  At 100 TB of vectors this is the
  "scan everything once" exact path.
- ``ann_ivf_topk``: IVF-style approximate path — assign every vector to
  its nearest coarse centroid (broadcast centroids), then search only
  the ``nprobe`` closest clusters per query.  Scan cost drops by
  ~n_clusters/nprobe; recall traded accordingly.  Centroid "training"
  here is a deterministic stand-in (first 16 vectors); production would
  k-means a sample.
- ``embedding_neardup``: near-duplicate vectors via sign-bit LSH
  blocking + exact cosine within buckets (no global cross join).

All vector math is JVM higher-order functions (functions/vectors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducer_spark.functions.vectors import cosine, oracle_sign_bucket, sign_bucket
from mapreducer_spark.registry import register
from mapreducer_spark.sources import load_table

_N_QUERIES = 5
_TOP_K = 10


@register(
    "similarity_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
),
scored AS (
  SELECT
    q.q_id,
    c.vec_id,
    round(list_cosine_similarity(q.qv, c.cv), 6) AS sim
  FROM q CROSS JOIN c
  WHERE q.q_id <> c.vec_id
)
SELECT q_id, vec_id, sim, rnk FROM (
  SELECT q_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
  FROM scored
)
WHERE rnk <= {_TOP_K}
""",
    doc="Exact brute-force cosine top-k: broadcast queries x scan "
    "candidates (L3 baseline).",
    tags=("llm", "similarity"),
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    q = em.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    c = em.select("vec_id", F.col("embedding").alias("cv"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TOP_K)
    )


_N_CENTROIDS = 16
_N_PROBE = 2


def _ivf_topk(
    em: DataFrame, centroids: DataFrame, nprobe: int = _N_PROBE
) -> DataFrame:
    """IVF search core shared by the declared query and the recall
    report: cluster-assign all vectors to broadcast centroids, route
    each query to its ``nprobe`` nearest clusters, exact top-k within
    the probed clusters only."""
    # Assign every vector to its nearest centroid: broadcast NL join +
    # per-vector argmax.  max_by over a (sim, -cent_id) struct instead of
    # a row_number window: one partial-aggregating shuffle of tiny rows
    # rather than a full sort per vec_id partition.
    sim_to_cent = cosine(F.col("embedding"), F.col("cent_v"))
    scored = em.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "cent_id",
        F.round(sim_to_cent, 9).alias("csim"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            "cent_id", F.struct(F.col("csim"), (-F.col("cent_id")).alias("nc"))
        ).alias("cluster")
    )
    assigned = em.join(best, "vec_id").select("vec_id", "embedding", "cluster")

    # Route each query to its nprobe nearest clusters.
    q = em.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    w_probe = Window.partitionBy("q_id").orderBy(
        F.col("qsim").desc(), F.col("cent_id")
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "q_id",
            "qv",
            "cent_id",
            F.round(cosine(F.col("qv"), F.col("cent_v")), 9).alias("qsim"),
        )
        .withColumn("prank", F.row_number().over(w_probe))
        .where(F.col("prank") <= nprobe)
        .select("q_id", "qv", F.col("cent_id").alias("cluster"))
    )

    # Search only the probed clusters.
    sim = F.round(cosine(F.col("qv"), F.col("embedding")), 6)
    w_k = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        assigned.join(F.broadcast(probes), "cluster")
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w_k))
        .where(F.col("rnk") <= _TOP_K)
    )


@register(
    "ann_ivf_topk",
    oracle=None,  # deterministic, but the cluster-routing logic is not
    # reasonably SQL-expressible -> rows-only; similarity_topk
    # hash-checks the same cosine math exactly.
    doc="IVF ANN with TRAINED coarse centroids: seeded KMeans over the "
    "corpus (pinned maxIter — the production quantizer, promoted from "
    "the first-k stand-in per VERDICT r2 #3), broadcast centroids, "
    "cluster-assign all vectors, probe only the nearest clusters per "
    "query (L3 scale path). Recall vs exact is reported by "
    "ann_ivf_kmeans_recall and floor-asserted in tests.",
    tags=("llm", "similarity", "rows-only", "mllib"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return _ivf_topk(em, kmeans_centroids(em))


def kmeans_centroids(em: DataFrame, k: int = _N_CENTROIDS, seed: int = 42) -> DataFrame:
    """Trained IVF centroids: MLlib KMeans with pinned seed/maxIter —
    the production replacement for the first-k stand-in (better-balanced
    clusters -> better ANN recall at the same nprobe)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = em.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("fv")
    )
    km = KMeans(k=k, seed=seed, maxIter=10, featuresCol="fv")
    model = km.fit(vecs)
    centers = model.clusterCenters()
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centers)]
    return em.sparkSession.createDataFrame(rows, "cent_id int, cent_v array<double>")


@register(
    "ann_ivf_kmeans_recall",
    oracle=None,  # self-measuring quality report; rows-only
    doc="ANN quality report: IVF with KMeans-trained centroids (seeded), "
    "recall@10 vs exact brute force per query — one row per query with "
    "its recall. The quality gauge a 100 TB ANN deployment runs on a "
    "sample before trusting the index.",
    tags=("llm", "similarity", "rows-only", "mllib"),
)
def ann_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    approx = _ivf_topk(em, kmeans_centroids(em)).select("q_id", "vec_id")
    exact = similarity_topk(spark, sf_dir).select("q_id", "vec_id")
    hits = approx.join(exact, ["q_id", "vec_id"], "left_semi")
    return (
        exact.groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .join(
            hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hits")),
            "q_id",
            "left",
        )
        .select(
            "q_id",
            (F.coalesce("n_hits", F.lit(0)) / F.col("k")).alias("recall_at_10"),
        )
    )


_NEARDUP_COS = 0.999


@register(
    "embedding_neardup",
    oracle=f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0) AS v
  FROM embeddings WHERE vec_id % 20 = 0
),
bucketed AS (
  SELECT vec_id, v, {oracle_sign_bucket("v")} AS bucket FROM base
)
SELECT
  a.vec_id AS id_a,
  b.vec_id AS id_b,
  round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {_NEARDUP_COS}
""",
    doc="Embedding-cosine near-dup pairs with sign-bit LSH blocking "
    "(L2/L3): synthesized scaled copies must be found; no cross join.",
    tags=("llm", "dedup", "similarity"),
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    base = em.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    scaled = em.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 2.0).alias("v"),
    )
    bucketed = base.unionByName(scaled).withColumn("bucket", sign_bucket(F.col("v")))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(cos >= _NEARDUP_COS)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


# --------------------------------------------------------------------------
# Round 2: per-label centroids (the IVF coarse-quantizer building block)
# --------------------------------------------------------------------------


@register(
    "embedding_centroid_per_label",
    oracle="""
WITH flat AS (
  SELECT label, t.pos, CAST(embedding[t.pos] AS DOUBLE) AS val
  FROM embeddings, range(1, 1000) t(pos)
  WHERE t.pos <= len(embedding)
),
agg AS (
  SELECT label, pos,
    round(CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS m,
    COUNT(*) AS n
  FROM flat GROUP BY label, pos
)
SELECT label, MAX(n) AS n_vectors, list(m ORDER BY pos) AS centroid
FROM agg GROUP BY label
""",
    doc="Mean embedding per label — the distributed vector-mean that "
    "seeds IVF/k-means coarse quantizers. posexplode -> per-(label, "
    "dimension) decimal-exact mean -> re-assemble ordered array; shuffle "
    "rows are (label, pos, partial sum), never whole vectors. Rounded at "
    "6dp so the cross-engine float->double expansion agrees.",
    tags=("llm", "similarity", "vector"),
)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )
    agg = flat.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.groupBy("label").agg(
        F.max("n").alias("n_vectors"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "m"))),
            lambda s: s.getField("m"),
        ).alias("centroid"),
    )


@register(
    "embedding_gram_matrix",
    oracle=None,  # float matrix accumulation has no order-invariant SQL
    # twin; exact parity vs numpy is asserted in tests/test_llm_ops.py
    doc="Distributed Gram matrix X'X over the embedding column — the "
    "front half of out-of-core PCA/whitening for embedding spaces. "
    "mapInPandas emits one d*d partial per Arrow batch (vectorized "
    "numpy matmul, never a Python loop over rows), then a posexplode + "
    "sum tree-reduces the partials into d*d cells; only the upper "
    "triangle is returned. At 100 TB the shuffle carries d*d doubles "
    "per BATCH (~32 KB for d=64), independent of row count — the raw "
    "vectors never leave their scan tasks; the d^3 eigensolve that "
    "follows is driver-side numpy on a 64x64 matrix.",
    tags=("llm", "vector", "python", "rows-only"),
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    em = load_table(spark, sf_dir, "embeddings").select("embedding")
    d = len(em.head()[0])

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame({"g": [(x.T @ x).ravel().tolist()]})

    parts = em.mapInPandas(partials, schema="g array<double>")
    return (
        parts.select(F.posexplode("g").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("gram"))
        .select(
            (F.col("idx") / d).cast("int").alias("i"),
            (F.col("idx") % d).cast("int").alias("j"),
            "gram",
        )
        .where(F.col("i") <= F.col("j"))
    )


@register(
    "embedding_int8_quant_error",
    oracle="""
WITH q AS (
  SELECT
    vec_id,
    list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)) AS av,
    CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
scaled AS (
  SELECT vec_id, v,
         list_max(av) / 127.0 AS scale
  FROM q
)
SELECT
  vec_id,
  round(scale, 9) AS scale,
  round(list_max(list_transform(
    v, x -> abs(x - round(x / NULLIF(scale, 0)) * scale)
  )), 9) AS max_abs_err,
  round(list_max(list_transform(
    v, x -> abs(x - round(x / NULLIF(scale, 0)) * scale)
  )) / NULLIF(list_max(list_transform(v, x -> abs(x))), 0), 9)
    AS rel_err
FROM scaled
""",
    doc="INT8 symmetric scalar quantization error report: per-vector "
    "scale = max|x|/127, codes = round(x/scale), reconstruction error "
    "metrics (max absolute + relative to the vector's own peak).  The "
    "memory-bandwidth lever for 100 TB ANN — int8 codes are 4x smaller "
    "than float32, and this report is the accept/reject gauge before "
    "flipping an index to quantized storage.  Entirely per-row map-side "
    "expressions; only ORDER-FREE reductions (list_max) are emitted so "
    "the cross-engine hash is exact without decimal tricks.  Both "
    "engines round half-away-from-zero on doubles, so codes agree "
    "bit-for-bit.",
    tags=("llm", "vector", "similarity"),
)
def embedding_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = em.select("vec_id", v.alias("v"))
    scale = F.array_max(F.transform("v", F.abs)) / F.lit(127.0)
    # The raw scale column must NOT share a name with the rounded output
    # column: CollapseProject folds `round(scale,9) AS scale` into this
    # projection and rewrites the error lambda's reference to the
    # ROUNDED scale (observed: max_abs_err drifted 1e-8 off the oracle).
    scaled = base.select("vec_id", "v", scale.alias("s_raw"))
    err = F.transform(
        "v",
        lambda x: F.abs(
            x - F.round(F.try_divide(x, F.col("s_raw"))) * F.col("s_raw")
        ),
    )
    return scaled.select(
        "vec_id",
        F.round("s_raw", 9).alias("scale"),
        F.round(F.array_max(err), 9).alias("max_abs_err"),
        F.round(
            F.try_divide(
                F.array_max(err), F.array_max(F.transform("v", F.abs))
            ),
            9,
        ).alias("rel_err"),
    )
