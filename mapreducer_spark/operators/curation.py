"""Corpus-curation operators for LLM training pipelines (SURVEY.md §2.10 L4).

Four classic pretraining-data ops, each Spark-first and oracle-checked:

- benchmark contamination: flag training docs sharing any word n-gram
  with a held-out benchmark split (the standard decontamination pass).
- Gopher-style repetition rules: per-doc duplicate-token and
  top-bigram fractions with a keep/drop verdict — pure per-row
  expressions, zero shuffle, embarrassingly parallel at 100 TB.
- n-gram novelty: fraction of a doc's n-grams first seen in that doc
  (scanning in doc_id order) — a cheap corpus-growth / redundancy curve.
- DSIR importance weights: per-doc average log-likelihood ratio between
  a target-domain unigram LM and the background corpus LM (Xie et al.
  2023, "Data Selection for Language Models via Importance Resampling"),
  the standard importance-sampling score for domain upweighting.

Determinism contract: every float that survives an aggregation is
rounded per-token/per-gram to 6 dp, summed as DECIMAL (partition-order
invariant), then rounded again for output — same recipe as
doc_unigram_logprob, mirrored literally in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducer_spark.functions.hashes import md5_int64, oracle_md5_int64
from mapreducer_spark.functions.text import (
    ORACLE_TOKEN_LIST_SNIPPET,
    ORACLE_TOKEN_SPLIT_RE,
    SPARK_TOKEN_SPLIT_RE,
)
from mapreducer_spark.registry import register
from mapreducer_spark.sources import fan_out, load_table

_ORACLE_TOKS = (
    "list_filter(string_split_regex(lower(text), "
    f"'{ORACLE_TOKEN_SPLIT_RE}'), x -> length(x) > 0)"
)

# Contamination / novelty n-gram width.  The reference decontamination
# recipe uses 13-grams on web text; the synthetic docs are 10-99 tokens
# from a small vocabulary, so 4 keeps both regimes (some overlap, far
# from all-overlap) observable at test scale.
_NGRAM = 4
_BENCH_SOURCE = "src0"  # the held-out "benchmark" split


def _toks_col():
    return F.filter(
        F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE), lambda x: F.length(x) > 0
    )


def word_ngrams(t, n: int):
    """Array of space-joined word n-grams over a MATERIALIZED token-array
    column ``t``.  Caller must pre-filter ``size(t) >= n`` (a shorter doc
    would make ``sequence(1, size-n+1)`` count DOWN — Spark's sequence
    defaults to step -1 for descending bounds — yielding garbage grams
    rather than an error).
    """
    return F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )


def _oracle_ngrams(tcol: str, n: int) -> str:
    """DuckDB twin of word_ngrams (1-based inclusive list slicing)."""
    return (
        f"list_transform(generate_series(1, len({tcol}) - {n - 1}), "
        f"i -> array_to_string({tcol}[i:i + {n - 1}], ' '))"
    )


def _oracle_topbigram_ctes(base: str) -> str:
    """CTE pair computing each doc's max bigram multiplicity from CTE
    ``base`` (columns doc_id, t) — O(tokens) via unnest + hash
    aggregation.  Replaces the r1-r8 formulation
    ``list_max(list_transform(list_distinct(bigrams), g ->
    len(list_filter(bigrams, x -> x = g))))``, which is O(n^2) PER DOC
    (a full list scan per distinct bigram) and dominated the 10x
    sweep's wall for every gopher-labelled oracle (~2 min/row at 10x —
    VERDICT r8 #5).  Same value: MAX(COUNT(*)) per (doc, bigram) is
    exactly the max multiplicity.  Emits one row per doc with
    len(t) >= 2 (every such doc has >= 1 bigram), so an inner join on
    doc_id preserves the old row set.
    """
    return f"""__bg AS (
  SELECT doc_id, unnest({_oracle_ngrams('t', 2)}) AS g
  FROM {base} WHERE len(t) >= 2
),
__bgtop AS (
  SELECT doc_id, MAX(c) AS topc FROM (
    SELECT doc_id, g, COUNT(*) AS c FROM __bg GROUP BY doc_id, g
  ) GROUP BY doc_id
)"""


@register(
    "contamination_ngrams",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, {_ORACLE_TOKS} AS t FROM documents
),
grams AS (
  SELECT doc_id, source,
         unnest({_oracle_ngrams('t', _NGRAM)}) AS gram
  FROM toks WHERE len(t) >= {_NGRAM}
),
bench AS (SELECT DISTINCT gram FROM grams WHERE source = '{_BENCH_SOURCE}'),
train AS (
  SELECT DISTINCT doc_id, gram FROM grams WHERE source <> '{_BENCH_SOURCE}'
)
SELECT doc_id, COUNT(*) AS n_shared_ngrams
FROM train JOIN bench USING (gram)
GROUP BY doc_id
""",
    doc="Benchmark decontamination (L4): training docs sharing any "
    f"{_NGRAM}-gram with the '{_BENCH_SOURCE}' benchmark split, with the "
    "count of distinct shared grams. The benchmark gram set is tiny "
    "relative to the corpus, so it is broadcast — the training side "
    "streams through a map-side hash join with no shuffle of the corpus; "
    "at 100 TB the only shuffle is the per-doc distinct+count.",
    tags=("llm", "quality", "dedup"),
)
def contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", _toks_col().alias("t")
    )
    d = d.where(F.size("t") >= _NGRAM)
    grams = d.select(
        "doc_id", "source", F.explode(word_ngrams(F.col("t"), _NGRAM)).alias("gram")
    )
    bench = (
        grams.where(F.col("source") == _BENCH_SOURCE).select("gram").distinct()
    )
    train = (
        grams.where(F.col("source") != _BENCH_SOURCE)
        .select("doc_id", "gram")
        .distinct()
    )
    # bench is UNHINTED (r11 hinted-broadcast budget): its size is the
    # BENCHMARK's, fixed by contract in production but fixture-grown
    # here (1.4k grams at sf0.01, ~10x per scale step) — the planner
    # auto-broadcasts it while small, so the map-side-join shape in the
    # doc above still holds wherever the eval set actually is small.
    return (
        train.join(bench, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


# Gopher-style repetition thresholds (Rae et al. 2021 table A1 uses
# dup-line/top-2gram fractions on web text; adapted to the synthetic
# small-vocab docs so both verdicts occur at test scale).
_MIN_TOKENS = 30
_DUP_TOKEN_MAX = 0.75
_TOP_BIGRAM_MAX = 0.08


@register(
    "gopher_repetition_rules",
    oracle=f"""
WITH base AS (
  SELECT doc_id, {_ORACLE_TOKS} AS t FROM documents
),
{_oracle_topbigram_ctes('base')},
m AS (
  SELECT base.doc_id,
         len(t) AS n_tokens,
         1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_frac,
         CAST(topc AS DOUBLE) / (len(t) - 1) AS top_bigram
  FROM base JOIN __bgtop ON __bgtop.doc_id = base.doc_id
)
SELECT doc_id, n_tokens,
       round(dup_frac, 6) AS dup_token_frac,
       round(top_bigram, 6) AS top_bigram_frac,
       (n_tokens >= {_MIN_TOKENS}
        AND dup_frac <= {_DUP_TOKEN_MAX}
        AND top_bigram <= {_TOP_BIGRAM_MAX}) AS keep
FROM m
""",
    doc="Gopher-style repetition quality rules (L4): per-doc duplicate-"
    "token fraction and top-bigram fraction with a keep/drop verdict. "
    "Pure per-row expressions over the token array — no explode, no "
    "shuffle, one parquet scan; the O(n^2) distinct-bigram count is "
    "bounded by doc length, not corpus size, so the op is embarrassingly "
    "parallel at 100 TB. Verdict comparisons use unrounded doubles "
    "(integer-ratio divisions are exact in IEEE754 on both engines); "
    "rounding is output-only.",
    tags=("llm", "quality", "text"),
)
def gopher_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_metrics(load_table(spark, sf_dir, "documents"))


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Score any (doc_id, text) DataFrame with the Gopher repetition
    rules.  Pure stateless per-row expressions, so the SAME function
    scores the batch corpus and a readStream micro-batch (see
    streaming/jobs.py::run_quality_router).

    The top-bigram count is a run-length scan over the SORTED bigram
    array — O(n log n) per doc with one array materialization.  The
    naive form (for each distinct gram, filter the gram array) is
    O(n^2) lambda evaluations and re-materializes the gram array per
    distinct gram inside the interpreted HOF, which measured ~9x slower
    at sf0.1.
    """
    d = fan_out(docs.select("doc_id", "text")).select(
        "doc_id", _toks_col().alias("t")
    )
    d = d.where(F.size("t") >= 2)
    t = F.col("t")
    n = F.size(t)
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / n
    # Longest run of equal adjacent elements in the sorted bigram array
    # == max occurrence count of any bigram.  Bigrams are never '' (the
    # tokenizer drops empty tokens), so '' is a safe initial sentinel.
    best_count = F.aggregate(
        F.array_sort(word_ngrams(t, 2)),
        F.struct(
            F.lit(0).alias("best"), F.lit(0).alias("run"), F.lit("").alias("prev")
        ),
        lambda acc, x: F.struct(
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            x.alias("prev"),
        ),
        lambda acc: acc["best"],
    )
    top_bigram = best_count.cast("double") / (n - F.lit(1))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(dup_frac, 6).alias("dup_token_frac"),
        F.round(top_bigram, 6).alias("top_bigram_frac"),
        (
            (n >= _MIN_TOKENS)
            & (dup_frac <= _DUP_TOKEN_MAX)
            & (top_bigram <= _TOP_BIGRAM_MAX)
        ).alias("keep"),
    )


@register(
    "ngram_novelty",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_ORACLE_TOKS} AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest({_oracle_ngrams('t', _NGRAM)}) AS gram
  FROM toks WHERE len(t) >= {_NGRAM}
),
firsts AS (SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram)
SELECT doc_id,
       COUNT(*) AS n_grams,
       round(CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS novelty_frac
FROM grams JOIN firsts USING (gram)
GROUP BY doc_id
""",
    doc=f"n-gram novelty curve (L4): per doc, the fraction of its "
    f"distinct {_NGRAM}-grams whose first corpus occurrence (min doc_id) "
    "is this doc — the redundancy signal behind dedup-aware data "
    "scheduling. One shuffle on gram (min-doc aggregation, map-side "
    "combinable) + one shuffle back on doc_id; gram keys are "
    "high-cardinality and uniform, so no skew at 100 TB.",
    tags=("llm", "dedup", "text"),
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", _toks_col().alias("t")
    )
    grams = (
        d.where(F.size("t") >= _NGRAM)
        .select("doc_id", F.explode(word_ngrams(F.col("t"), _NGRAM)).alias("gram"))
        .distinct()
    )
    firsts = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(firsts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("novelty_frac"),
        )
    )


_DSIR_TARGET_LANG = "en"


@register(
    "dsir_importance",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_ORACLE_TOKS}) AS tok FROM documents
),
vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM tok),
bg AS (SELECT tok, COUNT(*) AS cb FROM tok GROUP BY tok),
nbg AS (SELECT COUNT(*) AS nb FROM tok),
tgt AS (
  SELECT tok, COUNT(*) AS ct FROM tok
  WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY tok
),
ntgt AS (
  SELECT COUNT(*) AS nt FROM tok WHERE lang = '{_DSIR_TARGET_LANG}'
),
scored AS (
  SELECT doc_id,
         round(log2(CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / (nt + v))
               - log2(CAST(cb + 1 AS DOUBLE) / (nb + v)), 6) AS llr
  FROM tok
  LEFT JOIN tgt USING (tok)
  JOIN bg USING (tok)
  CROSS JOIN vocab CROSS JOIN nbg CROSS JOIN ntgt
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       round(CAST(SUM(CAST(llr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4)
         + 0.0 AS dsir_weight
FROM scored
GROUP BY doc_id
""",
    doc="DSIR importance weights (Xie et al. 2023, L4): per-doc average "
    f"log-likelihood ratio between an add-1-smoothed '{_DSIR_TARGET_LANG}'"
    "-target unigram LM and the background corpus LM — the importance-"
    "resampling score for domain upweighting. Both LMs are one "
    "broadcastable frequency table each; the corpus streams through two "
    "broadcast joins (no corpus shuffle) then one per-doc aggregation. "
    "Per-token LLRs round to 6 dp and sum as DECIMAL so the score is "
    "partition-order invariant.",
    tags=("llm", "quality", "sampling"),
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", "lang", F.explode(_toks_col()).alias("tok")
    )
    # Three corpus scalars: one job (cheap metadata pass, reused below).
    counts = tok.agg(
        F.countDistinct("tok").alias("v"),
        F.count(F.lit(1)).alias("nb"),
        F.count(F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)).alias("nt"),
    ).first()
    v, nb, nt = counts["v"], counts["nb"], counts["nt"]
    bg = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cb"))
    tgt = (
        tok.where(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    llr = F.round(
        F.log2((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double") / F.lit(nt + v))
        - F.log2((F.col("cb") + 1).cast("double") / F.lit(nb + v)),
        6,
    )
    return (
        tok.join(F.broadcast(tgt), "tok", "left")
        .join(F.broadcast(bg), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # + 0.0 canonicalizes IEEE negative zero: near-zero negative
            # averages round to -0.0 in DuckDB but 0.0 in Spark, and the
            # gate's stringified hash tells them apart (first seen at
            # the 10x fixture via tools/oracle_at_scale.py).
            (
                F.round(
                    F.sum(llr.cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1)),
                    4,
                )
                + F.lit(0.0)
            ).alias("dsir_weight"),
        )
    )


_NEG_K = 4  # negatives per anchor


@register(
    "contrastive_negative_pairs",
    oracle=f"""
WITH idx AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM documents
),
anchored AS (
  SELECT a.doc_id, a.source, a.rn, a.n, j.j,
         1 + ({oracle_md5_int64("CAST(a.doc_id AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)")}
              % (a.n - 1)) AS off
  FROM idx a, (SELECT unnest(range(1, {_NEG_K} + 1)) AS j) j
)
SELECT
  a.doc_id,
  CAST(a.j AS INT) AS j,
  b.doc_id AS neg_doc_id,
  (a.source = b.source) AS same_source
FROM anchored a
JOIN idx b ON b.rn = ((a.rn - 1 + a.off) % a.n) + 1
""",
    doc=f"Contrastive NEGATIVE SAMPLING ({_NEG_K} negatives per anchor): "
    "deterministic pseudo-random partner selection via a content-hash "
    "offset in [1, N-1] over a global document ranking — never the "
    "anchor itself, uniform-ish over the corpus, and exactly "
    "reproducible across engines/runs/partitionings (the property "
    "random() sampling lacks).  The training-pair generator for "
    "contrastive embedding/reranker training; same_source is the "
    "trivial hard-negative signal.  Cost: one global ranking + an "
    "equi-join on rank — no cross join; at 100 TB the ranking is the "
    "two-phase distributed global_row_number already used by the "
    "decile queries.",
    tags=("llm", "sampling", "join"),
)
def contrastive_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreducer_spark.functions.agg import global_row_number_with_total
    from mapreducer_spark.functions.hashes import md5_int64

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ranked, n = global_row_number_with_total(d, ["doc_id"])
    idx = ranked.localCheckpoint(eager=True)  # anchor + partner branches
    j = spark.range(1, _NEG_K + 1).select(F.col("id").cast("int").alias("j"))
    off = 1 + F.pmod(
        md5_int64(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("j").cast("string"),
            )
        ),
        F.lit(n - 1),
    )
    anchored = idx.crossJoin(F.broadcast(j)).select(
        "doc_id",
        "source",
        "j",
        (((F.col("rn") - 1 + off) % n) + 1).alias("neg_rn"),
    )
    partners = idx.select(
        F.col("rn").alias("neg_rn"),
        F.col("doc_id").alias("neg_doc_id"),
        F.col("source").alias("neg_source"),
    )
    return anchored.join(partners, "neg_rn").select(
        "doc_id",
        "j",
        "neg_doc_id",
        (F.col("source") == F.col("neg_source")).alias("same_source"),
    )


# --------------------------------------------------------------------------
# PII redaction (curation primitive: scrub before training)
# --------------------------------------------------------------------------

# Dialect-portable patterns: identical semantics in Java regex (Spark)
# and RE2 (DuckDB) — char classes, +, bounded repetition, \b only.
_PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

_ORACLE_DOCS_WITH_PII = """
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 555-867-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents
"""


@register(
    "pii_redaction",
    oracle=f"""
WITH corpus AS ({_ORACLE_DOCS_WITH_PII})
SELECT
  doc_id,
  regexp_replace(
    regexp_replace(text, '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
    '{_PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
  len(regexp_extract_all(text, '{_PII_EMAIL_RE}')) AS n_emails,
  len(regexp_extract_all(text, '{_PII_PHONE_RE}')) AS n_phones
FROM corpus
""",
    doc="PII redaction (the scrub-before-training curation primitive): "
    "emails and phone numbers replaced with typed placeholders, with "
    "per-document match counts for audit/reporting.  Synthesized PII "
    "(every 7th doc gets an email + phone appended) guarantees the "
    "patterns bite; patterns restricted to the Java-regex/RE2 common "
    "dialect so Spark and DuckDB replace identically.  Pure per-row "
    "expressions — zero shuffle at any scale.",
    tags=("llm", "curation", "text"),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    with_pii = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-867-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return with_pii.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", _PII_EMAIL_RE, "<EMAIL>"),
            _PII_PHONE_RE,
            "<PHONE>",
        ).alias("clean_text"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
    )


# --------------------------------------------------------------------------
# fasttext-style hashed linear quality classifier
# --------------------------------------------------------------------------

_QC_BUCKETS = 1024  # hashed feature space (fasttext's bucket trick)
# Deterministic stand-in weights: w(b) = b - 512, one distinct weight per
# bucket (a second modulo smaller than the bucket count would alias the
# top buckets onto the bottom ones and break the documented model).
_QC_WSCALE = 512  # weight magnitude bound -> logit = s / (512 * n_tokens)


@register(
    "quality_classifier_linear",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_ORACLE_TOKS}) AS tok FROM documents
),
feats AS (
  SELECT doc_id,
         ({oracle_md5_int64("tok")} % {_QC_BUCKETS}) - {_QC_WSCALE} AS w
  FROM toks
),
scored AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         CAST(SUM(w) AS BIGINT) AS s
  FROM feats GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
            * ((abs(s) * 2000000 + {_QC_WSCALE} * n_tokens)
               // (2 * {_QC_WSCALE} * n_tokens)) AS DOUBLE) / 1000000.0
         AS logit,
       ROUND(1.0 / (1.0 + exp(-(CAST(s AS DOUBLE)
             / ({_QC_WSCALE}.0 * n_tokens)))), 6) AS score,
       CAST(s AS DOUBLE) / ({_QC_WSCALE}.0 * n_tokens) > 0 AS keep
FROM scored
""",
    doc="fasttext-shaped hashed linear quality classifier: token -> "
    "md5_int64 hash -> one of 1024 feature buckets (the fasttext "
    "hashing trick), bucket -> fixed integer weight (deterministic "
    "stand-in for trained weights: w(b) = b - 512, distinct per "
    "bucket), per-doc "
    "logit = exact BIGINT weight sum / (512 * n_tokens), score = "
    "sigmoid(logit).  The weight sum is an exact integer aggregation, "
    "so the only float ops are the final two expressions — partition- "
    "order invariant by construction, which is what makes a learned "
    "scorer hash-checkable.  Scale shape: pure map + one groupBy with "
    "map-side partial sums; swapping the stand-in weights for trained "
    "ones is a broadcast-join of a 1024-row weight table (or a literal "
    "array lookup) and changes nothing structural.  This is the "
    "CCNet/DCLM 'model-based quality filter' slot in the curation "
    "pipeline.",
    tags=("llm", "curation", "text"),
)
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreducer_spark.functions.hashes import md5_int64

    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE), lambda x: F.length(x) > 0
    )
    feats = d.select(
        "doc_id", F.explode(toks).alias("tok")
    ).select(
        "doc_id",
        (md5_int64(F.col("tok")) % _QC_BUCKETS - _QC_WSCALE).alias("w"),
    )
    scored = feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("w").alias("s")
    )
    logit = F.col("s").cast("double") / (F.lit(float(_QC_WSCALE)) * F.col("n_tokens"))
    # The reported 6-dp logit rounds the exact rational s/(512n) in pure
    # INTEGER arithmetic (half away from zero): the exact value can land
    # on a 5e-7 tie (e.g. 828/12800 = 0.0646875), where Spark's
    # round-the-shortest-repr and DuckDB's round-the-binary semantics
    # split by one last digit — caught at the 10x fixture by
    # tools/oracle_at_scale.py.  Integer div is truncation on the
    # non-negative operands in both engines, so the result is identical
    # by construction; the /1e6 cast is exact (|logit6| <= 2e6 << 2^53).
    logit6 = F.when(F.col("s") < 0, -1).otherwise(1) * F.expr(
        f"(abs(s) * 2000000 + {_QC_WSCALE} * n_tokens) "
        f"div (2 * {_QC_WSCALE} * n_tokens)"
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        (logit6.cast("double") / F.lit(1000000.0)).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
        (logit > 0).alias("keep"),
    )


# --------------------------------------------------------------------------
# Dataset splits: assignment, stratified accounting, near-dup leakage
# --------------------------------------------------------------------------

# Deterministic hash split on the DOCUMENT KEY (never on content: a
# near-duplicate with different bytes must be allowed to land in a
# different split so the leakage auditor below has something to catch;
# content-hash splits would hide exactly the leakage that matters).
_SPLIT_PCT = (80, 10, 10)  # train / val / test


def _split_expr(doc_id_col):
    from mapreducer_spark.functions.hashes import md5_int64

    h = md5_int64(doc_id_col.cast("string")) % 100
    return (
        F.when(h < _SPLIT_PCT[0], F.lit("train"))
        .when(h < _SPLIT_PCT[0] + _SPLIT_PCT[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )


def _split_sql(doc_id_expr: str) -> str:
    h = f"{oracle_md5_int64(f'CAST({doc_id_expr} AS VARCHAR)')} % 100"
    return (
        f"CASE WHEN {h} < {_SPLIT_PCT[0]} THEN 'train' "
        f"WHEN {h} < {_SPLIT_PCT[0] + _SPLIT_PCT[1]} THEN 'val' "
        f"ELSE 'test' END"
    )


@register(
    "corpus_train_val_test_split",
    oracle=f"""
SELECT source,
       {_split_sql("doc_id")} AS split,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
""",
    doc="Deterministic 80/10/10 train/val/test assignment by hashed "
    "document key, reported as per-(source, split) counts — the "
    "reproducible-split primitive every training pipeline needs "
    "(same doc always lands in the same split, across runs, engines, "
    "and cluster sizes; no global sort, no sampling state).  Pure "
    "map + one partial-agg groupBy at any scale.",
    tags=("llm", "curation", "mixing"),
)
def corpus_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("source", _split_expr(F.col("doc_id")).alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _leakage_oracle_sql() -> str:
    from mapreducer_spark.operators.dedup import (
        _ORACLE_DOCS_WITH_NEAR_DUPS,
        ORACLE_NEARDUP_PAIRS_SQL,
    )

    return f"""
WITH pairs AS ({ORACLE_NEARDUP_PAIRS_SQL}),
corpus AS ({_ORACLE_DOCS_WITH_NEAR_DUPS}),
splits AS (
  SELECT doc_id, {_split_sql("doc_id")} AS split FROM corpus
)
SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
FROM pairs p
JOIN splits sa ON p.id_a = sa.doc_id
JOIN splits sb ON p.id_b = sb.doc_id
WHERE sa.split <> sb.split
"""


@register(
    "split_leakage_pairs",
    oracle=_leakage_oracle_sql(),
    doc="Train/test contamination via NEAR-duplicates: near-dup pairs "
    "(blocked-Jaccard candidates, same machinery as "
    "neardup_jaccard_blocked) whose members hash into different "
    "splits — the leakage exact dedup can't see and the reason "
    "key-hash splits must be audited before evaluation.  Composes the "
    "pair list with the split assignment by two key joins; at 100 TB "
    "the pair list is the already-bounded LSH candidate set and the "
    "split table is (key, split) only.",
    tags=("llm", "curation", "dedup"),
)
def split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreducer_spark.operators.dedup import (
        docs_with_near_dups,
        neardup_pairs_shared,
    )

    pairs = neardup_pairs_shared(spark, sf_dir).select("id_a", "id_b")
    corpus = docs_with_near_dups(spark, sf_dir).select("doc_id")
    splits = corpus.select(
        "doc_id", _split_expr(F.col("doc_id")).alias("split")
    )
    return (
        pairs.join(
            splits.withColumnsRenamed(
                {"doc_id": "id_a", "split": "split_a"}
            ),
            "id_a",
        )
        .join(
            splits.withColumnsRenamed(
                {"doc_id": "id_b", "split": "split_b"}
            ),
            "id_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b")
    )


def _lang_confusion_oracle_sql() -> str:
    from mapreducer_spark.registry import REGISTRY

    # textstats registers lang_id_heuristic at import; importing the
    # module here guarantees the entry exists regardless of package
    # import order.
    import mapreducer_spark.operators.textstats  # noqa: F401

    pred = REGISTRY["lang_id_heuristic"].oracle
    return f"""
WITH preds AS ({pred})
SELECT labeled_lang, pred_lang, COUNT(*) AS n_docs
FROM preds
GROUP BY 1, 2
"""


@register(
    "lang_id_confusion",
    oracle=_lang_confusion_oracle_sql(),
    doc="Language-ID quality gauge: confusion matrix of the heuristic "
    "predictor against the corpus's labeled lang column — the "
    "evaluation loop that turns a classifier stage into a monitored "
    "one (composes lang_id_heuristic; one partial-agg groupBy on a "
    "handful of (label, prediction) cells).",
    tags=("llm", "curation", "text"),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreducer_spark.operators.textstats import lang_id_heuristic

    return (
        lang_id_heuristic(spark, sf_dir)
        .groupBy("labeled_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing — the multinomial-sampling knob of
# multi-source training recipes (T5/XLM-style alpha-sampling).
# ---------------------------------------------------------------------------

_MIX_TEMP_BUDGET = 200  # documents to draw across all sources


@register(
    "mixture_temperature_sampling",
    oracle=f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs,
         CAST(round(sqrt(n_docs), 6) AS DECIMAL(18,6)) AS wd
  FROM counts
),
tot AS (SELECT CAST(SUM(wd) AS DOUBLE) AS wsum FROM w),
tgt AS (
  SELECT source, n_docs,
         floor((CAST({_MIX_TEMP_BUDGET} AS DOUBLE) * CAST(wd AS DOUBLE))
               / wsum) AS target
  FROM w CROSS JOIN tot
),
ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {oracle_md5_int64("text")}, doc_id
         ) AS rnk
  FROM documents
),
sel AS (
  SELECT r.source, r.n_chars
  FROM ranked r JOIN tgt USING (source)
  WHERE r.rnk <= tgt.target
)
SELECT t.source,
       t.n_docs AS n_docs,
       CAST(t.target AS BIGINT) AS n_target,
       COUNT(s.n_chars) AS n_selected,
       COALESCE(CAST(SUM(CAST(s.n_chars AS DECIMAL(18,0))) AS BIGINT), 0)
         AS sel_chars
FROM tgt t LEFT JOIN sel s USING (source)
GROUP BY t.source, t.n_docs, t.target
""",
    doc="Temperature-scaled source sampling: per-source draw quotas "
    "proportional to n_docs^(1/2) (tau=0.5 — the up-weight-the-tail "
    "temperature of multilingual/multi-source training recipes; sqrt "
    "because it is the one power that is IEEE-exact cross-engine), "
    "selection by deterministic content-hash rank within each source.  "
    "Per-source weights go through round+decimal so the normalizing sum "
    "is order-invariant; the selection window partitions by source — "
    "identical shape to corpus_mixture_quota, one shuffle, no global "
    "sort.  At 100 TB the quota computation is |sources| rows of "
    "metadata and the draw is a rank filter on the same hash every "
    "engine can reproduce.",
    tags=("llm", "curation", "sampling"),
)
def mixture_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars", "text"
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = counts.select(
        "source",
        "n_docs",
        F.round(F.sqrt("n_docs"), 6).cast("decimal(18,6)").alias("wd"),
    )
    tot = w.agg(F.sum("wd").cast("double").alias("wsum"))
    tgt = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.floor(
            (F.lit(float(_MIX_TEMP_BUDGET)) * F.col("wd").cast("double"))
            / F.col("wsum")
        ).alias("target"),
    )
    w_rnk = Window.partitionBy("source").orderBy(
        md5_int64(F.col("text")), F.col("doc_id")
    )
    ranked = d.select(
        "source", "n_chars", F.row_number().over(w_rnk).alias("rnk")
    )
    sel = ranked.join(F.broadcast(tgt.select("source", "target")), "source").where(
        F.col("rnk") <= F.col("target")
    )
    agg = sel.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum(F.col("n_chars").cast("decimal(18,0)"))
        .cast("bigint")
        .alias("sel_chars"),
    )
    return (
        tgt.join(agg, "source", "left")
        .select(
            "source",
            "n_docs",
            F.col("target").cast("bigint").alias("n_target"),
            F.coalesce("n_selected", F.lit(0)).alias("n_selected"),
            F.coalesce("sel_chars", F.lit(0).cast("bigint")).alias("sel_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Length-based curriculum phases — order the corpus easy -> hard without
# a global sort.
# ---------------------------------------------------------------------------


@register(
    "curriculum_difficulty_phases",
    oracle=f"""
WITH nt AS (
  SELECT doc_id, len({ORACLE_TOKEN_LIST_SNIPPET}) AS n_tokens FROM documents
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(n_tokens AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*)
           AS mu,
         sqrt(CAST(SUM(CAST(n_tokens * n_tokens AS DECIMAL(28,0))) AS DOUBLE)
              / COUNT(*)
              - (CAST(SUM(CAST(n_tokens AS DECIMAL(18,0))) AS DOUBLE)
                 / COUNT(*))
                * (CAST(SUM(CAST(n_tokens AS DECIMAL(18,0))) AS DOUBLE)
                   / COUNT(*))) AS sigma
  FROM nt
),
z AS (
  -- sigma = 0 (every doc the same length) is guarded explicitly: Spark's
  -- double 0/0 yields NULL while DuckDB yields +/-inf, so the engines
  -- would band the degenerate corpus differently (ADVICE r7).  A corpus
  -- with no length variance has no length curriculum: everything is
  -- average difficulty, z = 0, phase 1.
  SELECT doc_id, n_tokens,
         CASE WHEN s.sigma > 0 THEN (n_tokens - s.mu) / s.sigma
              ELSE 0.0 END AS zs
  FROM nt CROSS JOIN stats s
)
SELECT CASE WHEN zs < -0.5 THEN 0 WHEN zs < 0.5 THEN 1
            WHEN zs < 1.5 THEN 2 ELSE 3 END AS phase,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_tokens AS DECIMAL(18,0))) AS BIGINT) AS total_tokens,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens
FROM z GROUP BY 1
""",
    doc="Curriculum phase assignment by length difficulty: per-doc token "
    "count z-scored against the exact corpus mean/std (decimal-exact "
    "sums, so the moments are partition-order invariant), banded into 4 "
    "phases at z = -0.5/0.5/1.5 — short/easy documents first, long-tail "
    "last, the shape of length-curriculum training schedules.  "
    "Deliberately NOT ntile: a global quantile rank needs a "
    "single-partition sort at 100 TB, while z-bands need one tiny "
    "moments aggregate broadcast back over the scan — the same two-pass "
    "trick as value_outliers_zscore, corpus-scale-safe by construction.",
    tags=("llm", "curation", "text"),
)
def curriculum_difficulty_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    nt = d.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
                lambda x: F.length(x) > 0,
            )
        ).alias("n_tokens"),
    )
    n = F.count(F.lit(1))
    s1 = F.sum(F.col("n_tokens").cast("decimal(18,0)")).cast("double")
    s2 = F.sum(
        (F.col("n_tokens") * F.col("n_tokens")).cast("decimal(28,0)")
    ).cast("double")
    mu = s1 / n
    stats = nt.agg(
        mu.alias("mu"), F.sqrt(s2 / n - mu * mu).alias("sigma")
    )
    # sigma = 0 guard mirrored from the oracle: no length variance ->
    # z = 0 -> every doc in phase 1 on BOTH engines (ADVICE r7).
    zs = F.when(
        F.col("sigma") > 0,
        (F.col("n_tokens") - F.col("mu")) / F.col("sigma"),
    ).otherwise(F.lit(0.0))
    phase = (
        F.when(zs < -0.5, 0)
        .when(zs < 0.5, 1)
        .when(zs < 1.5, 2)
        .otherwise(3)
    )
    return (
        nt.crossJoin(F.broadcast(stats))
        .select(phase.alias("phase"), "n_tokens")
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("decimal(18,0)"))
            .cast("bigint")
            .alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Final-stage corpus ops: deterministic shuffle+shard for training
# output, and per-source token-budget trimming.
# ---------------------------------------------------------------------------

_N_SHARDS = 16


@register(
    "corpus_shard_assignment",
    oracle=f"""
WITH pos AS (
  SELECT doc_id,
         {oracle_md5_int64("CAST(doc_id AS VARCHAR)")} % {_N_SHARDS} AS shard,
         {oracle_md5_int64("text")} AS pos,
         len({ORACLE_TOKEN_LIST_SNIPPET}) AS n_tokens
  FROM documents
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_tokens AS DECIMAL(18,0))) AS BIGINT) AS total_tokens,
       MIN(pos) AS min_pos,
       MAX(pos) AS max_pos
FROM pos GROUP BY shard
""",
    doc="Deterministic global shuffle + shard assignment — the last op "
    "of every training-data pipeline: shard = content-independent hash "
    "of the doc key (uniform, reproducible across engines and runs), "
    "within-shard order = content hash (the 'position' a sequential "
    f"trainer reads in).  {_N_SHARDS} shards; per-shard doc/token "
    "totals and position range prove both the assignment and the order "
    "key are engine-reproducible.  At 100 TB this is one hash-partition "
    "write (repartitionByRange on (shard, pos) -> per-shard sorted "
    "files) — no global sort, no RNG state, restartable by "
    "construction.",
    tags=("llm", "curation", "sampling"),
)
def corpus_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(
            F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
            lambda x: F.length(x) > 0,
        )
    )
    pos = d.select(
        F.pmod(
            md5_int64(F.col("doc_id").cast("string")), F.lit(_N_SHARDS)
        ).alias("shard"),
        md5_int64(F.col("text")).alias("pos"),
        n_tokens.alias("n_tokens"),
    )
    return pos.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("decimal(18,0)"))
        .cast("bigint")
        .alias("total_tokens"),
        F.min("pos").alias("min_pos"),
        F.max("pos").alias("max_pos"),
    )


_TOKEN_BUDGET_PER_SOURCE = 2_000


@register(
    "token_budget_per_source",
    oracle=f"""
WITH nt AS (
  SELECT source, doc_id,
         len({ORACLE_TOKEN_LIST_SNIPPET}) AS n_tokens,
         {oracle_md5_int64("text")} AS h
  FROM documents
),
run AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_tokens
  FROM nt
),
kept AS (
  SELECT source, n_tokens FROM run
  WHERE cum_tokens - n_tokens < {_TOKEN_BUDGET_PER_SOURCE}
)
SELECT source,
       COUNT(*) AS n_kept,
       CAST(SUM(CAST(n_tokens AS DECIMAL(18,0))) AS BIGINT) AS kept_tokens
FROM kept GROUP BY source
""",
    doc="Per-source TOKEN-budget trimming: walk each source's documents "
    "in deterministic content-hash order and keep them until the "
    f"running token total passes {_TOKEN_BUDGET_PER_SOURCE} (a doc is "
    "kept iff the budget wasn't already exhausted BEFORE it — so the "
    "budget is always reached, never undershot).  This is the unit "
    "real curation recipes allocate (token budgets, not doc counts — "
    "cf. mixture_temperature_sampling for the doc-count variant).  One "
    "running-sum window per source partition, same shuffle shape as "
    "the mixture quota; at 100 TB each source's walk is an ordered "
    "window over its own partition, and the budget comparison is "
    "map-side after the one sort.",
    tags=("llm", "curation", "sampling"),
)
def token_budget_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    nt = d.select(
        "source",
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
                lambda x: F.length(x) > 0,
            )
        ).alias("n_tokens"),
        md5_int64(F.col("text")).alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = nt.select(
        "source", "n_tokens", F.sum("n_tokens").over(w).alias("cum_tokens")
    )
    kept = run.where(
        F.col("cum_tokens") - F.col("n_tokens") < _TOKEN_BUDGET_PER_SOURCE
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_tokens").cast("decimal(18,0)"))
        .cast("bigint")
        .alias("kept_tokens"),
    )


# ---------------------------------------------------------------------------
# Sequence packing — after shuffle+shard and token-budget trimming, the
# actual LAST op before the trainer: concatenate the corpus in a
# deterministic order and chunk it into fixed-length context windows
# (GPT-style packing).  The interesting part at 100 TB is the GLOBAL
# running token offset, which naively is a single-partition ordered
# window; here it is the classic two-phase distributed prefix sum.
# ---------------------------------------------------------------------------

_PACK_CTX = 512  # context window length in tokens
_PACK_BUCKETS = 64  # order-preserving hash-prefix ranges for phase 1


@register(
    "sequence_packing_offsets",
    oracle=f"""
WITH nt AS (
  SELECT doc_id,
         {oracle_md5_int64("text")} AS h,
         len({ORACLE_TOKEN_LIST_SNIPPET}) AS n_tokens
  FROM documents
),
ord AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_offset
  FROM nt
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {_PACK_CTX} AS BIGINT) AS first_block,
       CAST((start_offset + n_tokens - 1) // {_PACK_CTX} AS BIGINT)
         AS last_block,
       CAST((start_offset + n_tokens - 1) // {_PACK_CTX}
            - start_offset // {_PACK_CTX} AS BIGINT) AS n_splits
FROM ord
""",
    doc=f"Sequence packing (concat-and-chunk into {_PACK_CTX}-token "
    "context windows): every doc's global start offset in the "
    "content-hash-ordered token stream, plus which blocks it lands in "
    "and how many block boundaries split it — the placement map a "
    "trainer's data loader materializes.  Sibling of reshape.py's "
    "sequence_packing (doc_id-order concat via "
    "functions/agg.global_running_sum, which range-partitions and "
    "collects per-partition totals to the driver): THIS variant packs "
    "in content-hash order (the deterministic shuffle a trainer "
    "actually wants) and its prefix sum stays fully declarative — "
    "hash-PREFIX buckets need no range sampling, no driver collect, "
    "and no checkpoint pinning.  The global running offset is "
    "NOT a single-partition ordered window: the content hash's top "
    f"bits range-partition the order into {_PACK_BUCKETS} buckets "
    "(bucket id is a prefix of the sort key, so (bucket, h) order IS "
    "the global order), phase 1 computes within-bucket prefix sums in "
    "parallel, phase 2 offsets each bucket by a "
    f"{_PACK_BUCKETS}-row running total broadcast back — the classic "
    "two-phase distributed scan, same design stance as "
    "curriculum_difficulty_phases' no-global-sort z-bands.  The "
    "ORACLE computes the naive global window, so the hash check "
    "proves the two-phase decomposition exact.",
    tags=("llm", "curation", "packing"),
)
def sequence_packing_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf_dir, "documents"))
    n_tokens = F.size(
        F.filter(
            F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
            lambda x: F.length(x) > 0,
        )
    )
    nt = d.select(
        "doc_id",
        md5_int64(F.col("text")).alias("h"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    # Bucket = top 6 bits of the 60-bit hash: a PREFIX of the sort key,
    # so global (h, doc_id) order == (bucket, h, doc_id) order.
    bucket = F.floor(F.col("h") / F.lit(2**54)).alias("bucket")
    nt = nt.select("doc_id", "h", "n_tokens", bucket)
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = nt.withColumn(
        "local_offset", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    )
    # Phase 2: per-bucket totals -> running bucket offsets.  This window
    # IS single-partition, over at most _PACK_BUCKETS metadata rows.
    btot = nt.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "bucket",
        F.coalesce(F.sum("btok").over(w_b), F.lit(0)).alias("bucket_offset"),
    )
    start = F.col("bucket_offset") + F.col("local_offset")
    first_block = F.floor(start / _PACK_CTX).cast("long")
    last_block = F.floor((start + F.col("n_tokens") - 1) / _PACK_CTX).cast(
        "long"
    )
    return (
        local.join(F.broadcast(boff), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            start.cast("long").alias("start_offset"),
            first_block.alias("first_block"),
            last_block.alias("last_block"),
            (last_block - first_block).cast("long").alias("n_splits"),
        )
    )


@register(
    "curation_pipeline_summary",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
base AS (
  SELECT doc_id, text, {_ORACLE_TOKS} AS t FROM corpus
),
{_oracle_topbigram_ctes('base')},
m AS (
  SELECT base.doc_id,
         len(t) AS n_tokens,
         1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_frac,
         CAST(topc AS DOUBLE) / (len(t) - 1) AS top_bigram
  FROM base JOIN __bgtop ON __bgtop.doc_id = base.doc_id
),
kept AS (
  SELECT b.doc_id, b.text, m.n_tokens
  FROM m JOIN base b USING (doc_id)
  WHERE m.n_tokens >= {_MIN_TOKENS}
    AND m.dup_frac <= {_DUP_TOKEN_MAX}
    AND m.top_bigram <= {_TOP_BIGRAM_MAX}
),
ranked AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY {oracle_md5_int64("text")} ORDER BY doc_id) AS rn
  FROM kept
)
SELECT
  (SELECT COUNT(*) FROM base) AS n_docs_in,
  (SELECT COUNT(*) FROM base) - (SELECT COUNT(*) FROM kept)
    AS n_quality_dropped,
  (SELECT COUNT(*) FROM kept) - (SELECT COUNT(*) FROM ranked WHERE rn = 1)
    AS n_dup_dropped,
  (SELECT COUNT(*) FROM ranked WHERE rn = 1) AS n_docs_out,
  (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
   FROM ranked WHERE rn = 1) AS tokens_out,
  (SELECT CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
   FROM ranked WHERE rn = 1) AS kept_id_sum
""",
    doc="End-to-end curation capstone in ONE declarative plan: Gopher "
    "repetition gate -> exact content dedup (keep min doc_id) -> "
    "surviving doc/token accounting, with kept_id_sum pinning the "
    "exact surviving SET.  Sibling of textstats.py's "
    "corpus_curation_pipeline (token-count gate -> lang-scoped "
    "normalized dedup -> hash sampling -> per-LANG corpus stats): "
    "that one emits the surviving corpus's shape, THIS one emits the "
    "LOSS ACCOUNTING (what each stage dropped, over a corpus with "
    "synthesized duplicates so the dedup stage is hash-live) — the "
    "two reports a curation run publishes together.  The point is "
    "architectural: the whole "
    "pipeline is a single Catalyst plan (quality metrics are per-row "
    "expressions, the dedup is one narrow hash shuffle), so at 100 TB "
    "the stages fuse into one pass over the corpus plus one shuffle — "
    "no intermediate materialization between 'stages' unless the "
    "operator chooses to checkpoint.",
    tags=("llm", "curation", "quality", "dedup"),
)
def curation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mapreducer_spark.operators.curation import repetition_metrics
    from mapreducer_spark.operators.dedup import docs_with_exact_dups

    # The exact-dup construction (doc_id % 10 copies at +1000000), so the
    # dedup stage of the pipeline is LIVE in the hash check — on the
    # duplicate-free raw fixture n_dup_dropped would be pinned at 0.
    d = docs_with_exact_dups(spark, sf_dir)
    # Materialize the metrics BEFORE filtering on `keep`: pushed through
    # the projection, the keep predicate becomes a scan-level Filter
    # whose every reference re-evaluates the whole interpreted
    # sorted-bigram HOF tree per row (measured: 0.54 s projected ->
    # 4.4 s as a pushed filter at sf0.1).  The checkpoint pins the
    # one-evaluation-per-row shape and the narrow frame then feeds both
    # the kept-count aggregate and the dedup window for free.
    metrics = repetition_metrics(d).select(
        "doc_id", "n_tokens", "keep"
    ).localCheckpoint(eager=True)
    kept = (
        metrics.where("keep")
        .select("doc_id", "n_tokens")
        .join(d, "doc_id")
        .select("doc_id", "n_tokens", md5_int64(F.col("text")).alias("__h"))
    )
    w = Window.partitionBy("__h").orderBy("doc_id")
    ranked = kept.withColumn("rn", F.row_number().over(w))
    survivors = ranked.where(F.col("rn") == 1)
    return (
        d.agg(F.count(F.lit(1)).alias("n_docs_in"))
        .crossJoin(kept.agg(F.count(F.lit(1)).alias("__n_kept")))
        .crossJoin(
            survivors.agg(
                F.count(F.lit(1)).alias("n_docs_out"),
                F.coalesce(F.sum("n_tokens"), F.lit(0))
                .cast("long")
                .alias("tokens_out"),
                F.coalesce(F.sum("doc_id"), F.lit(0))
                .cast("long")
                .alias("kept_id_sum"),
            )
        )
        .select(
            "n_docs_in",
            (F.col("n_docs_in") - F.col("__n_kept")).alias(
                "n_quality_dropped"
            ),
            (F.col("__n_kept") - F.col("n_docs_out")).alias("n_dup_dropped"),
            "n_docs_out",
            "tokens_out",
            "kept_id_sum",
        )
    )


# Content blocklist (RefinedWeb/C4-style lexicon gate).  Terms are drawn
# from the fixture vocabulary so every branch is live at gate scale; a
# production list is just a longer broadcast array.
_BLOCKLIST = ("slow", "dup", "big")


@register(
    "blocklist_filter_rates",
    oracle=f"""
WITH tok AS (
  SELECT source,
         {ORACLE_TOKEN_LIST_SNIPPET} AS ts
  FROM documents
),
scored AS (
  SELECT source,
         len(ts) AS n_tokens,
         len(list_filter(ts, x -> x IN
             ({", ".join("'" + t + "'" for t in _BLOCKLIST)}))) AS hits
  FROM tok
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE hits > 0) AS BIGINT) AS n_flagged,
       round(CAST(COUNT(*) FILTER (WHERE hits > 0) AS DOUBLE)
             / COUNT(*), 6) AS flag_rate,
       CAST(SUM(CAST(hits AS DECIMAL(18,0))) AS BIGINT) AS total_hits,
       round(CAST(SUM(CAST(hits AS DECIMAL(18,0))) AS DOUBLE) * 10000
             / CAST(SUM(CAST(n_tokens AS DECIMAL(18,0))) AS DOUBLE), 4)
         AS hits_per_10k_tokens
FROM scored
GROUP BY source
ORDER BY source
""",
    doc="Lexicon blocklist gate rates per source (the C4/RefinedWeb "
    "bad-words filter, scored rather than applied): documents whose "
    "token stream hits the blocklist, the per-source flag rate, and "
    "hit density per 10k tokens — the report a curation run reads "
    "BEFORE deciding whether a source is salvageable-by-filtering or "
    "drop-whole (complements gopher_repetition_rules, which gates on "
    "shape, and quality_scores, which gates on composition).  "
    "Determinism: hit counts are exact in-array filters under the "
    "shared tokenizer; rates are identical-order double divisions of "
    "exact decimal sums rounded once.  Scale shape: entirely map-side "
    "per-document array work (no explode — the token stream never "
    "shuffles) plus one ~20-row source aggregation; the blocklist "
    "itself is a literal IN-list the optimizer folds, a broadcast "
    "array at production lexicon sizes.",
    tags=("llm", "quality", "curation", "text"),
)
def blocklist_filter_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    ts = F.filter(
        F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
        lambda x: F.length(x) > 0,
    )
    hits = F.size(
        F.filter(ts, lambda x: x.isin(*_BLOCKLIST))
    )
    scored = d.select(
        "source",
        F.size(ts).alias("n_tokens"),
        hits.alias("hits"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.round(
                F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("flag_rate"),
            F.sum(F.col("hits").cast("decimal(18,0)"))
            .cast("long")
            .alias("total_hits"),
            F.round(
                F.sum(F.col("hits").cast("decimal(18,0)")).cast("double")
                * 10000
                / F.sum(F.col("n_tokens").cast("decimal(18,0)")).cast(
                    "double"
                ),
                4,
            ).alias("hits_per_10k_tokens"),
        )
        .orderBy("source")
    )


_CTX_BUDGETS = (128, 256, 512, 1024, 2048)


@register(
    "context_length_tradeoff",
    oracle=f"""
WITH nt AS (
  SELECT len({ORACLE_TOKEN_LIST_SNIPPET}) AS n FROM documents
),
c AS (SELECT UNNEST([{", ".join(str(c) for c in _CTX_BUDGETS)}]) AS ctx)
SELECT ctx,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n AS DECIMAL(18,0))) AS BIGINT) AS total_tokens,
       CAST(COUNT(*) FILTER (WHERE n > ctx) AS BIGINT) AS n_truncated_docs,
       CAST(SUM(CAST(greatest(n - ctx, 0) AS DECIMAL(18,0))) AS BIGINT)
         AS trunc_tokens_lost,
       round(CAST(SUM(CAST(least(n, ctx) AS DECIMAL(18,0))) AS DOUBLE)
             / CAST(SUM(CAST(n AS DECIMAL(18,0))) AS DOUBLE), 6)
         AS trunc_pct_kept,
       CAST(SUM(CAST((n + ctx - 1) // ctx AS DECIMAL(18,0))) AS BIGINT)
         AS pad_blocks,
       round(CAST(SUM(CAST(n AS DECIMAL(18,0))) AS DOUBLE)
             / (CAST(SUM(CAST((n + ctx - 1) // ctx AS DECIMAL(18,0)))
                     AS DOUBLE) * ctx), 6)
         AS pad_utilization
FROM nt CROSS JOIN c
GROUP BY ctx
ORDER BY ctx
""",
    doc="Context-length budget tradeoff table: for each candidate "
    f"window size {_CTX_BUDGETS}, what one-sequence-per-document "
    "TRUNCATION costs (docs clipped, tokens lost, share kept) vs what "
    "pad-to-window SPLITTING costs (blocks, utilization = real tokens "
    "over padded capacity) — the two poles sequence_packing "
    "interpolates, and the table a trainer reads before fixing "
    "max_seq_len.  Entirely exact integer/decimal arithmetic (ceil as "
    "(n+ctx-1) DIV ctx); the only doubles are two final rounded "
    "ratios.  Scale shape: one map-side token count per doc, a 5-way "
    "literal fan-out, one 5-row aggregation — no shuffle of anything "
    "document-sized.",
    tags=("llm", "curation", "text"),
)
def context_length_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    nt = d.select(
        F.size(
            F.filter(
                F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
                lambda x: F.length(x) > 0,
            )
        ).alias("n")
    )
    fan = nt.select(
        "n",
        F.explode(
            F.array(*[F.lit(c) for c in _CTX_BUDGETS])
        ).alias("ctx"),
    )
    dec = lambda c: F.sum(c.cast("decimal(18,0)"))  # noqa: E731
    blocks = F.expr("(n + ctx - 1) DIV ctx")
    return (
        fan.groupBy("ctx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dec(F.col("n")).cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("n") > F.col("ctx"), 1).otherwise(0))
            .cast("long")
            .alias("n_truncated_docs"),
            dec(F.greatest(F.col("n") - F.col("ctx"), F.lit(0)))
            .cast("long")
            .alias("trunc_tokens_lost"),
            F.round(
                dec(F.least(F.col("n"), F.col("ctx"))).cast("double")
                / dec(F.col("n")).cast("double"),
                6,
            ).alias("trunc_pct_kept"),
            dec(blocks).cast("long").alias("pad_blocks"),
            F.round(
                dec(F.col("n")).cast("double")
                / (dec(blocks).cast("double") * F.col("ctx")),
                6,
            ).alias("pad_utilization"),
        )
        .orderBy("ctx")
    )


# (chunk_size, overlap) candidate configs for sliding-window RAG chunking.
_CHUNK_CFGS = ((256, 32), (256, 64), (512, 64), (512, 128), (1024, 128))


@register(
    "overlapping_chunk_plan",
    oracle=f"""
WITH nt AS (
  SELECT len({ORACLE_TOKEN_LIST_SNIPPET}) AS n FROM documents
),
cfg AS (
  SELECT * FROM (VALUES
    {", ".join(f"({s}, {o})" for s, o in _CHUNK_CFGS)}
  ) AS t(size, overlap)
),
plan AS (
  SELECT size, overlap, n,
         1 + (greatest(n - size, 0) + (size - overlap) - 1)
             // (size - overlap) AS n_chunks
  FROM nt CROSS JOIN cfg
),
em AS (
  SELECT size, overlap, n, n_chunks,
         (n_chunks - 1) * size
           + (n - (n_chunks - 1) * (size - overlap)) AS emitted
  FROM plan
)
SELECT size, overlap,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chunks AS DECIMAL(18,0))) AS BIGINT)
         AS total_chunks,
       CAST(COUNT(*) FILTER (WHERE n_chunks = 1) AS BIGINT)
         AS single_chunk_docs,
       CAST(SUM(CAST(emitted AS DECIMAL(18,0))) AS BIGINT)
         AS emitted_tokens,
       round(CAST(SUM(CAST(emitted AS DECIMAL(18,0))) AS DOUBLE)
             / CAST(SUM(CAST(n AS DECIMAL(18,0))) AS DOUBLE), 6)
         AS redundancy_factor
FROM em
GROUP BY size, overlap
ORDER BY size, overlap
""",
    doc="Sliding-window chunking plan for retrieval indexing: per "
    f"(chunk_size, overlap) candidate {_CHUNK_CFGS}, the chunk count, "
    "emitted-token volume, and redundancy factor (emitted/original — "
    "what the overlap costs in index size and embedding spend) — the "
    "RAG-side counterpart of context_length_tradeoff's training-side "
    "table, and the planning view over the materializing "
    "doc_token_chunks operator.  Exact integer arithmetic throughout "
    "(chunk count via ceil-division of the stride; the emitted-token "
    "identity (k-1)*size + last_chunk_len is exact, not an estimate); "
    "the redundancy ratio is the single rounded double.  Scale shape: "
    "map-side token counts, a 5-way literal fan-out, one 5-row "
    "aggregation.",
    tags=("llm", "curation", "text"),
)
def overlapping_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    nt = d.select(
        F.size(
            F.filter(
                F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
                lambda x: F.length(x) > 0,
            )
        ).alias("n")
    )
    cfg = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("size"), F.lit(o).alias("overlap")
                )
                for s, o in _CHUNK_CFGS
            ]
        )
    )
    plan = nt.select("n", cfg.alias("cfg")).select(
        "n", "cfg.size", "cfg.overlap"
    )
    plan = plan.withColumn(
        "n_chunks",
        F.expr(
            "1 + (greatest(n - size, 0) + (size - overlap) - 1)"
            " DIV (size - overlap)"
        ),
    ).withColumn(
        "emitted",
        F.expr(
            "(n_chunks - 1) * size"
            " + (n - (n_chunks - 1) * (size - overlap))"
        ),
    )
    dec = lambda c: F.sum(F.col(c).cast("decimal(18,0)"))  # noqa: E731
    return (
        plan.groupBy("size", "overlap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dec("n_chunks").cast("long").alias("total_chunks"),
            F.sum(F.when(F.col("n_chunks") == 1, 1).otherwise(0))
            .cast("long")
            .alias("single_chunk_docs"),
            dec("emitted").cast("long").alias("emitted_tokens"),
            F.round(
                dec("emitted").cast("double") / dec("n").cast("double"), 6
            ).alias("redundancy_factor"),
        )
        .orderBy("size", "overlap")
    )


@register(
    "classifier_calibration_bins",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_ORACLE_TOKS}) AS tok FROM documents
),
feats AS (
  SELECT doc_id,
         ({oracle_md5_int64("tok")} % {_QC_BUCKETS}) - {_QC_WSCALE} AS w
  FROM toks
),
scored AS (
  SELECT doc_id,
         ROUND(1.0 / (1.0 + exp(-(CAST(SUM(w) AS DOUBLE)
               / ({_QC_WSCALE}.0 * COUNT(*))))), 6) AS score
  FROM feats GROUP BY doc_id
),
gb AS (
  SELECT doc_id, {_ORACLE_TOKS} AS t FROM documents
),
{_oracle_topbigram_ctes('gb')},
gopher AS (
  SELECT gb.doc_id,
         (len(t) >= {_MIN_TOKENS}
          AND 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
              <= {_DUP_TOKEN_MAX}
          AND CAST(topc AS DOUBLE) / (len(t) - 1)
              <= {_TOP_BIGRAM_MAX}) AS label
  FROM gb JOIN __bgtop ON __bgtop.doc_id = gb.doc_id
),
binned AS (
  SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
         score, CASE WHEN label THEN 1 ELSE 0 END AS y
  FROM scored JOIN gopher USING (doc_id)
),
agg AS (
  SELECT bin, COUNT(*) AS n_docs,
         round(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*), 6) AS mean_predicted,
         round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS observed_rate
  FROM binned GROUP BY bin
)
SELECT bin, n_docs, mean_predicted, observed_rate,
       round(abs(mean_predicted - observed_rate), 6) AS gap,
       round(CAST(SUM(CAST(round(
               abs(mean_predicted - observed_rate) * n_docs, 6)
               AS DECIMAL(28,6))) OVER () AS DOUBLE)
             / SUM(n_docs) OVER (), 6) AS ece
FROM agg
ORDER BY bin
""",
    doc="Reliability diagram + expected calibration error for the "
    "hashed linear quality classifier, scored against the Gopher "
    "repetition verdict as ground truth: per predicted-probability "
    "decile, mean prediction vs observed pass rate, and "
    "ECE = sum(n_b/N * |pred_b - rate_b|) — the standard ML-ops "
    "answer to 'can I threshold this score at 0.7 and trust it "
    "means 70%?', which perplexity_filter_calibration (retention "
    "curve) and quality_classifier_linear (raw scores) don't by "
    "themselves establish.  Determinism: the score is the existing "
    "exact-integer-logit sigmoid rounded 6dp; bins are integer "
    "floors; rates are identical-order divisions; ECE terms round "
    "at 6dp into a decimal window sum.  Scale shape: two map-side "
    "per-doc scorers, one 10-bin aggregation.",
    tags=("llm", "curation", "quality"),
)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    scored = quality_classifier_linear(spark, sf_dir).select(
        "doc_id", "score"
    )
    labels = repetition_metrics(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", F.col("keep").alias("label"))
    binned = scored.join(labels, "doc_id").select(
        F.least(
            F.floor(F.col("score") * 10).cast("long"), F.lit(9)
        ).alias("bin"),
        "score",
        F.when(F.col("label"), 1).otherwise(0).alias("y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("score").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_predicted"),
        F.round(
            F.sum("y").cast("double") / F.count(F.lit(1)), 6
        ).alias("observed_rate"),
    )
    gap = F.abs(F.col("mean_predicted") - F.col("observed_rate"))
    wall = Window.partitionBy()
    return agg.select(
        "bin",
        "n_docs",
        "mean_predicted",
        "observed_rate",
        F.round(gap, 6).alias("gap"),
        F.round(
            F.sum(
                F.round(gap * F.col("n_docs"), 6).cast("decimal(28,6)")
            )
            .over(wall)
            .cast("double")
            / F.sum("n_docs").over(wall),
            6,
        ).alias("ece"),
    ).orderBy("bin")


@register(
    "quality_score_lift_table",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_ORACLE_TOKS}) AS tok FROM documents
),
feats AS (
  SELECT doc_id,
         ({oracle_md5_int64("tok")} % {_QC_BUCKETS}) - {_QC_WSCALE} AS w
  FROM toks
),
scored AS (
  SELECT doc_id,
         ROUND(1.0 / (1.0 + exp(-(CAST(SUM(w) AS DOUBLE)
               / ({_QC_WSCALE}.0 * COUNT(*))))), 6) AS score
  FROM feats GROUP BY doc_id
),
gb AS (SELECT doc_id, {_ORACLE_TOKS} AS t FROM documents),
{_oracle_topbigram_ctes('gb')},
gopher AS (
  SELECT gb.doc_id,
         CASE WHEN len(t) >= {_MIN_TOKENS}
          AND 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
              <= {_DUP_TOKEN_MAX}
          AND CAST(topc AS DOUBLE) / (len(t) - 1) <= {_TOP_BIGRAM_MAX}
          THEN 1 ELSE 0 END AS y
  FROM gb JOIN __bgtop ON __bgtop.doc_id = gb.doc_id
),
buckets AS (
  SELECT score, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM scored JOIN gopher USING (doc_id)
  GROUP BY score
),
cum AS (
  SELECT score,
         SUM(n) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         SUM(pos) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
         SUM(n) OVER () AS nn, SUM(pos) OVER () AS pp
  FROM buckets
),
d AS (SELECT unnest(generate_series(1, 10)) AS decile)
SELECT d.decile,
       CAST(MIN(CASE WHEN cum_n * 10 >= d.decile * nn THEN cum_n END)
            AS BIGINT) AS rows_used,
       CAST(MIN(CASE WHEN cum_n * 10 >= d.decile * nn THEN cum_pos END)
            AS BIGINT) AS positives_captured,
       round(CAST(MIN(CASE WHEN cum_n * 10 >= d.decile * nn
                           THEN cum_pos END) AS DOUBLE)
             / MAX(pp), 6) AS capture_rate,
       round((CAST(MIN(CASE WHEN cum_n * 10 >= d.decile * nn
                            THEN cum_pos END) AS DOUBLE)
              / MIN(CASE WHEN cum_n * 10 >= d.decile * nn THEN cum_n END))
             / (CAST(MAX(pp) AS DOUBLE) / MAX(nn)), 6) AS lift
FROM d CROSS JOIN cum
GROUP BY d.decile
ORDER BY d.decile
""",
    doc="Lift / cumulative-capture table for the quality classifier "
    "(Gopher verdict as ground truth): reading documents from the "
    "highest score down, what share of the true positives is captured "
    "in the top d/10 of the corpus, and the lift over random — the "
    "RANKING-quality companion to classifier_calibration_bins' "
    "probability-quality view (a scorer can rank perfectly yet be "
    "uncalibrated, and vice versa), and the curve behind 'filter the "
    "top 30%' curation decisions.  Decile boundaries are type-1 picks "
    "on the score-collapsed cumulative frame with ALL rank "
    "comparisons in exact integer arithmetic (cum_n*10 >= d*N); "
    "cum_pos is monotone with cum_n so MIN selects the first "
    "crossing bucket's values.  Scale shape: collapse to distinct "
    "6dp scores (domain-bounded grid), windows on that, a 10-row "
    "fan-out.",
    tags=("llm", "curation", "quality", "mining"),
)
def quality_score_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    scored = quality_classifier_linear(spark, sf_dir).select(
        "doc_id", "score"
    )
    labels = repetition_metrics(
        load_table(spark, sf_dir, "documents")
    ).select(
        "doc_id", F.when(F.col("keep"), 1).otherwise(0).alias("y")
    )
    buckets = (
        scored.join(labels, "doc_id")
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
    )
    # The score-bucket frame is doc-dimension-sized (near-unique scores)
    # — both depth-ordered cumulations ride ONE two-phase prefix-sum
    # pass; the grand totals fall out of the same collect.
    from mapreducer_spark.functions.agg import global_running_sums_with_totals

    cum, tots = global_running_sums_with_totals(
        buckets,
        [F.col("score").desc()],
        {"cum_n": "n", "cum_pos": "pos"},
    )
    cum = cum.select(
        "cum_n",
        "cum_pos",
        F.lit(int(tots["cum_n"])).cast("long").alias("nn"),
        F.lit(int(tots["cum_pos"])).cast("long").alias("pp"),
    )
    d = spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
    crossing = F.col("cum_n") * 10 >= F.col("decile") * F.col("nn")
    rows_used = F.min(F.when(crossing, F.col("cum_n")))
    captured = F.min(F.when(crossing, F.col("cum_pos")))
    return (
        d.crossJoin(cum)
        .groupBy("decile")
        .agg(
            rows_used.cast("long").alias("rows_used"),
            captured.cast("long").alias("positives_captured"),
            F.round(
                captured.cast("double") / F.max("pp"), 6
            ).alias("capture_rate"),
            F.round(
                (captured.cast("double") / rows_used)
                / (F.max("pp").cast("double") / F.max("nn")),
                6,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


@register(
    "doc_length_by_source_quantiles",
    oracle=f"""
WITH nt AS (
  SELECT source, len({ORACLE_TOKEN_LIST_SNIPPET}) AS n FROM documents
),
h AS (SELECT source, n, COUNT(*) AS c FROM nt GROUP BY 1, 2),
cum AS (
  SELECT source, n, c,
         SUM(c) OVER (PARTITION BY source ORDER BY n
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
         SUM(c) OVER (PARTITION BY source) AS tot
  FROM h
)
SELECT source,
       CAST(MAX(tot) AS BIGINT) AS n_docs,
       MIN(CASE WHEN 4 * cc >= tot THEN n END) AS p25_tokens,
       MIN(CASE WHEN 2 * cc >= tot THEN n END) AS p50_tokens,
       MIN(CASE WHEN 4 * cc >= 3 * tot THEN n END) AS p75_tokens,
       MIN(CASE WHEN 10 * cc >= 9 * tot THEN n END) AS p90_tokens
FROM cum
GROUP BY source
ORDER BY source
""",
    doc="Per-source document-length quartiles + p90 (token counts): the "
    "length-profile table a mixture designer reads next to "
    "source_token_entropy and bpe_fertility_by_lang — a source whose "
    "p90 is under the context window packs clean, one whose p25 is "
    "tiny is probably fragments.  Exact type-1 quantiles with ALL "
    "rank comparisons in integer arithmetic (4*cc >= tot etc. — the "
    "weighted-median recipe) over per-source (length, count) "
    "histograms; zero floats anywhere.  Scale shape: map-side token "
    "counts, collapse to the (source x length) grid (length-domain-"
    "bounded), per-source cumulative windows on that.",
    tags=("llm", "curation", "quantile"),
)
def doc_length_by_source_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf_dir, "documents"))
    nt = d.select(
        "source",
        F.size(
            F.filter(
                F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
                lambda x: F.length(x) > 0,
            )
        ).alias("n"),
    )
    h = nt.groupBy("source", "n").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("source")
        .orderBy("n")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = h.select(
        "source",
        "n",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(Window.partitionBy("source")).alias("tot"),
    )
    pick = lambda cond: F.min(F.when(cond, F.col("n")))  # noqa: E731
    return (
        cum.groupBy("source")
        .agg(
            F.max("tot").cast("long").alias("n_docs"),
            pick(4 * F.col("cc") >= F.col("tot")).alias("p25_tokens"),
            pick(2 * F.col("cc") >= F.col("tot")).alias("p50_tokens"),
            pick(4 * F.col("cc") >= 3 * F.col("tot")).alias("p75_tokens"),
            pick(10 * F.col("cc") >= 9 * F.col("tot")).alias("p90_tokens"),
        )
        .orderBy("source")
    )


@register(
    "source_quality_league",
    oracle=f"""
WITH nt AS (
  SELECT source, {ORACLE_TOKEN_LIST_SNIPPET} AS t FROM documents
),
per_doc AS (
  SELECT source, len(t) AS n_tokens,
         1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_frac,
         len(list_filter(t, x -> x IN
             ({", ".join("'" + b + "'" for b in _BLOCKLIST)}))) AS hits
  FROM nt WHERE len(t) >= 1
),
agg AS (
  SELECT source,
         COUNT(*) AS n_docs,
         round(CAST(SUM(CAST(round(dup_frac, 8) AS DECIMAL(28,8)))
                    AS DOUBLE) / COUNT(*), 6) AS mean_dup_frac,
         round(CAST(SUM(CAST(hits AS DECIMAL(18,0))) AS DOUBLE) * 10000
               / CAST(SUM(CAST(n_tokens AS DECIMAL(18,0))) AS DOUBLE), 4)
           AS hits_per_10k,
         CAST(SUM(CAST(n_tokens AS DECIMAL(18,0))) AS BIGINT)
           AS total_tokens
  FROM per_doc GROUP BY source
),
ent AS (
  SELECT source,
         round(CAST(SUM(CAST(round(
             -(CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n), 10)
             AS DECIMAL(28,10))) AS DOUBLE), 6) AS entropy_bits
  FROM (
    SELECT source, tok, COUNT(*) AS c,
           SUM(COUNT(*)) OVER (PARTITION BY source) AS n
    FROM (SELECT source, unnest(t) AS tok FROM nt)
    GROUP BY source, tok
  ) GROUP BY source
),
ranked AS (
  SELECT agg.source, agg.n_docs, agg.mean_dup_frac, agg.hits_per_10k,
         ent.entropy_bits,
         ROW_NUMBER() OVER (ORDER BY agg.mean_dup_frac, agg.source)
           AS r_dup,
         ROW_NUMBER() OVER (ORDER BY agg.hits_per_10k, agg.source)
           AS r_block,
         ROW_NUMBER() OVER (ORDER BY ent.entropy_bits DESC, agg.source)
           AS r_entropy
  FROM agg JOIN ent ON ent.source = agg.source
)
SELECT source, n_docs, mean_dup_frac, hits_per_10k, entropy_bits,
       CAST(r_dup + r_block + r_entropy AS BIGINT) AS composite_rank,
       CAST(ROW_NUMBER() OVER (ORDER BY r_dup + r_block + r_entropy,
                               source) AS BIGINT) AS league_position
FROM ranked
ORDER BY league_position
""",
    doc="Per-source quality league table: duplicate-token fraction "
    "(repetition), blocklist hit density (content), and token entropy "
    "(diversity) each ranked across sources, composite = rank sum — "
    "the ONE table a mixture designer sorts before assigning "
    "temperature weights, composing the signals that "
    "gopher_repetition_rules, blocklist_filter_rates and "
    "source_token_entropy report separately (same formulas, same "
    "tokenizer — the league is a reconciliation surface as much as a "
    "readout).  Determinism: every metric is the established recipe "
    "(8dp-rounded dup fractions and 10dp entropy terms into decimal "
    "sums, exact hit counts); ranks are row_number with a source "
    "tie-break, so the composite is integer-exact.  Scale shape: two "
    "corpus passes (per-doc array metrics map-side; one (source, "
    "token) aggregation for entropy), then windows over 20 rows.",
    tags=("llm", "curation", "quality", "mining"),
)
def source_quality_league(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf_dir, "documents"))
    ts = F.filter(
        F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
        lambda x: F.length(x) > 0,
    )
    per_doc = d.select(
        "source",
        F.size(ts).alias("n_tokens"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(ts)).cast("double") / F.size(ts)
        ).alias("dup_frac"),
        F.size(F.filter(ts, lambda x: x.isin(*_BLOCKLIST))).alias(
            "hits"
        ),
    ).where(F.col("n_tokens") >= 1)
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(
                F.round(F.col("dup_frac"), 8).cast("decimal(28,8)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_dup_frac"),
        F.round(
            F.sum(F.col("hits").cast("decimal(18,0)")).cast("double")
            * 10000
            / F.sum(F.col("n_tokens").cast("decimal(18,0)")).cast(
                "double"
            ),
            4,
        ).alias("hits_per_10k"),
    )
    tok = d.select("source", F.explode(ts).alias("tok"))
    cnt = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    wsrc = Window.partitionBy("source")
    p = F.col("c").cast("double") / F.col("n")
    ent = (
        cnt.withColumn("n", F.sum("c").over(wsrc))
        .select(
            "source",
            F.round(-p * F.log2(p), 10).cast("decimal(28,10)").alias("h"),
        )
        .groupBy("source")
        .agg(F.round(F.sum("h").cast("double"), 6).alias("entropy_bits"))
    )
    joined = agg.join(ent, "source")
    r_dup = F.row_number().over(Window.orderBy("mean_dup_frac", "source"))
    r_block = F.row_number().over(Window.orderBy("hits_per_10k", "source"))
    r_ent = F.row_number().over(
        Window.orderBy(F.col("entropy_bits").desc(), "source")
    )
    ranked = joined.select(
        "source",
        "n_docs",
        "mean_dup_frac",
        "hits_per_10k",
        "entropy_bits",
        (r_dup + r_block + r_ent).cast("long").alias("composite_rank"),
    )
    return ranked.withColumn(
        "league_position",
        F.row_number()
        .over(Window.orderBy("composite_rank", "source"))
        .cast("long"),
    ).orderBy("league_position")


@register(
    "corpus_datasheet",
    oracle=f"""
WITH nt AS (
  SELECT doc_id, source, lang,
         {oracle_md5_int64("text")} AS content_hash,
         {ORACLE_TOKEN_LIST_SNIPPET} AS t
  FROM documents
),
per_doc AS (
  SELECT doc_id, source, lang, content_hash, len(t) AS n,
         CASE WHEN len(t) >= 1
              THEN 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
         END AS dup_frac,
         len(list_filter(t, x -> x IN
             ({", ".join("'" + b + "'" for b in _BLOCKLIST)}))) AS hits
  FROM nt
),
uni AS (
  SELECT tok, COUNT(*) AS c
  FROM (SELECT unnest(t) AS tok FROM nt) GROUP BY 1
),
nu AS (SELECT SUM(c) AS n FROM uni),
ent AS (
  SELECT round(CAST(SUM(CAST(round(
           -(CAST(c AS DOUBLE) / nu.n) * log2(CAST(c AS DOUBLE) / nu.n),
           10) AS DECIMAL(28,10))) AS DOUBLE), 6) AS h
  FROM uni CROSS JOIN nu
)
SELECT
  COUNT(*) AS n_docs,
  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(SUM(CAST(n AS DECIMAL(18,0))) AS BIGINT) AS total_tokens,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM uni) AS vocab_size,
  round(CAST(SUM(CAST(n AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*), 4)
    AS mean_doc_tokens,
  round(1.0 - CAST(COUNT(DISTINCT content_hash) AS DOUBLE) / COUNT(*), 6)
    AS exact_dup_rate,
  round(CAST(COUNT(*) FILTER (WHERE n >= {_MIN_TOKENS}
             AND dup_frac <= {_DUP_TOKEN_MAX}) AS DOUBLE) / COUNT(*), 6)
    AS len_dup_pass_rate,
  round(CAST(COUNT(*) FILTER (WHERE hits > 0) AS DOUBLE) / COUNT(*), 6)
    AS blocklist_flag_rate,
  (SELECT h FROM ent) AS unigram_entropy_bits
FROM per_doc
""",
    doc="The corpus DATASHEET ('Datasheets for Datasets', Gebru et al. "
    "2021, the quantitative panel): one row summarizing scale (docs, "
    "sources, languages, tokens, vocabulary, mean length), integrity "
    "(exact-duplicate rate via content hash), quality (share passing "
    "the length+repetition sub-gate — the O(n)-checkable part of the "
    "Gopher rules; blocklist flag rate), and diversity (corpus "
    "unigram entropy) — the first query run on ANY new drop, every "
    "number reconciling with its dedicated operator (dedup_exact, "
    "gopher_repetition_rules, blocklist_filter_rates, "
    "corpus_entropy_rate) because each reuses that operator's exact "
    "formula.  Scale shape: one map-side per-doc pass + one "
    "(token) aggregation; all counting and established decimal "
    "recipes.",
    tags=("llm", "curation", "profiling"),
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    ts = F.filter(
        F.split(F.lower("text"), SPARK_TOKEN_SPLIT_RE),
        lambda x: F.length(x) > 0,
    )
    per_doc = d.select(
        "source",
        "lang",
        md5_int64(F.col("text")).alias("content_hash"),
        F.size(ts).alias("n"),
        F.when(
            F.size(ts) >= 1,
            F.lit(1.0)
            - F.size(F.array_distinct(ts)).cast("double") / F.size(ts),
        ).alias("dup_frac"),
        F.size(F.filter(ts, lambda x: x.isin(*_BLOCKLIST))).alias(
            "hits"
        ),
    )
    per_doc = per_doc.localCheckpoint(eager=True)
    uni = (
        d.select(F.explode(ts).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nu = uni.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("vocab")
    )
    hterm = F.round(
        -(F.col("c").cast("double") / F.col("n"))
        * F.log2(F.col("c").cast("double") / F.col("n")),
        10,
    ).cast("decimal(28,10)")
    ent = (
        uni.crossJoin(F.broadcast(nu.select("n")))
        .agg(F.round(F.sum(hterm).cast("double"), 6).alias("h"))
    )
    base = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum(F.col("n").cast("decimal(18,0)"))
        .cast("long")
        .alias("total_tokens"),
        F.round(
            F.sum(F.col("n").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_doc_tokens"),
        F.round(
            F.lit(1.0)
            - F.countDistinct("content_hash").cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
        F.round(
            F.sum(
                F.when(
                    (F.col("n") >= _MIN_TOKENS)
                    & (F.col("dup_frac") <= _DUP_TOKEN_MAX),
                    1,
                ).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("len_dup_pass_rate"),
        F.round(
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("blocklist_flag_rate"),
    )
    return (
        base.crossJoin(
            F.broadcast(
                nu.select(F.col("vocab").cast("long").alias("vocab_size"))
            )
        )
        .crossJoin(
            F.broadcast(ent.select(F.col("h").alias("unigram_entropy_bits")))
        )
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "total_tokens",
            "vocab_size",
            "mean_doc_tokens",
            "exact_dup_rate",
            "len_dup_pass_rate",
            "blocklist_flag_rate",
            "unigram_entropy_bits",
        )
    )


@register(
    "quality_score_quantile_map",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, unnest({_ORACLE_TOKS}) AS tok FROM documents
),
feats AS (
  SELECT doc_id, source,
         ({oracle_md5_int64("tok")} % {_QC_BUCKETS}) - {_QC_WSCALE} AS w
  FROM toks
),
scored AS (
  SELECT doc_id, source,
         ROUND(1.0 / (1.0 + exp(-(CAST(SUM(w) AS DOUBLE)
               / ({_QC_WSCALE}.0 * COUNT(*))))), 6) AS score
  FROM feats GROUP BY doc_id, source
),
srch AS (
  SELECT source, score, COUNT(*) AS c FROM scored GROUP BY 1, 2
),
scum AS (
  SELECT source, score,
         SUM(c) OVER (PARTITION BY source ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
         SUM(c) OVER (PARTITION BY source) AS tot
  FROM srch
),
gcum AS (
  SELECT score,
         SUM(c) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
         SUM(c) OVER () AS tot
  FROM (SELECT score, COUNT(*) AS c FROM scored GROUP BY 1)
),
d AS (SELECT unnest(generate_series(1, 4)) AS q)
SELECT scum_e.source, d.q AS quartile,
       scum_e.src_edge, g.global_edge,
       round(scum_e.src_edge - g.global_edge, 6) AS shift
FROM d
JOIN (
  SELECT source, d2.q,
         MIN(CASE WHEN 4 * cc >= d2.q * tot THEN score END) AS src_edge
  FROM scum CROSS JOIN generate_series(1, 4) AS d2(q)
  GROUP BY source, d2.q
) scum_e ON scum_e.q = d.q
JOIN (
  SELECT d3.q,
         MIN(CASE WHEN 4 * cc >= d3.q * tot THEN score END) AS global_edge
  FROM gcum CROSS JOIN generate_series(1, 4) AS d3(q)
  GROUP BY d3.q
) g ON g.q = d.q
ORDER BY scum_e.source, d.q
""",
    doc="Quantile normalization map for the quality score: per source, "
    "the exact quartile edges of its score distribution beside the "
    "GLOBAL quartile edges and the shift between them — the "
    "batch-effect table behind per-source threshold correction "
    "(thresholding a raw score keeps different quality SHARES from "
    "sources whose score distributions sit at different levels — the "
    "multi-source cousin of perplexity_length_bias's length "
    "confound; mapping each source's quantiles onto the global ones "
    "is textbook quantile normalization).  Exact integer-rank "
    "quartile picks (4*cc >= q*tot) over score-collapsed histograms "
    "per source and globally; scores are the established 6dp "
    "sigmoid.  Scale shape: one map-side scorer, two "
    "score-domain-bounded histogram collapses, windows on those.",
    tags=("llm", "curation", "quantile", "mining"),
)
def quality_score_quantile_map(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    scored = quality_classifier_linear(spark, sf_dir)
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source"
    )
    ss = scored.join(docs, "doc_id").select("source", "score")
    ss = ss.localCheckpoint(eager=True)
    srch = ss.groupBy("source", "score").agg(
        F.count(F.lit(1)).alias("c")
    )
    wsrc = (
        Window.partitionBy("source")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scum = srch.select(
        "source",
        "score",
        F.sum("c").over(wsrc).alias("cc"),
        F.sum("c").over(Window.partitionBy("source")).alias("tot"),
    )
    gh = ss.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    # The global score histogram is doc-dimension-sized (the classifier
    # score is near-unique per document), so the global ECDF must be
    # the two-phase prefix sum — only the per-SOURCE windows above are
    # legitimately partitioned.
    from mapreducer_spark.functions.agg import global_running_sum_with_total

    gcum, g_tot = global_running_sum_with_total(
        gh, ["score"], "c", out_name="cc"
    )
    gcum = gcum.withColumn("tot", F.lit(int(g_tot)).cast("long"))
    qs = spark.range(1, 5).select(F.col("id").cast("int").alias("q"))
    src_edges = (
        qs.crossJoin(scum)
        .groupBy("source", "q")
        .agg(
            F.min(
                F.when(
                    4 * F.col("cc") >= F.col("q") * F.col("tot"),
                    F.col("score"),
                )
            ).alias("src_edge")
        )
    )
    g_edges = (
        qs.crossJoin(gcum)
        .groupBy("q")
        .agg(
            F.min(
                F.when(
                    4 * F.col("cc") >= F.col("q") * F.col("tot"),
                    F.col("score"),
                )
            ).alias("global_edge")
        )
    )
    return (
        src_edges.join(F.broadcast(g_edges), "q")
        .select(
            "source",
            F.col("q").alias("quartile"),
            "src_edge",
            "global_edge",
            F.round(
                F.col("src_edge") - F.col("global_edge"), 6
            ).alias("shift"),
        )
        .orderBy("source", "quartile")
    )
