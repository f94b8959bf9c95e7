"""Vector-ML catalog queries: k-means assignment, SemDeDup, product
quantization, a hashing-trick quality classifier, and the distributed
covariance matrix — the embedding-side operators of a training-data
pipeline (see operators/vectorml.py for the scale arguments).

Determinism house rules: every codebook is the k lowest-id vectors (a
driver-sized artifact either engine can reconstruct), every argmin/argmax
ranks a ROUNDED score with a lowest-id tie-break, and every classifier
weight is an md5-derived INTEGER so per-document sums are exact — no
float-summation-order exposure anywhere a decision is made.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_div
from ..operators import vectorml
from ..sources import table
from .catalog import register

K_CLUSTERS = 8
DIM = 64
SEM_TAU = 0.4
PQ_M = 4
PQ_K = 8

_CENT_SQL = f"""cent AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
      FROM embeddings WHERE vec_id < {K_CLUSTERS}
    ),
    scored AS (
      SELECT e.vec_id, cent.cid,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cent.c), 6) AS cos6
      FROM embeddings e CROSS JOIN cent
    ),
    assigned AS (
      SELECT vec_id, cid, cos6 FROM (
        SELECT vec_id, cid, cos6,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos6 DESC, cid) AS rk
        FROM scored
      ) WHERE rk = 1
    )"""


@register(
    "kmeans_assign_embeddings",
    oracle=f"""
    WITH {_CENT_SQL}
    SELECT CAST(cid AS INT) AS cluster_id,
           COUNT(*) AS n_members,
           ROUND(AVG(cos6) + 0.00000001, 4) AS avg_cos
    FROM assigned GROUP BY cid ORDER BY cluster_id
    """,
    tags=("vector", "kmeans", "clustering"),
)
def kmeans_assign_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means assignment (k=8 deterministic seed centroids) +
    per-cluster stats. The assignment is a per-row argmax over a LITERAL
    codebook — higher-order array functions inside codegen, zero joins,
    zero Python; the only shuffle is the k-row stats aggregate. This is
    the scoring step of distributed k-means: the fit lives driver-side on
    a sample (operators/ivf.py), the assign scales with the corpus."""
    emb = table(spark, sf_dir, "embeddings")
    centers = vectorml.seed_centroids(emb, K_CLUSTERS)
    return (
        vectorml.assign_nearest_centroid(emb, centers)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            round_div(F.avg("cos"), 4).alias("avg_cos"),
        )
        .orderBy("cluster_id")
    )


@register(
    "semdedup_prune_stats",
    oracle=f"""
    WITH {_CENT_SQL},
    pairs AS (
      SELECT a.cid, b.vec_id AS b_id
      FROM assigned a
      JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                         CAST(eb.embedding AS DOUBLE[])), 4) >= {SEM_TAU}
    ),
    pruned AS (SELECT cid, b_id FROM pairs GROUP BY cid, b_id),
    losses AS (SELECT cid, COUNT(*) AS n_pruned FROM pruned GROUP BY cid)
    SELECT CAST(a.cid AS INT) AS cluster_id,
           COUNT(*) AS n_members,
           CAST(COALESCE(MAX(l.n_pruned), 0) AS BIGINT) AS n_pruned,
           CAST(COUNT(*) - COALESCE(MAX(l.n_pruned), 0) AS BIGINT) AS n_survivors
    FROM assigned a LEFT JOIN losses l ON a.cid = l.cid
    GROUP BY a.cid ORDER BY cluster_id
    """,
    tags=("vector", "dedup", "semdedup"),
    doc="SemDeDup (Abbas et al. 2023): semantic near-dup pruning that only "
    "compares vectors within a k-means cluster — Σ O(n_c²) instead of "
    "O(n²), the bucket-then-verify shape with semantically chosen buckets.",
)
def semdedup_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    centers = vectorml.seed_centroids(emb, K_CLUSTERS)
    return (
        vectorml.semantic_dedup(emb, centers, threshold=SEM_TAU)
        .select(
            "cluster_id",
            "n_members",
            F.col("n_pruned").cast("long").alias("n_pruned"),
            F.col("n_survivors").cast("long").alias("n_survivors"),
        )
        .orderBy("cluster_id")
    )


@register(
    "pq_codes_stats",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
      FROM embeddings WHERE vec_id < {PQ_K}
    ),
    scored AS (
      SELECT e.vec_id, e.label, t.s, seeds.cid,
             ROUND(list_distance(
               CAST(e.embedding[t.s*{DIM // PQ_M}+1 : t.s*{DIM // PQ_M}+{DIM // PQ_M}] AS DOUBLE[]),
               seeds.c[t.s*{DIM // PQ_M}+1 : t.s*{DIM // PQ_M}+{DIM // PQ_M}]), 6) AS d
      FROM embeddings e, UNNEST(range(0, {PQ_M})) AS t(s), seeds
    ),
    best AS (
      SELECT vec_id, label, s, cid, d FROM (
        SELECT vec_id, label, s, cid, d,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, cid) AS rk
        FROM scored
      ) WHERE rk = 1
    ),
    codes AS (
      SELECT vec_id, label,
             string_agg(CAST(cid AS VARCHAR), '-' ORDER BY s) AS code,
             SUM(d) AS recon_dist
      FROM best GROUP BY vec_id, label
    )
    SELECT label, COUNT(*) AS n_vecs,
           COUNT(DISTINCT code) AS n_codes,
           ROUND(AVG(recon_dist) + 0.00000001, 4) AS avg_recon
    FROM codes GROUP BY label ORDER BY label
    """,
    tags=("vector", "pq", "compression"),
    doc="Product quantization (Jégou et al. 2011): 64-dim → 4 sub-codes "
    "against 8-entry per-subspace codebooks. 256 B/vector → 4 B — the "
    "compression that fits a 100 TB vector corpus into a serving tier. "
    "Encoding is a literal-codebook per-row map: zero shuffle, codegen.",
)
def pq_codes_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    books = vectorml.subspace_codebooks(emb, PQ_M, PQ_K, DIM)
    return (
        vectorml.pq_encode(emb, books)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.countDistinct("code").alias("n_codes"),
            round_div(F.avg("recon_dist"), 4).alias("avg_recon"),
        )
        .orderBy("label")
    )


# Hashing-trick linear classifier: bucket = md5(token) % 64, weight(bucket) =
# md5('w'||bucket)-derived integer in [-1000, 1000]. Integer per-doc sums are
# EXACT (no float order exposure); the logit divides once at the end.
_N_BUCKETS = 64
# DuckDB twin of _TOK_W below — interpolated into BOTH oracles that score
# tokens (classifier + calibration), so a weight-scheme change cannot edit
# one and silently desynchronize the other.
_TOK_W_SQL = (
    "('0x' || substr(md5('w' || CAST(('0x' || substr(md5(t), 1, 2))::BIGINT % "
    f"{_N_BUCKETS} AS VARCHAR)), 1, 4))::BIGINT % 2001 - 1000"
)
_TOK_W = (
    "cast(conv(substr(md5(concat('w', cast(cast(conv(substr(md5({t}), 1, 2), 16, 10) "
    f"as bigint) % {_N_BUCKETS} as string))), 1, 4), 16, 10) as bigint) % 2001 - 1000"
)


@register(
    "quality_classifier_hashed",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS tok
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(tok) AS INT) AS n_tokens,
             CAST(list_sum(list_transform(tok, t ->
               {_TOK_W_SQL}
             )) AS BIGINT) AS wsum
      FROM toks WHERE len(tok) >= 1
    )
    SELECT doc_id, n_tokens,
           ROUND(wsum / (1000.0 * n_tokens) + 0.00000001, 4) AS logit,
           wsum > 0 AS keep
    FROM scored ORDER BY doc_id
    """,
    tags=("text", "quality", "classifier"),
    doc="fastText-style quality filter: hashing-trick linear model (64 "
    "buckets, fixture weights — a trained model drops in as the same "
    "bucket→weight map). Pure per-row map over the token array via "
    "higher-order aggregate; integer weight sums make the score exact.",
)
def quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = _TOK_W.format(t="t")
    return (
        docs.select(
            "doc_id",
            F.expr("filter(split(lower(text), '[^a-z]+'), t -> t != '')").alias("tok"),
        )
        .filter(F.size("tok") >= 1)
        .select(
            "doc_id",
            F.size("tok").alias("n_tokens"),
            F.expr(f"aggregate(tok, cast(0 as bigint), (acc, t) -> acc + ({w}))").alias(
                "wsum"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            round_div(F.col("wsum") / (1000.0 * F.col("n_tokens")), 4).alias("logit"),
            (F.col("wsum") > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "embedding_covariance_topk",
    oracle=f"""
    WITH elems AS (
      SELECT e.vec_id, t.i, CAST(e.embedding[t.i] AS DOUBLE) AS v
      FROM embeddings e, UNNEST(range(1, {DIM + 1})) AS t(i)
    ),
    moments AS (
      SELECT a.i - 1 AS i, b.i - 1 AS j,
             SUM(a.v * b.v) AS s, COUNT(*) AS n,
             SUM(a.v) AS sum_i, SUM(b.v) AS sum_j
      FROM elems a JOIN elems b ON a.vec_id = b.vec_id AND a.i < b.i
      GROUP BY a.i, b.i
    ),
    cov AS (
      SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
             ROUND((s - sum_i * sum_j / n) / (n - 1) + 0.00000001, 6) AS cov6
      FROM moments
    ),
    ranked AS (
      SELECT i, j, cov6,
             ROW_NUMBER() OVER (ORDER BY ABS(cov6) DESC, i, j) AS rk
      FROM cov
    )
    SELECT i, j, cov6, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 20 ORDER BY rk
    """,
    tags=("vector", "covariance", "pca"),
    doc="Top-20 |covariance| dimension pairs from the distributed Gram "
    "matrix: per-partition d×d numpy partials summed map-side-combine "
    "style — the shuffle carries O(partitions·d²) scalars, never O(rows). "
    "The d×d result is driver-sized; PCA's eigensolve on it is an O(d³) "
    "afterthought, not a Spark job.",
)
def embedding_covariance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    cov = vectorml.covariance_pairs(emb, dim=DIM).select(
        "i", "j", round_div(F.col("cov"), 6).alias("cov6")
    )
    w = Window.orderBy(F.abs(F.col("cov6")).desc(), "i", "j")
    return (
        cov.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .orderBy("rk")
    )


CAL_LONG_CHARS = 1000
CAL_TEMP = 10.0  # logit temperature: spreads the cluster-near-0 raw logits across deciles


@register(
    "quality_classifier_calibration",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, n_chars,
             list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS tok
      FROM documents
    ),
    scored AS (
      SELECT doc_id, n_chars,
             CAST(len(tok) AS INT) AS n_tokens,
             CAST(list_sum(list_transform(tok, t ->
               {_TOK_W_SQL}
             )) AS BIGINT) AS wsum
      FROM toks WHERE len(tok) >= 1
    ),
    probs AS (
      SELECT doc_id,
             ROUND(1.0 / (1.0 + EXP(-{CAL_TEMP} * (ROUND(wsum / (1000.0 * n_tokens) + 0.00000001, 4)))) + 0.00000001, 6) AS p,
             CASE WHEN n_chars >= {CAL_LONG_CHARS} THEN 1.0 ELSE 0.0 END AS label
      FROM scored
    ),
    b AS (
      SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bucket, p, label FROM probs
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(p) + 0.00000001, 4)     AS avg_pred,
           ROUND(AVG(label) + 0.00000001, 4) AS label_rate,
           ROUND(ABS(AVG(p) - AVG(label)) + 0.00000001, 4) AS abs_gap
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    tags=("quality", "classifier", "calibration", "ml-eval"),
    doc="Reliability diagram (calibration report) for the hashed quality "
    "classifier: sigmoid probabilities bucketed into deciles, per-bucket "
    "mean predicted probability vs observed label rate and their gap — "
    "the standard check before a classifier's scores gate a corpus (a "
    "miscalibrated filter silently over/under-prunes). Label here is the "
    "long-form indicator (n_chars ≥ 1000) as the deterministic stand-in; "
    "a real relevance/quality label drops into the same column. One "
    "map-side score pass + one bounded (≤10-group) aggregate — the "
    "eval costs one scan at any corpus size.",
)
def quality_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = _TOK_W.format(t="t")
    scored = (
        docs.select(
            "doc_id",
            "n_chars",
            F.expr("filter(split(lower(text), '[^a-z]+'), t -> t != '')").alias("tok"),
        )
        .filter(F.size("tok") >= 1)
        .select(
            "doc_id",
            "n_chars",
            F.size("tok").alias("n_tokens"),
            F.expr(f"aggregate(tok, cast(0 as bigint), (acc, t) -> acc + ({w}))").alias(
                "wsum"
            ),
        )
    )
    # p is rounded (the repo's +1e-8 convention, scale 6) BEFORE the
    # decile bucketing: Spark's JVM and DuckDB's libm exp() can differ in
    # the last ulp, and an unrounded p within ~1 ulp of a 0.1 boundary
    # would flip a doc's bucket — a whole-row count diff, not a 4th-
    # decimal wobble. Same pre-nonlinearity rounding as the logit's.
    probs = scored.select(
        round_div(
            1.0
            / (
                1.0
                + F.exp(
                    -CAL_TEMP
                    * round_div(F.col("wsum") / (1000.0 * F.col("n_tokens")), 4)
                )
            ),
            6,
        ).alias("p"),
        F.when(F.col("n_chars") >= CAL_LONG_CHARS, 1.0).otherwise(0.0).alias("label"),
    )
    b = probs.select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bucket"),
        "p",
        "label",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            round_div(F.avg("p"), 4).alias("avg_pred"),
            round_div(F.avg("label"), 4).alias("label_rate"),
            round_div(F.abs(F.avg("p") - F.avg("label")), 4).alias("abs_gap"),
        )
        .orderBy("bucket")
    )
