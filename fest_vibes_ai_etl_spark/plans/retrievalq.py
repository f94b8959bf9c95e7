"""Retrieval-stack queries: hybrid lexical+vector fusion and the
PQ compressed-domain ANN scan — the serving-side reads of an embedding
corpus (operators/search.py supplies BM25, operators/vectorml.py the PQ
machinery; corpus convention: ``documents.doc_id`` ≡ ``embeddings.vec_id``).

Scale stances:

- **RRF hybrid fusion** (Cormack et al. 2009): each retriever returns its
  own top-N (both already shuffle-pruned: BM25 postings pruned to query
  terms, cosine ranking through the map-side top-k), and the fusion joins
  two N-row tables — driver-trivial no matter the corpus size. Rank-based
  fusion also sidesteps score-scale calibration between BM25 and cosine,
  which is why it's the default hybrid in production search stacks.
- **ADC top-k** (Jégou et al. 2011 §III): the corpus side of the distance
  is computed from PQ codes only — at serving scale the scan reads m small
  codes (4 B/vector) instead of d floats (256 B/vector), a 64× I/O cut
  with zero shuffle added. Here the reconstruction is inlined as a
  literal-codebook map so the whole scored scan stays in codegen; the
  exact-distance twin (`ann_topk_cosine`) measures the recall cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_div
from ..operators import vectorml
from ..operators.search import bm25_topk, load_or_build_postings_store
from ..operators.topk import topk_per_group
from ..sources import table
from .catalog import register
from .searchq import TERMS, _TERMS_SQL

RRF_K = 60
FUSE_N = 50
FUSE_TOP = 10
QVEC = 0  # query vector for the dense leg

_BM25_SQL = f"""toks AS (
      SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term IN ({_TERMS_SQL})
      GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    bm AS (
      SELECT tf.doc_id,
             ROUND(SUM( LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                  * tf.tf * (1.2 + 1.0)
                  / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) )
                  + 0.00000001, 4) AS score
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    bm_rk AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rk
      FROM bm QUALIFY rk <= {FUSE_N}
    ),
    vec_rk AS (
      SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY cos6 DESC, vec_id) AS INT) AS rk
      FROM (
        SELECT c.vec_id,
               ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])), 6) AS cos6
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id = {QVEC}
      ) QUALIFY rk <= {FUSE_N}
    )"""


@register(
    "hybrid_rrf_fusion",
    oracle=f"""
    WITH {_BM25_SQL},
    fused AS (
      SELECT COALESCE(b.doc_id, v.vec_id) AS id,
             ROUND(COALESCE(1.0 / ({RRF_K} + b.rk), 0.0)
                   + COALESCE(1.0 / ({RRF_K} + v.rk), 0.0) + 0.00000001, 6) AS rrf6,
             b.rk AS bm25_rk, v.rk AS cos_rk
      FROM bm_rk b FULL OUTER JOIN vec_rk v ON b.doc_id = v.vec_id
    )
    SELECT id, rrf6, bm25_rk, cos_rk,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf6 DESC, id) AS INT) AS rk
    FROM fused QUALIFY rk <= {FUSE_TOP} ORDER BY rk
    """,
    tags=("search", "hybrid", "rrf", "vector"),
    doc="Reciprocal-rank fusion of the BM25 lexical top-50 and the cosine "
    "dense top-50 (rrf = Σ 1/(60+rank)) — rank-based, so no score-scale "
    "calibration between retrievers; each leg is already shuffle-pruned "
    "and the fusion itself joins two 50-row tables.",
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    load_or_build_postings_store(spark, docs, sf_dir)  # stage once per sf
    from pyspark.sql import Window

    from ..operators.search import postings_store_path, pruned_postings_for_terms
    from ..streaming.incremental_search import index_doclen

    # the BM25 leg partition-prunes to the query terms' tb= buckets, and
    # doclen comes from the tombstone-consistent view (purge-invariant)
    store = postings_store_path(sf_dir)
    pruned = pruned_postings_for_terms(spark, store, TERMS)
    doclen = index_doclen(spark, store)
    bm = bm25_topk(pruned, doclen, TERMS, topn=FUSE_N).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("bm25_rk"),
    )
    from ..operators.similarity import topk_cosine

    vec = topk_cosine(emb, emb.filter(F.col("vec_id") == QVEC), k=FUSE_N).select(
        "vec_id", F.col("rk").alias("cos_rk")
    )
    fused = bm.join(vec, bm["doc_id"] == vec["vec_id"], "full_outer").select(
        F.coalesce("doc_id", "vec_id").alias("id"),
        round_div(
            F.coalesce(1.0 / (RRF_K + F.col("bm25_rk")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("cos_rk")), F.lit(0.0)),
            6,
        ).alias("rrf6"),
        "bm25_rk",
        "cos_rk",
    )
    w = Window.orderBy(F.desc("rrf6"), "id")
    return (
        fused.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= FUSE_TOP)
        .orderBy("rk")
    )


PQ_M = 4
PQ_K = 8
DIM = 64
ADC_QUERIES = 5
ADC_TOP = 5
_DSUB = DIM // PQ_M


def _pq_prepare(spark: SparkSession, sf_dir: str) -> None:
    emb = table(spark, sf_dir, "embeddings")
    vectorml.load_or_build_pq_codes(spark, emb, sf_dir, PQ_M, PQ_K, DIM)


@register(
    "ann_pq_adc_topk",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
      FROM embeddings WHERE vec_id < {PQ_K}
    ),
    scored AS (
      SELECT e.vec_id, t.s, seeds.cid,
             ROUND(list_distance(
               CAST(e.embedding[t.s*{_DSUB}+1 : t.s*{_DSUB}+{_DSUB}] AS DOUBLE[]),
               seeds.c[t.s*{_DSUB}+1 : t.s*{_DSUB}+{_DSUB}]), 6) AS d
      FROM embeddings e, UNNEST(range(0, {PQ_M})) AS t(s), seeds
    ),
    best AS (
      SELECT vec_id, s, cid FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, cid) AS rk
        FROM scored
      ) WHERE rk = 1
    ),
    recon AS (
      SELECT b.vec_id,
             flatten(list(se.c[b.s*{_DSUB}+1 : b.s*{_DSUB}+{_DSUB}] ORDER BY b.s)) AS r
      FROM best b JOIN seeds se ON se.cid = b.cid
      GROUP BY b.vec_id
    ),
    q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {ADC_QUERIES}
    ),
    adc AS (
      SELECT q.query_id, r.vec_id,
             ROUND(list_distance(q.qv, r.r), 6) AS adc6
      FROM q CROSS JOIN recon r
      WHERE r.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, adc6, CAST(rk AS INT) AS rk FROM (
      SELECT query_id, vec_id, adc6,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc6, vec_id) AS rk
      FROM adc
    ) WHERE rk <= {ADC_TOP} ORDER BY query_id, rk
    """,
    tags=("similarity", "pq", "adc", "compression"),
    bench=True,
    prepare=_pq_prepare,
    doc="Asymmetric-distance (ADC) top-5: queries stay full-width, the "
    "corpus side is SCANNED FROM THE PERSISTED PQ CODE STORE (m ints per "
    "vector vs d floats — a 64× scan-I/O cut; build/probe split per the "
    "IVF-index pattern, bench prepare hook amortizes the one-off encode). "
    "Decompression is a literal-codebook lookup in codegen; only "
    "ADC_TOP·|Q| rows reach the ranking shuffle.",
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    codes, books = vectorml.load_or_build_pq_codes(
        spark, emb, sf_dir, PQ_M, PQ_K, DIM
    )
    # expr-built decompress + distance (round 14): the literal-codebook
    # lookup and the L2 lambda cost ~1 s of driver plan-construction per
    # call through py4j; the one-parse twins build the identical tree.
    recon = codes.select(
        "vec_id", vectorml.recon_from_codes_n("codes", books).alias("recon")
    )
    q = F.broadcast(
        emb.filter(F.col("vec_id") < ADC_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
    )
    scored = (
        recon.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(vectorml.l2_distance_n("qv", "recon"), 6).alias("adc6"),
        )
        .withColumn("neg", -F.col("adc6"))  # rank ascending via the desc top-k
    )
    return (
        topk_per_group(scored, ["query_id"], "neg", "vec_id", ADC_TOP)
        .select("query_id", "vec_id", "adc6", "rk")
        .orderBy("query_id", "rk")
    )


RERANK_QUERY = " ".join(TERMS)  # "merge hash window"
RERANK_CAND = 50
RERANK_TOP = 10


@register(
    "retrieval_rerank_pipeline",
    oracle=f"""
    WITH {_BM25_SQL},
    cand AS (
      SELECT b.doc_id, d.text
      FROM bm_rk b JOIN documents d USING (doc_id)
    ),
    scored AS (
      SELECT doc_id,
             ROUND((('0x' || substr(md5('{RERANK_QUERY}' || '|' || text), 1, 8))::BIGINT
                    / 4294967296.0), 6) AS score6
      FROM cand
    )
    SELECT doc_id, score6, CAST(rk AS INT) AS rk FROM (
      SELECT doc_id, score6,
             ROW_NUMBER() OVER (ORDER BY score6 DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= {RERANK_TOP} ORDER BY rk
    """,
    tags=("search", "rerank", "cross-encoder"),
    doc="Retrieve-then-rerank: BM25 narrows the corpus to 50 candidates, "
    "and ONLY those (query, doc) pairs reach the cross-encoder scorer "
    "(mapInPandas, model loaded once per worker — stubbed md5 scorer in "
    "this sandbox, sentence-transformers CrossEncoder via "
    "operators/rerank.py:real_cross_encoder_factory outside it). The "
    "expensive model's cost is k_retrieve·|Q|, never corpus-sized.",
)
def retrieval_rerank_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.rerank import rerank_topk

    docs = table(spark, sf_dir, "documents")
    load_or_build_postings_store(spark, docs, sf_dir)  # stage once per sf
    from ..operators.search import postings_store_path, pruned_postings_for_terms
    from ..streaming.incremental_search import index_doclen

    store = postings_store_path(sf_dir)
    pruned = pruned_postings_for_terms(spark, store, TERMS)
    doclen = index_doclen(spark, store)
    cand = (
        bm25_topk(pruned, doclen, TERMS, topn=RERANK_CAND)
        .join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id", "text", F.lit(RERANK_QUERY).alias("q"), F.lit(0).alias("_g")
        )
    )
    return (
        rerank_topk(cand, "q", "text", "_g", "doc_id", k=RERANK_TOP)
        .select("doc_id", "score6", "rk")
        .orderBy("rk")
    )


HN_ANCHORS = 10
HN_K = 5


@register(
    "trainprep_hard_negatives",
    oracle=f"""
    WITH scored AS (
      SELECT a.vec_id AS anchor_id, c.vec_id AS neg_id, a.label AS anchor_label,
             ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS cos6
      FROM embeddings a JOIN embeddings c
        ON c.vec_id <> a.vec_id AND c.label <> a.label
      WHERE a.vec_id < {HN_ANCHORS}
    )
    SELECT anchor_id, anchor_label, neg_id, ROUND(cos6, 4) AS cosine,
           CAST(rk AS INT) AS rk
    FROM (
      SELECT anchor_id, anchor_label, neg_id, cos6,
             ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY cos6 DESC, neg_id) AS rk
      FROM scored
    ) WHERE rk <= {HN_K} ORDER BY anchor_id, rk
    """,
    tags=("trainprep", "vector", "negatives"),
    doc="Hard-negative mining for contrastive training: per anchor, the "
    "top-5 most-cosine-similar vectors with a DIFFERENT label — the "
    "near-miss negatives that actually move an embedding model. Anchors "
    "broadcast, corpus never shuffles, ranking through the map-side "
    "top-k prune: the shuffle sees k·|anchors| rows.",
)
def trainprep_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vector as V

    emb = table(spark, sf_dir, "embeddings")
    anchors = F.broadcast(
        emb.filter(F.col("vec_id") < HN_ANCHORS).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            F.col("embedding").alias("av"),
        )
    )
    scored = (
        emb.select("vec_id", "label", "embedding")
        .crossJoin(anchors)
        .filter(
            (F.col("vec_id") != F.col("anchor_id"))
            & (F.col("label") != F.col("anchor_label"))
        )
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("neg_id"),
            F.round(V.cosine(F.col("av"), F.col("embedding")), 6).alias("cos6"),
        )
    )
    return (
        topk_per_group(scored, ["anchor_id"], "cos6", "neg_id", HN_K)
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            F.round("cos6", 4).alias("cosine"),
            "rk",
        )
        .orderBy("anchor_id", "rk")
    )


EVAL_Q = 10
EVAL_K = 10


@register(
    "retrieval_eval_ndcg",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
      FROM embeddings WHERE vec_id < {PQ_K}
    ),
    scored AS (
      SELECT e.vec_id, t.s, seeds.cid,
             ROUND(list_distance(
               CAST(e.embedding[t.s*{_DSUB}+1 : t.s*{_DSUB}+{_DSUB}] AS DOUBLE[]),
               seeds.c[t.s*{_DSUB}+1 : t.s*{_DSUB}+{_DSUB}]), 6) AS d
      FROM embeddings e, UNNEST(range(0, {PQ_M})) AS t(s), seeds
    ),
    best AS (
      SELECT vec_id, s, cid FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, cid) AS rk
        FROM scored
      ) WHERE rk = 1
    ),
    recon AS (
      SELECT b.vec_id,
             flatten(list(se.c[b.s*{_DSUB}+1 : b.s*{_DSUB}+{_DSUB}] ORDER BY b.s)) AS r
      FROM best b JOIN seeds se ON se.cid = b.cid
      GROUP BY b.vec_id
    ),
    q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {EVAL_Q}
    ),
    approx AS (
      SELECT query_id, vec_id, rk FROM (
        SELECT q.query_id, r.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY ROUND(list_distance(q.qv, r.r), 6), r.vec_id) AS rk
        FROM q CROSS JOIN recon r WHERE r.vec_id <> q.query_id
      ) WHERE rk <= {EVAL_K}
    ),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, c.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY ROUND(list_distance(q.qv, CAST(c.embedding AS DOUBLE[])), 6), c.vec_id) AS rk
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id
      ) WHERE rk <= {EVAL_K}
    ),
    idcg AS (
      SELECT SUM(1.0 / LOG2(t.i + 1.0)) AS v FROM UNNEST(range(1, {EVAL_K + 1})) AS t(i)
    )
    SELECT a.query_id,
           CAST(COUNT(e.vec_id) AS BIGINT) AS hits,
           ROUND(SUM(CASE WHEN e.vec_id IS NOT NULL
                          THEN 1.0 / LOG2(a.rk + 1.0) ELSE 0.0 END)
                 / (SELECT v FROM idcg) + 0.00000001, 4) AS ndcg
    FROM approx a LEFT JOIN exact e USING (query_id, vec_id)
    GROUP BY a.query_id ORDER BY a.query_id
    """,
    tags=("search", "eval", "ndcg"),
    prepare=_pq_prepare,
    doc="Offline retrieval evaluation: nDCG@10 of the PQ compressed-domain "
    "(ADC) ranking against exact-L2 ground truth, binary relevance — the "
    "recall/quality report every ANN deployment runs before trading "
    "accuracy for scan I/O. Both rankings come from the same plan; the "
    "ground-truth join is k·|Q| rows, so the eval costs one extra exact "
    "scan over the query sample, never the corpus squared.",
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql.functions import broadcast

    emb = table(spark, sf_dir, "embeddings")
    codes, books = vectorml.load_or_build_pq_codes(spark, emb, sf_dir, PQ_M, PQ_K, DIM)
    recon = codes.select(
        "vec_id", vectorml.recon_from_codes(F.col("codes"), books).alias("recon")
    )
    q = broadcast(
        emb.filter(F.col("vec_id") < EVAL_Q).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
    )

    def topk(scored):
        return topk_per_group(
            scored.withColumn("neg", -F.col("d6")), ["query_id"], "neg", "vec_id", EVAL_K
        ).select("query_id", "vec_id", "rk")

    approx = topk(
        recon.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(vectorml.l2_distance(F.col("qv"), F.col("recon")), 6).alias("d6"),
        )
    )
    exact = topk(
        emb.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(vectorml.l2_distance(F.col("qv"), F.col("embedding")), 6).alias("d6"),
        )
    ).select("query_id", "vec_id", F.lit(1).alias("rel"))
    idcg = sum(1.0 / math.log2(i + 1.0) for i in range(1, EVAL_K + 1))
    return (
        approx.join(exact, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("rel").cast("long").alias("hits"),
            round_div(
                F.sum(
                    F.when(
                        F.col("rel").isNotNull(), 1.0 / F.log2(F.col("rk") + 1.0)
                    ).otherwise(0.0)
                )
                / F.lit(idcg),
                4,
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )
