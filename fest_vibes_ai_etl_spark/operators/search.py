"""Distributed keyword search: inverted-index postings + Okapi BM25 ranking.

The reference's search surface is pgvector ANN plus ILIKE filters
(/root/reference/src/shared/db/queries.py); the lakehouse-native missing
piece is lexical retrieval. This module builds the classical IR structures
as DataFrames:

- **postings** (term, doc_id, tf): the inverted index. At 100 TB this table
  is written bucketed by ``term`` so a query's posting lists are a bucket
  scan, not a full-corpus tokenize.
- **doc lengths** (doc_id, dl) + corpus stats (N, avgdl): the BM25
  normalizers — one tiny aggregate, broadcast to the scorer.

Query-time cost is proportional to the posting lists of the query terms
only (the ``isin`` filter prunes before any shuffle), then one groupBy over
candidate docs. No UDFs anywhere — every score term is a codegen'd column
expression."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions import text as T

K1, B = 1.2, 0.75


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Tokenize once, derive the inverted index and per-doc lengths.
    Returns (postings(term, doc_id, tf), doclen(doc_id, dl))."""
    toks = docs.select(F.col(id_col), F.explode(T.tokens(F.col(text_col))).alias("term"))
    postings = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    return postings, doclen


def bm25_topk(
    postings: DataFrame,
    doclen: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    topn: int = 10,
) -> DataFrame:
    """Top-``topn`` docs for a bag of query terms under classic Okapi BM25
    with the Lucene non-negative idf: idf = ln((N - df + ½)/(df + ½) + 1),
    score = Σ_t idf·tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)). Returns
    (doc_id, score) ranked by the 4-decimal-rounded score, doc_id tie-break
    — reproducible across engines and partition counts."""
    hits = postings.filter(F.col("term").isin(terms))
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / norm
    scored = (
        hits.join(broadcast(dfreq), "term")
        .join(doclen, id_col)
        .crossJoin(broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib) + 1e-8, 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), id_col).limit(topn)
