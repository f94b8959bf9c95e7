"""BM25 keyword-search query over the documents corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.search import build_postings, bm25_topk
from ..sources import table
from .catalog import register

TERMS = ["merge", "hash", "window"]
TOPN = 10
_TERMS_SQL = ", ".join(f"'{t}'" for t in TERMS)


@register(
    "search_bm25_topk",
    oracle=f"""
    WITH toks AS (
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
    scored AS (
      SELECT tf.doc_id,
             SUM( LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                  * tf.tf * (1.2 + 1.0)
                  / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) ) AS s
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(s + 0.00000001, 4) AS score
    FROM scored ORDER BY score DESC, doc_id
    LIMIT {TOPN}
    """,
    tags=("search", "bm25", "text"),
    bench=True,
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for the bag-of-words query {merge, hash, window}:
    inverted-index postings pruned to the query terms before any shuffle,
    tiny df/corpus-stats aggregates broadcast into a single codegen'd score
    expression, one groupBy over candidate docs. The oracle recomputes the
    identical formula in SQL."""
    docs = table(spark, sf_dir, "documents")
    postings, doclen = build_postings(docs)
    return bm25_topk(postings, doclen, TERMS, topn=TOPN)
