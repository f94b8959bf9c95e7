"""Python UDTF surface: a lateral table function over the corpus.

Completes the UDF-family API coverage (scalar pandas UDF, mapInPandas,
applyInPandas, applyInPandasWithState, cogroup — and now UDTF). A UDTF is
row-at-a-time Python, i.e. the SLOW path: use it when each input row
genuinely yields a variable-length relation and the logic resists array
lambdas. Where the built-ins can express the same thing (explode over
codegen'd transforms, as in text_top_bigrams / corpus_chunk_documents),
prefer them — this entry exists to prove the surface with honest costs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..sources import table
from .catalog import register


@udtf(returnType="term: string, tf: int")
class TermCounts:
    """Emit (term, frequency) per input document — self-contained (stdlib
    only) so it pickles to worker processes without the package."""

    def eval(self, text: str):
        from collections import Counter

        for term, tf in sorted(Counter((text or "").split()).items()):
            yield term, tf


@register(
    "udtf_term_counts",
    oracle="""
    SELECT doc_id, term, CAST(tf AS INT) AS tf
    FROM (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS term
            FROM documents WHERE doc_id < 50)
      GROUP BY doc_id, term
    )
    """,
    tags=("udtf", "lateral", "python"),
)
def udtf_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document term frequencies via a LATERAL Python UDTF call (one
    input row ⇒ N output rows). The oracle is the set-based UNNEST+GROUP BY
    formulation — identical results, which is exactly the point: the UDTF
    is an API surface, the relational form is the scale path."""
    spark.udtf.register("fv_term_counts", TermCounts)
    table(spark, sf_dir, "documents").filter("doc_id < 50").createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql("""
        SELECT d.doc_id, t.term, t.tf
        FROM udtf_docs d, LATERAL fv_term_counts(d.text) t
    """)
