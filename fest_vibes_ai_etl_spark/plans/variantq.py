"""Semi-structured VARIANT path: parse_json → variant_get typed extraction.

The reference round-trips DTOs through JSON strings (S3 bronze files,
props columns); Spark 4's VARIANT is the engine-native form — parsed once,
binary-encoded, path-extracted with type coercion and no per-access
re-parse. The oracle computes the same values straight from the source
columns, which is exactly the point: the variant round-trip must be
lossless."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_div
from ..sources import table
from .catalog import register


@register(
    "variant_semi_structured",
    oracle="""
    SELECT event_type AS vtype,
           COUNT(*) AS n,
           ROUND(AVG(ROUND(value, 2)) + 0.00000001, 4) AS avg_val,
           CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    WHERE ROUND(value, 2) > 50.0
    GROUP BY event_type
    """,
    tags=("variant", "json", "semi-structured"),
)
def variant_semi_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a nested JSON document per event, parse it into a VARIANT, then
    filter/aggregate purely through variant_get path extraction (typed at
    access). Proves the parse→extract round-trip is lossless: the oracle
    computes identical results from the flat source columns."""
    ev = table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("user_id").alias("user"),
            F.struct(
                F.col("event_type").alias("type"),
                F.round("value", 2).alias("val"),
            ).alias("evt"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    v = ev.select(F.parse_json(doc).alias("v"))
    flat = v.select(
        F.variant_get("v", "$.evt.type", "string").alias("vtype"),
        F.variant_get("v", "$.evt.val", "double").alias("val"),
        F.variant_get("v", "$.k", "long").alias("k"),
    )
    return (
        flat.filter(F.col("val") > 50.0)
        .groupBy("vtype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_div(F.avg("val"), 4).alias("avg_val"),
            F.sum("k").alias("sum_k"),
        )
    )


@register(
    "scalar_regex_suite",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, 'row')) AS n_row,
           split_part(text, ' ', 3) AS third_word,
           string_split(text, ' ')[-1] AS last_word
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("scalar", "regex"),
)
def scalar_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_count / split_part / element_at(-1) — the multi-match and
    positional string-extraction family, row-parallel and codegen'd."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit("row")).alias("n_row"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(3)).alias("third_word"),
        F.element_at(F.split("text", " "), -1).alias("last_word"),
    )
