"""Remaining SURVEY §2.7 scalar functions as oracle-checked queries:
F7 (URL join), F10 (date-from-path with 3-pattern fallback), F11 (filename
sanitize), F15 (dict-lookup fallback), F18 (embedding text assembly).

Inputs are synthesized deterministically from the driver tables (the
reference applies these to crawl paths/S3 keys that don't exist here)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalar
from ..sources import table
from .catalog import register


@register(
    "f10_date_from_path",
    oracle="""
    WITH paths AS (
      SELECT o_orderkey,
             CASE o_orderkey % 3
               WHEN 0 THEN 'raw_events/' || strftime(o_orderdate, '%Y/%m/%d') || '/data.json'
               WHEN 1 THEN 'bucket/event_data_' || strftime(o_orderdate, '%Y-%m-%d') || '_x.json'
               ELSE 'bucket/evt_' || strftime(o_orderdate, '%Y%m%d') || '_y.json'
             END AS path
      FROM orders
    )
    SELECT o_orderkey, path,
           CAST(COALESCE(
             CASE WHEN regexp_extract(path, 'raw_events/(\\d{4})/(\\d{2})/(\\d{2})/', 1) <> ''
                  THEN regexp_extract(path, 'raw_events/(\\d{4})/(\\d{2})/(\\d{2})/', 1) || '-' ||
                       regexp_extract(path, 'raw_events/(\\d{4})/(\\d{2})/(\\d{2})/', 2) || '-' ||
                       regexp_extract(path, 'raw_events/(\\d{4})/(\\d{2})/(\\d{2})/', 3) END,
             NULLIF(regexp_extract(path, 'event_data_(\\d{4}-\\d{2}-\\d{2})_', 1), ''),
             CASE WHEN regexp_extract(path, '_(\\d{8})_', 1) <> ''
                  THEN substr(regexp_extract(path, '_(\\d{8})_', 1), 1, 4) || '-' ||
                       substr(regexp_extract(path, '_(\\d{8})_', 1), 5, 2) || '-' ||
                       substr(regexp_extract(path, '_(\\d{8})_', 1), 7, 2) END
           ) AS DATE) AS extracted_date
    FROM paths
    """,
    tags=("scalar", "regex", "path"),
)
def f10_date_from_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 (/root/reference/src/loader/app.py:23-54): extract the scrape date
    from a storage path, 3 patterns with fallback."""
    o = table(spark, sf_dir, "orders")
    path = (
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.concat(F.lit("raw_events/"), F.date_format("o_orderdate", "yyyy/MM/dd"), F.lit("/data.json")),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.concat(F.lit("bucket/event_data_"), F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit("_x.json")),
        )
        .otherwise(
            F.concat(F.lit("bucket/evt_"), F.date_format("o_orderdate", "yyyyMMdd"), F.lit("_y.json"))
        )
    )
    return o.select(
        "o_orderkey",
        path.alias("path"),
        scalar.date_from_path(path).alias("extracted_date"),
    )


@register(
    "f7_f11_url_and_sanitize",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_name IS NULL OR p_name = '' THEN NULL
                ELSE 'https://example.org/' || regexp_replace('/parts/' || replace(p_name, ' ', '-'), '^/', '')
           END AS full_url,
           regexp_replace(regexp_replace('../' || p_name || '!.json', '\\.\\./', '', 'g'),
                          '[^a-zA-Z0-9\\-_.]', '', 'g') AS safe_name
    FROM part
    """,
    tags=("scalar", "url"),
)
def f7_f11_url_and_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 URL join (/root/reference/src/shared/db/models/models.py:102-105)
    + F11 filename sanitize (s3_service.py:24-31)."""
    p = table(spark, sf_dir, "part")
    href = F.concat(F.lit("/parts/"), F.replace(F.col("p_name"), F.lit(" "), F.lit("-")))
    return p.select(
        "p_partkey",
        scalar.full_url("https://example.org", F.when(F.col("p_name") != "", href)).alias("full_url"),
        scalar.sanitize_filename(
            F.concat(F.lit("../"), F.col("p_name"), F.lit("!.json"))
        ).alias("safe_name"),
    )


@register(
    "f15_lookup_fallback_descriptions",
    oracle="""
    SELECT p_partkey, p_type,
           CASE WHEN lower(p_type) LIKE '%economy%'  THEN 'budget-friendly line'
                WHEN lower(p_type) LIKE '%standard%' THEN 'standard line'
                WHEN lower(p_type) LIKE '%small%'    THEN 'compact line'
                WHEN lower(p_type) LIKE '%large%'    THEN 'oversize line'
                ELSE 'general catalog item' END AS description
    FROM part
    """,
    tags=("scalar", "lookup"),
)
def f15_lookup_fallback_descriptions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 (/root/reference/src/loader/service.py:219-240): substring-keyed
    canned descriptions with a default — the genre-description fallback."""
    p = table(spark, sf_dir, "part")
    lt = F.lower(F.col("p_type"))
    desc = (
        F.when(lt.contains("economy"), F.lit("budget-friendly line"))
        .when(lt.contains("standard"), F.lit("standard line"))
        .when(lt.contains("small"), F.lit("compact line"))
        .when(lt.contains("large"), F.lit("oversize line"))
        .otherwise(F.lit("general catalog item"))
    )
    return p.select("p_partkey", "p_type", desc.alias("description"))


@register(
    "f18_embed_text_assembly",
    oracle="""
    SELECT c_custkey,
           concat_ws(' ', c_name, 'segment ' || c_mktsegment, n_name,
                     array_to_string(['acct', CAST(ROUND(c_acctbal, 0) AS VARCHAR)], ' ')
           ) AS embed_text
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    tags=("scalar", "embed-text"),
)
def f18_embed_text_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 (/root/reference/src/loader/service.py:59-257): deterministic text
    assembly feeding the embedding encoder — correctness is defined on the
    text, not the vectors (embedding nondeterminism, SURVEY §7.2)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    txt = F.concat_ws(
        " ",
        F.col("c_name"),
        F.concat(F.lit("segment "), F.col("c_mktsegment")),
        F.col("n_name"),
        F.array_join(
            F.array(F.lit("acct"), F.round(F.col("c_acctbal"), 0).cast("string")), " "
        ),
    )
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", txt.alias("embed_text")
    )


@register(
    "scalar_try_safe_suite",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INT)      AS k_int,
           TRY_CAST(json_extract_string(props, '$.tag') AS INT)    AS tag_as_int,
           CASE WHEN CAST(event_id % 5 AS INT) = 0 THEN NULL
                ELSE ROUND(value / CAST(event_id % 5 AS INT), 4) END AS safe_ratio
    FROM events
    """,
    tags=("scalar", "ansi", "try"),
)
def scalar_try_safe_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe scalar suite: the engine runs with spark.sql.ansi.enabled
    (overflow/bad-cast THROW, catching data bugs loudly), so intentional
    maybe-invalid operations use the try_* family — try_cast on a non-numeric
    JSON field yields NULL not an exception, try_divide turns div-by-zero
    into NULL. The oracle mirrors with TRY_CAST / a NULL-guarded divide."""
    ev = table(spark, sf_dir, "events")
    denom = F.pmod(F.col("event_id"), F.lit(5)).cast("int")
    return ev.select(
        "event_id",
        F.try_to_number(F.get_json_object("props", "$.k"), F.lit("999999")).cast("int").alias("k_int"),
        F.get_json_object("props", "$.tag").try_cast("int").alias("tag_as_int"),
        F.round(F.try_divide(F.col("value"), F.nullif(denom, F.lit(0))), 4).alias("safe_ratio"),
    )
