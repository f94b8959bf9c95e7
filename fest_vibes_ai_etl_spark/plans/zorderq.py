"""Z-order layout query: demonstrates (and oracle-checks) that Morton-key
bucketing bounds BOTH dimensions per bucket — the data-skipping property a
Z-ordered file layout gives parquet min/max pruning."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.zorder import morton_key, morton_key_sql
from ..sources import table
from .catalog import register

# events dims: user_id < 2^8-ish, floor(value) < 2^8 — 8 bits each is exact
BITS = 8
PREFIX_SHIFT = 8  # drop 4 low bits per dim -> 16x16 rectangles per bucket


@register(
    "zorder_bucket_bounds",
    oracle=f"""
    WITH dims AS (
      SELECT user_id AS x, CAST(FLOOR(value) AS BIGINT) & 255 AS y FROM events
    ),
    keyed AS (
      SELECT x, y, {morton_key_sql('x', 'y', BITS)} >> {PREFIX_SHIFT} AS bucket
      FROM dims
    )
    SELECT bucket, COUNT(*) AS n_rows,
           MIN(x) AS x_min, MAX(x) AS x_max,
           MIN(y) AS y_min, MAX(y) AS y_max
    FROM keyed GROUP BY bucket
    """,
    tags=("storage", "zorder", "layout"),
)
def zorder_bucket_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-bucket statistics over (user_id, floor(value)): every bucket's
    min/max must span ≤ 16 in BOTH dimensions (asserted in
    tests/test_zorder.py) — i.e. files laid out by this key give parquet
    row-group pruning on either predicate. The key is a pure bitwise column
    expression; the identical SQL is generated from the same loop."""
    ev = table(spark, sf_dir, "events")
    dims = ev.select(
        F.col("user_id").alias("x"),
        F.floor("value").cast("long").bitwiseAND(F.lit(255)).alias("y"),
    )
    keyed = dims.select(
        "x", "y", F.shiftright(morton_key(F.col("x"), F.col("y"), BITS), PREFIX_SHIFT).alias("bucket")
    )
    return keyed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )
