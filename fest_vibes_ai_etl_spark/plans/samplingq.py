"""Deterministic hash-Bernoulli sampling — the reproducible TABLESAMPLE.

``TABLESAMPLE``/``df.sample`` draw from a seeded RNG whose stream depends
on partitioning, so resampling after a repartition (or on another engine)
yields a different subset. Hashing a stable row key instead makes the
sample a pure function of the data: reproducible across engines, retries,
and cluster sizes — which is what a training pipeline needs for holdouts
(see also corpus_split_assign / corpus_mixture_resample for the group-aware
and stratified variants)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import dec_sum
from ..sources import table
from .catalog import register

# keep rows whose md5(rowkey) first byte <= 0x28: (0x28+1)/256 ~ 16.0%
THRESHOLD = "28"


@register(
    "sample_stratified_fixed_n",
    oracle="""
    WITH keyed AS (
      SELECT l_returnflag,
             l_orderkey * 10 + l_linenumber AS rowkey,
             md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)) AS h
      FROM lineitem
    ),
    ranked AS (
      SELECT l_returnflag, rowkey, h,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h DESC, rowkey) AS rk
      FROM keyed
    )
    SELECT l_returnflag, rowkey, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 100 ORDER BY l_returnflag, rk
    """,
    tags=("sampling", "stratified", "deterministic"),
)
def sample_stratified_fixed_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-n-per-stratum sample (n=100 per returnflag) by md5 hash rank —
    the deterministic reservoir: the same rows are drawn on any engine, any
    partitioning, any cluster size. Ranking goes through topk_per_group's
    map-side prune, so only n·|strata| rows per input partition reach the
    shuffle — a reservoir sample of a 100 TB fact moves MBs, not the fact."""
    from ..operators.topk import topk_per_group

    li = table(spark, sf_dir, "lineitem")
    rowkey = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rowkey")
    keyed = li.select("l_returnflag", rowkey).select(
        "l_returnflag",
        "rowkey",
        F.md5(F.col("rowkey").cast("string").cast("binary")).alias("h"),
    )
    return (
        topk_per_group(keyed, ["l_returnflag"], "h", "rowkey", 100)
        .select("l_returnflag", "rowkey", "rk")
        .orderBy("l_returnflag", "rk")
    )


@register(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_sampled,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sampled_price
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 2) <= '{THRESHOLD}'
    GROUP BY l_returnflag
    """,
    tags=("sampling", "deterministic"),
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~16% Bernoulli sample keyed on md5 of the primary key — map-side
    filter, no shuffle until the verification aggregate; the oracle selects
    the byte-identical subset."""
    li = table(spark, sf_dir, "lineitem")
    rowkey = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    keep = F.substring(F.md5(rowkey.cast("binary")), 1, 2) <= THRESHOLD
    return (
        li.filter(keep)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dec_sum(F.col("l_extendedprice")).alias("sampled_price"),
        )
    )


@register(
    "sample_weighted_reservoir",
    oracle="""
    WITH keyed AS (
      SELECT l_orderkey * 10 + l_linenumber AS rowkey,
             l_quantity AS w,
             ROUND(POWER(
               ((('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 6))::BIGINT + 1)
                / 16777217.0),
               1.0 / l_quantity), 9) AS k9
      FROM lineitem
    ),
    ranked AS (
      SELECT rowkey, w, k9,
             ROW_NUMBER() OVER (ORDER BY k9 DESC, rowkey) AS rk
      FROM keyed
    )
    SELECT rowkey, w, k9, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 100 ORDER BY rk
    """,
    tags=("sampling", "weighted", "deterministic"),
    doc="Efraimidis-Spirakis A-Res weighted reservoir (n=100, weight = "
    "l_quantity): key = u^(1/w) with u an md5-derived 24-bit uniform, keep "
    "the n largest keys. Deterministic across engines and partitionings "
    "(the RNG is the data); the key is ranked at 9 decimals with a rowkey "
    "tie-break so a 1-ulp pow() divergence between libms cannot reorder "
    "the sample. Same map-side top-k prune as the stratified sampler: "
    "the shuffle sees n rows per input partition, never the fact.",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling is the training-mixture primitive (sample documents
    proportional to quality/length): A-Res turns it into an order statistic,
    which distributes as a top-k — no sequential reservoir state needed."""
    from ..operators.topk import topk_per_group

    li = table(spark, sf_dir, "lineitem")
    rowkey = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rowkey")
    u = (
        F.conv(
            F.substring(F.md5(F.col("rowkey").cast("string").cast("binary")), 1, 6),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / 16777217.0
    keyed = li.select(rowkey, F.col("l_quantity").alias("w")).select(
        "rowkey",
        "w",
        F.round(F.pow(u, 1.0 / F.col("w")), 9).alias("k9"),
        F.lit(0).alias("_g"),
    )
    return (
        topk_per_group(keyed, ["_g"], "k9", "rowkey", 100)
        .select("rowkey", "w", "k9", "rk")
        .orderBy("rk")
    )
