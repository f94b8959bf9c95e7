"""Skew-handling utilities: salted aggregation and salted broadcast join.

AQE's skew-join splitting covers sort-merge joins; these cover the two cases
it doesn't:

- **salted two-stage aggregation** — a groupBy where one key holds a huge
  share of rows bottlenecks a single reducer. Stage 1 aggregates on
  (key, salt) spreading the hot key over N partitions; stage 2 re-aggregates
  on key. Works for any algebraic aggregate (sum/count/min/max); averages
  are carried as (sum, count).
- **salted broadcast join** for hot build keys is unnecessary (broadcast has
  no shuffle); ``replicated_join`` instead handles a skewed *stream-side*
  key joined against a non-broadcastable dim: the dim's hot-key rows are
  replicated N× with salt, the fact side salts randomly — deterministic via
  a hash of a row id, never ``rand()`` (retries must stay stable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_mod: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """groupBy(keys).agg(sum, count) as a two-stage salted aggregation.
    ``salt_from`` names a column whose hash provides the deterministic salt
    (defaults to the value column)."""
    salt = F.pmod(F.xxhash64(F.col(salt_from or value_col)), F.lit(salt_mod))
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum(value_col).alias("__s"), F.count(F.lit(1)).alias("__c"))
    )
    return stage1.groupBy(*keys).agg(
        F.sum("__s").alias(f"sum_{value_col}"),
        F.sum("__c").alias("n"),
    )


def replicated_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: DataFrame,
    replication: int = 8,
    fact_salt_from: str | None = None,
) -> DataFrame:
    """Inner join fact⋈dim on ``key`` where ``hot_keys`` (a 1-column
    DataFrame of skewed key values) would overwhelm single reducers.

    Hot dim rows are replicated ``replication``× with an explicit salt; hot
    fact rows get a deterministic salt in [0, replication); cold rows salt 0
    on both sides. One equi-join on (key, salt) — the hot key now spreads
    over ``replication`` reducers."""
    hk = F.broadcast(hot_keys.select(F.col(hot_keys.columns[0]).alias(key), F.lit(True).alias("__hot")))
    salts = F.explode(F.sequence(F.lit(0), F.lit(replication - 1)))

    d = dim.join(hk, key, "left")
    d_cold = d.filter(F.col("__hot").isNull()).withColumn("__salt", F.lit(0))
    d_hot = d.filter(F.col("__hot").isNotNull()).withColumn("__salt", salts)
    d_all = d_cold.unionByName(d_hot).drop("__hot")

    fact_salt_col: Column = F.pmod(
        F.xxhash64(F.col(fact_salt_from or fact.columns[0])), F.lit(replication)
    ).cast("int")
    f = fact.join(hk, key, "left").withColumn(
        "__salt", F.when(F.col("__hot").isNotNull(), fact_salt_col).otherwise(F.lit(0))
    ).drop("__hot")

    return f.join(d_all, [key, "__salt"]).drop("__salt")
