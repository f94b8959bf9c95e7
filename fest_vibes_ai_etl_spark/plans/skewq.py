"""Skew-machinery queries — the salted plans declared as oracle-checked
catalog entries. Salting changes the PHYSICAL distribution only; results are
bit-identical to the plain plans, so both get the plain-SQL oracle: the gate
proves the rewrite is semantics-preserving, which is the property that makes
it safe to deploy against a 100 TB skewed key distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import skew
from ..sources import table
from .catalog import register


@register(
    "skew_salted_user_rollup",
    oracle="""
    SELECT user_id,
           ROUND(SUM(value), 2) AS sum_value,
           COUNT(*) AS n
    FROM events GROUP BY user_id
    """,
    tags=("skew", "agg", "salted"),
)
def skew_salted_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over events.user_id: stage 1 aggregates
    on (user_id, salt) so a hot user spreads across 16 reducers, stage 2
    combines the partials. Same result as the plain groupBy — the oracle
    proves it — with the single-reducer bottleneck removed."""
    ev = table(spark, sf_dir, "events")
    out = skew.salted_sum_count(ev, ["user_id"], "value", salt_mod=16, salt_from="event_id")
    return out.select(
        "user_id", F.round("sum_value", 2).alias("sum_value"), F.col("n")
    )


@register(
    "skew_replicated_hot_join",
    oracle="""
    WITH hot AS (
      SELECT c_nationkey FROM customer GROUP BY c_nationkey
      ORDER BY COUNT(*) DESC LIMIT 2
    )
    SELECT n_name AS nation, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("skew", "join", "replicated"),
)
def skew_replicated_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key replicated join: the two most frequent nation keys are
    replicated 8x on the dim side with matching deterministic fact salts,
    then one equi-join on (key, salt). Result ≡ the plain join (the oracle
    is the plain SQL); the hot keys now occupy 8 reducers each instead of
    one. At 100 TB `hot_keys` comes from a count profile of the fact side
    (profile_orders_columns pattern), not a hardcoded list."""
    cust = table(spark, sf_dir, "customer").withColumnRenamed("c_nationkey", "nkey")
    nation = table(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "nkey")
    hot = (
        cust.groupBy("nkey").count()
        .orderBy(F.desc("count"), "nkey")
        .limit(2)
        .select("nkey")
    )
    joined = skew.replicated_join(
        cust, nation, key="nkey", hot_keys=hot, replication=8, fact_salt_from="c_custkey"
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )
