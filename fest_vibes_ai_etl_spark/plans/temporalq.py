"""Fixed-offset timezone shifting + null-safe equality joins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_div
from ..sources import table
from .catalog import register


@register(
    "events_timezone_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts + INTERVAL 5 HOURS + INTERVAL 30 MINUTES) AS DATE) AS local_day,
           CAST(EXTRACT(hour FROM ts + INTERVAL 5 HOURS + INTERVAL 30 MINUTES) AS INT) AS local_hour,
           COUNT(*) AS n,
           ROUND(AVG(value) + 0.00000001, 4) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("temporal", "timezone", "interval"),
)
def events_timezone_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift the event stream into a fixed-offset local zone (+05:30) with
    interval arithmetic, then roll up by local day/hour. Fixed offsets keep
    the conversion a pure column expression on both engines (no DST tables
    to disagree about); the map-side shift composes with any downstream
    window or rollup."""
    ev = table(spark, sf_dir, "events")
    local = F.col("ts") + F.expr("INTERVAL 5 HOURS 30 MINUTES")
    return (
        ev.select(
            F.date_trunc("day", local).cast("date").alias("local_day"),
            F.hour(local).alias("local_hour"),
            "value",
        )
        .groupBy("local_day", "local_hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_div(F.avg("value"), 4).alias("avg_value"),
        )
    )


@register(
    "join_null_safe",
    oracle="""
    SELECT c.k, COUNT(*) AS n_pairs
    FROM (SELECT NULLIF(c_nationkey % 7, 3) AS k FROM customer) c
    JOIN (SELECT NULLIF(s_nationkey % 7, 3) AS k FROM supplier) s
      ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY c.k
    """,
    tags=("join", "null-safe"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of vanishing, still hash-joinable (null-safe equality
    is a valid equi-join key — no fallback to nested-loop). The NULLIF
    injects a null stripe into both sides to prove the NULL×NULL block
    survives."""
    cust = table(spark, sf_dir, "customer").select(
        F.nullif(F.pmod("c_nationkey", F.lit(7)), F.lit(3)).alias("k")
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.nullif(F.pmod("s_nationkey", F.lit(7)), F.lit(3)).alias("ks")
    )
    return (
        cust.join(supp, cust["k"].eqNullSafe(supp["ks"]))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
