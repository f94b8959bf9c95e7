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


@register(
    "events_max_concurrency",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTES AS e FROM events
    ),
    pts AS (
      SELECT s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT e AS t, -1 AS delta FROM iv
    ),
    sweep AS (
      SELECT t, SUM(delta) OVER (ORDER BY t, delta ROWS UNBOUNDED PRECEDING)
               AS live
      FROM pts
    ),
    daily AS (
      SELECT CAST(t AS DATE) AS day, MAX(live) AS max_concurrent FROM sweep
      GROUP BY 1
    )
    SELECT day, CAST(max_concurrent AS BIGINT) AS max_concurrent
    FROM daily ORDER BY day
    """,
    tags=("temporal", "sweepline", "interval"),
    bench=True,
    doc="Peak concurrency of 30-minute activity intervals per day via a "
    "SWEEP LINE: +1/-1 boundary events, a running sum ordered by time "
    "(ends before starts on ties — an interval closing exactly when "
    "another opens does not overlap it), max per day. O(n log n) and one "
    "range-partitioned global sort vs the O(n²) interval self-join a "
    "naive overlap count would do — at 100 TB the sweep is the only "
    "shape that survives. The running sum is DISTRIBUTED: a naive "
    "global-window cumsum would drag every boundary row to one reducer, "
    "so this uses the two-phase prefix-sum (range-partitioned sort, "
    "per-partition local cumsum, broadcast per-partition offsets) — the "
    "same shape as trainprep.global_positions.",
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select("ts")
    starts = ev.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = (
        starts.unionByName(ends)
        .repartitionByRange(F.col("t"), F.col("delta"))
        .sortWithinPartitions("t", "delta")
        .withColumn("_pid", F.spark_partition_id())
    )
    local = F.sum("delta").over(
        Window.partitionBy("_pid").orderBy("t", "delta").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    with_local = pts.withColumn("_local", local)
    offsets = (
        with_local.groupBy("_pid")
        .agg(F.sum("delta").alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    sweep = with_local.join(F.broadcast(offsets), "_pid").withColumn(
        "live", F.col("_local") + F.col("_offset")
    )
    return (
        sweep.groupBy(F.col("t").cast("date").alias("day"))
        .agg(F.max("live").cast("long").alias("max_concurrent"))
        .orderBy("day")
    )
