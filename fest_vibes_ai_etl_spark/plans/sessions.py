"""Sessionization + data profiling queries.

Sessionization uses the lag→flag→cumulative-sum construction (identical
semantics in any SQL engine, hence oracle-checkable); the streaming twin with
``applyInPandasWithState`` lives in streaming/sessions.py. Profiling is the
column-statistics pass a training-data pipeline runs before ingestion."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import epoch_us

from ..functions.rounding import round_div
from ..sources import table
from .catalog import register

GAP_MIN = 30


@register(
    "events_sessionization",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL {GAP_MIN} MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           CAST(session_no AS INT) AS session_no,
           COUNT(*) AS n_events,
           CAST(date_trunc('second', MIN(ts)) AS TIMESTAMP) AS session_start,
           CAST(date_trunc('second', MAX(ts)) AS TIMESTAMP) AS session_end
    FROM sessions
    GROUP BY user_id, session_no
    """,
    tags=("window", "session"),
    bench=True,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session flag →
    running sum → per-session agg. One shuffle on user_id, reused across all
    three window passes and the final groupBy (same partitioning)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    # unix_micros, not cast-to-long: the cast truncates to whole seconds and
    # mis-flags gaps that straddle the 30-min boundary at sub-second offsets
    gap_us = epoch_us(F.col("ts")) - epoch_us(prev)
    new_session = F.when(prev.isNull() | (gap_us > GAP_MIN * 60 * 1_000_000), 1).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_no", F.sum("new_session").over(wrun).cast("int"))
        .groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_trunc("second", F.min("ts")).alias("session_start"),
            F.date_trunc("second", F.max("ts")).alias("session_end"),
        )
    )


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_totalprice' AS col, COUNT(*) AS n,
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT)   AS n_distinct,
           CAST(ROUND(MIN(o_totalprice), 2) AS VARCHAR)   AS min_v,
           CAST(ROUND(MAX(o_totalprice), 2) AS VARCHAR)   AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*),
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    """,
    tags=("profile", "stats"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile pass (count/nulls/distinct/min/max per column) — the
    pre-ingestion data-quality sweep. One scan per... no: Spark computes all
    three profiles in one scan via a single multi-agg then explodes."""
    o = table(spark, sf_dir, "orders")

    def profile(col: str, fmt) -> list:
        return [
            F.count(F.lit(1)).alias(f"{col}__n"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__n_null"),
            F.countDistinct(col).alias(f"{col}__n_distinct"),
            fmt(F.min(col)).alias(f"{col}__min"),
            fmt(F.max(col)).alias(f"{col}__max"),
        ]

    price_fmt = lambda c: F.round(c, 2).cast("string")  # noqa: E731
    str_fmt = lambda c: c.cast("string")  # noqa: E731
    agg = o.agg(
        *profile("o_totalprice", price_fmt),
        *profile("o_orderstatus", str_fmt),
        *profile("o_custkey", str_fmt),
    )
    rows = [
        F.struct(
            F.lit(col).alias("col"),
            F.col(f"{col}__n").alias("n"),
            F.col(f"{col}__n_null").alias("n_null"),
            F.col(f"{col}__n_distinct").alias("n_distinct"),
            F.col(f"{col}__min").alias("min_v"),
            F.col(f"{col}__max").alias("max_v"),
        )
        for col in ["o_totalprice", "o_orderstatus", "o_custkey"]
    ]
    return agg.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


@register(
    "events_hourly_gapfill",
    oracle="""
    WITH rolled AS (
      SELECT date_trunc('hour', ts) AS hour,
             COUNT(*) AS n,
             ROUND(AVG(value) + 0.000001, 2) AS avg_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    bounds AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM rolled),
    spine AS (
      SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS TIMESTAMP) AS hour
      FROM bounds
    )
    SELECT s.hour,
           COALESCE(r.n, 0)  AS n,
           ROUND(COALESCE(r.avg_value,
                 LAST_VALUE(r.avg_value IGNORE NULLS)
                   OVER (ORDER BY s.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 2)
             AS avg_value_locf
    FROM spine s LEFT JOIN rolled r USING (hour)
    """,
    tags=("time", "gapfill", "window"),
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time_bucket_gapfill: a dense hourly spine between the
    observed bounds, zero-filled counts and last-observation-carried-forward
    averages for the missing buckets. The spine is sequence+explode from a
    1-row bounds aggregate — generated distributed (no driver loop) and
    linear in the covered range, not the row count. LOCF is
    last(ignorenulls) over an ordered frame; at scale the same plan runs
    partitioned per series key instead of one global ordering."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    rolled = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        round_div(F.avg("value"), 2).alias("avg_value"),
    )
    bounds = rolled.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(rolled, "hour", "left")
        .select(
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.round(
                F.coalesce(F.col("avg_value"), F.last("avg_value", ignorenulls=True).over(w)), 2
            ).alias("avg_value_locf"),
        )
    )


@register(
    "events_sliding_window_counts",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, MAX(ts) AS hi FROM events
      WHERE event_type = 'signup'
    ),
    spine AS (
      SELECT CAST(UNNEST(generate_series(lo - INTERVAL 30 MINUTE, hi, INTERVAL 30 MINUTE)) AS TIMESTAMP) AS w_start
      FROM bounds
    ),
    win AS (
      SELECT s.w_start, s.w_start + INTERVAL 1 HOUR AS w_end,
             COUNT(e.event_id) AS n,
             ROUND(SUM(e.value), 2) AS sum_value
      FROM spine s LEFT JOIN events e
        ON e.event_type = 'signup' AND e.ts >= s.w_start AND e.ts < s.w_start + INTERVAL 1 HOUR
      GROUP BY s.w_start
    )
    SELECT w_start, w_end, n, sum_value FROM win WHERE n > 0
    """,
    tags=("time", "window", "sliding"),
)
def events_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (1-hour windows every 30 minutes): each
    event lands in ⌈window/slide⌉ = 2 overlapping buckets via Spark's
    ``window()`` expansion — still one shuffle, map-side expanded. The same
    expression runs under a watermark as the streaming variant. The oracle
    reconstructs the overlap with a half-hour spine range-join."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n",
            "sum_value",
        )
    )
