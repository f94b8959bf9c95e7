"""Behavioral / time-series analytics over the events stream — the product
analytics a cache-backed events service (SURVEY §3.4's read path) feeds:
time-weighted value averages, new-vs-cumulative user growth, and weekly
cohort retention. All oracle-checked; durations are computed on epoch
microseconds (``unix_micros`` ↔ ``epoch_us``), which both engines derive
from the nanosecond parquet timestamps by identical truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import epoch_us

from ..functions.rounding import round_div
from ..sources import table
from .catalog import register


@register(
    "events_time_weighted_value",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS t,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t_next
      FROM events
    ),
    seg AS (
      SELECT user_id, value, (t_next - t) AS dt
      FROM seq WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           COUNT(*) AS n_segments,
           ROUND(SUM(value * dt) / SUM(dt) + 0.00000001, 4) AS tw_avg_value
    FROM seg GROUP BY user_id
    """,
    tags=("timeseries", "window"),
)
def events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value: each event's value is weighted
    by how long it was the user's latest state (duration to next event;
    open-ended final segments are excluded). The standard irregular-series
    aggregate that a plain AVG gets wrong. One user-keyed window + one
    aggregation on the same key — the second shuffle collapses under AQE
    since partitioning is already aligned."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = ev.select(
        "user_id", "value", "event_id", epoch_us("ts").alias("t")
    ).withColumn("t_next", F.lead("t").over(w))
    seg = seq.filter(F.col("t_next").isNotNull()).select(
        "user_id", "value", (F.col("t_next") - F.col("t")).alias("dt")
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        round_div(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 4).alias(
            "tw_avg_value"
        ),
    )


@register(
    "events_cumulative_new_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
    ),
    daily_new AS (
      SELECT first_day AS day, COUNT(*) AS new_users FROM first_seen GROUP BY first_day
    ),
    active AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS active_users
      FROM events GROUP BY 1
    )
    SELECT a.day, a.active_users,
           COALESCE(n.new_users, 0) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0)) OVER (
             ORDER BY a.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cumulative_users
    FROM active a LEFT JOIN daily_new n ON a.day = n.day
    """,
    tags=("timeseries", "growth"),
)
def events_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active / new / cumulative-distinct users. The scalable form of
    "running distinct count": distinct-per-day is NOT summable, so the
    cumulative series is derived from each user's first-seen day (one agg)
    and a running sum over the tiny per-day series — never a growing
    collect_set state. The final window runs over #days rows, not events."""
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    daily_new = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    active = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("active_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(daily_new, "day", "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)))
        .withColumn("cumulative_users", F.sum("new_users").over(w).cast("long"))
        .select("day", "active_users", "new_users", "cumulative_users")
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    )
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.week) / 7 AS INT) AS week_offset,
           COUNT(*) AS retained_users
    FROM cohorts c JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("timeseries", "cohort"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-active week,
    counted in each later week they return. Two aggregations plus one join
    on user_id; the triangle itself is #weeks² rows — nothing at scale.
    (activity is DISTINCT per user-week first, so the join fans out to at
    most one row per user per active week.)"""
    ev = table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.select("user_id", F.date_trunc("week", "ts").cast("date").alias("week"))
        .distinct()
    )
    return (
        cohorts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("retained_users"))
    )


@register(
    "events_rfm_segments",
    bench=True,
    oracle="""
    WITH rfm AS (
      SELECT user_id,
             MAX(ts) AS last_ts,
             COUNT(*) AS freq,
             SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS monetary
      FROM events GROUP BY user_id
    ),
    th AS (
      SELECT quantile_cont(freq, 0.5) AS f_med,
             quantile_cont(monetary, 0.5) AS m_med,
             quantile_cont(epoch_us(last_ts), 0.5) AS r_med
      FROM rfm
    )
    SELECT CASE WHEN epoch_us(last_ts) >= r_med THEN 'recent' ELSE 'stale' END
             AS recency,
           CASE WHEN freq >= f_med THEN 'high' ELSE 'low' END AS frequency,
           CASE WHEN monetary >= m_med THEN 'high' ELSE 'low' END AS monetary,
           COUNT(*) AS n_users,
           ROUND(AVG(freq) + 0.00000001, 2) AS avg_events
    FROM rfm, th
    GROUP BY 1, 2, 3
    ORDER BY recency, frequency, monetary
    """,
    tags=("behavior", "segmentation", "rfm"),
    doc="RFM (recency/frequency/monetary) user segmentation via BROADCAST "
    "MEDIAN THRESHOLDS: one per-user aggregate, one 1-row exact-percentile "
    "aggregate broadcast back, one bucketing pass — no global ntile window "
    "(which would single-reducer the user table to assign ranks). Spark's "
    "exact `percentile` and DuckDB's quantile_cont interpolate identically, "
    "so the segment boundaries — and therefore the hash — agree.",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    rfm = ev.groupBy("user_id").agg(
        F.max(epoch_us("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("monetary"),
    )
    th = rfm.agg(
        F.percentile("freq", F.lit(0.5)).alias("f_med"),
        F.percentile("monetary", F.lit(0.5)).alias("m_med"),
        F.percentile("last_us", F.lit(0.5)).alias("r_med"),
    )
    from pyspark.sql.functions import broadcast

    return (
        rfm.crossJoin(broadcast(th))
        .select(
            F.when(F.col("last_us") >= F.col("r_med"), "recent")
            .otherwise("stale")
            .alias("recency"),
            F.when(F.col("freq") >= F.col("f_med"), "high").otherwise("low").alias("frequency"),
            F.when(F.col("monetary") >= F.col("m_med"), "high").otherwise("low").alias("monetary"),
            "freq",
        )
        .groupBy("recency", "frequency", "monetary")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            round_div(F.avg("freq"), 2).alias("avg_events"),
        )
        .orderBy("recency", "frequency", "monetary")
    )
