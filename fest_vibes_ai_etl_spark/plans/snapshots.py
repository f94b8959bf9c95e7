"""Temporal/versioned relational patterns:

- ``scd2_point_in_time``: build a slowly-changing-dimension (type 2)
  version table from a change stream with a lead() window, then join facts
  to the version valid at fact time (the point-in-time / BETWEEN join).
  Generalizes the reference's upsert-then-read flow (J2/J4,
  `src/loader/service.py:324-422`) to full history instead of
  last-write-wins.
- ``snapshot_diff_summary``: audit diff of two snapshots of the same table
  (added / removed / changed / unchanged) via one full-outer join over
  map-side row hashes (operators/diff.py).

Both oracle-checked; snapshots are derived deterministically from the
events table so both engines see identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.diff import snapshot_diff
from ..sources import table
from .catalog import register


@register(
    "scd2_point_in_time",
    oracle="""
    WITH changes AS (
      SELECT user_id, ts, value,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM events WHERE event_type = 'click'
    ),
    facts AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id AS purchase_id, f.user_id,
           ROUND(c.value, 2) AS profile_value
    FROM facts f
    JOIN changes c
      ON f.user_id = c.user_id
     AND f.ts >= c.ts
     AND (c.valid_to IS NULL OR f.ts < c.valid_to)
    """,
    tags=("join", "scd2", "temporal"),
    bench=True,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time join: click events are profile updates; each
    user's updates become [valid_from, valid_to) versions via lead();
    purchases join to the version in force at purchase time. The version
    build is one window over the change stream (shuffle on user_id); the
    join reuses the same key, so with matching partitioning only the
    smaller fact side moves. Intervals are disjoint per user, so each fact
    matches at most one version — no row explosion."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", "value", "event_id")
        .withColumn("valid_to", F.lead("ts").over(w))
        .drop("event_id")
        .withColumnRenamed("ts", "valid_from")
        .withColumnRenamed("user_id", "c_user")
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return facts.join(
        changes,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    ).select("purchase_id", "user_id", F.round("value", 2).alias("profile_value"))


@register(
    "snapshot_diff_summary",
    oracle="""
    WITH old AS (
      SELECT event_id, value FROM events WHERE event_id % 11 <> 4
    ),
    new AS (
      SELECT event_id,
             CASE WHEN event_id % 5 = 0 THEN value + 10 ELSE value END AS value
      FROM events WHERE event_id % 10 <> 3
    )
    SELECT CASE WHEN o.event_id IS NULL THEN 'added'
                WHEN n.event_id IS NULL THEN 'removed'
                WHEN o.value = n.value THEN 'unchanged'
                ELSE 'changed' END AS status,
           COUNT(*) AS n
    FROM old o FULL OUTER JOIN new n USING (event_id)
    GROUP BY 1
    """,
    tags=("diff", "audit"),
    bench=True,
)
def snapshot_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation audit: yesterday/today snapshots derived
    deterministically from events (drops + value updates), diffed with one
    full-outer join over 8-byte map-side row hashes, rolled up to status
    counts. At 100 TB the shuffle carries (key, hash) only — row width
    never touches the wire."""
    ev = table(spark, sf_dir, "events")
    old = ev.filter(F.col("event_id") % 11 != 4).select("event_id", "value")
    new = (
        ev.filter(F.col("event_id") % 10 != 3)
        .select(
            "event_id",
            F.when(F.col("event_id") % 5 == 0, F.col("value") + 10)
            .otherwise(F.col("value"))
            .alias("value"),
        )
    )
    return (
        snapshot_diff(old, new, ["event_id"], ["value"])
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
