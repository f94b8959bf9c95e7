"""Cogrouped as-of query: errors matched to the user's latest prior signup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cogroup import cogrouped_asof_match
from ..sources import table
from .catalog import register


@register(
    "cogroup_error_after_signup",
    oracle="""
    WITH errors AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ),
    signups AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
    )
    SELECT e.event_id,
           e.user_id,
           CAST(date_trunc('second', e.ts) AS TIMESTAMP) AS err_ts,
           s.event_id AS matched_id,
           CAST(epoch(date_trunc('second', e.ts)) - epoch(date_trunc('second', s.ts)) AS BIGINT) AS gap_s
    FROM errors e ASOF LEFT JOIN signups s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
    tags=("join", "asof", "cogroup", "pandas"),
)
def cogroup_error_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of via cogrouped applyInPandas: each error event gets the
    user's most recent signup at-or-before it (pandas merge_asof per user
    group), plus the gap in whole seconds. Same semantics as the
    union-tag-carry asof operator — this entry exercises the cogroup API
    path; DuckDB's native ASOF LEFT JOIN is the oracle."""
    # Two independent reads on purpose: when both cogroup sides share one
    # parent plan, attribute deduplication silently prunes the right side's
    # columns down to the grouping key (see operators/cogroup.py docstring).
    errors = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
    )
    signups = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("event_id", "user_id", "ts")
    )
    matched = cogrouped_asof_match(errors, signups, key="user_id")
    return matched.select(
        "event_id",
        "user_id",
        F.date_trunc("second", "ts").alias("err_ts"),
        "matched_id",
        (
            F.unix_timestamp(F.date_trunc("second", "ts"))
            - F.unix_timestamp(F.date_trunc("second", "matched_ts"))
        ).alias("gap_s"),
    )
