"""Funnel + trend analytics over the event stream.

- ``events_funnel_ordered``: the classic ordered conversion funnel
  (signup → first click after signup → first purchase after that click),
  counted per stage. Ordering matters — a purchase before the click does
  not convert — which is what separates this from three independent
  filters.
- ``events_trend_per_user``: per-user least-squares trend of value over
  time via the built-in regression aggregates (regr_slope/regr_intercept/
  corr) — one partial-aggregable pass, no window, no UDF; DuckDB's
  identical aggregates are the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import epoch_us

from ..functions.rounding import round_div
from ..sources import table
from .catalog import register

EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros


@register(
    "events_funnel_ordered",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS s_t
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_t
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.s_t
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_t
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_t
      GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s
      UNION ALL
      SELECT '2_click_after_signup', COUNT(*) FROM c
      UNION ALL
      SELECT '3_purchase_after_click', COUNT(*) FROM p
    )
    """,
    tags=("funnel", "analytics"),
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage conversion funnel. Each stage is one filtered
    aggregate joined to the previous stage's per-user frontier timestamp —
    user-keyed shuffles all the way down, and every stage shrinks the
    frontier, so the expensive side is always the first scan (which AQE
    reuses partitioning for)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_us("ts").alias("t")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("t").alias("s_t"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("t") > F.col("s_t"))
        .groupBy("user_id")
        .agg(F.min("t").alias("c_t"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("t") > F.col("c_t"))
        .groupBy("user_id")
        .agg(F.min("t").alias("p_t"))
    )
    rows = [
        s.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("1_signup").alias("stage"), "n_users"
        ),
        c.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("2_click_after_signup").alias("stage"), "n_users"
        ),
        p.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("3_purchase_after_click").alias("stage"), "n_users"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@register(
    "events_trend_per_user",
    oracle=f"""
    WITH xy AS (
      SELECT user_id,
             (epoch_us(ts) - {EPOCH_2024_US}) / 86400000000.0 AS x,
             value AS y
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n,
           ROUND(regr_slope(y, x) + 0.00000001, 4)     AS slope_per_day,
           ROUND(regr_intercept(y, x) + 0.00000001, 4) AS intercept,
           ROUND(corr(y, x) + 0.00000001, 4)           AS corr_vt
    FROM xy GROUP BY user_id
    """,
    tags=("regression", "analytics"),
)
def events_trend_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value-over-time trend: built-in least-squares aggregates
    over (days since 2024-01-01, value). Fully partial-aggregable — the
    shuffle carries the moment sums, not rows — which is the 100 TB shape
    for per-entity model fitting when a closed form exists."""
    ev = table(spark, sf_dir, "events")
    xy = ev.select(
        "user_id",
        ((epoch_us("ts") - F.lit(EPOCH_2024_US)) / F.lit(86400000000.0)).alias("x"),
        F.col("value").alias("y"),
    )
    return xy.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        round_div(F.regr_slope("y", "x"), 4).alias("slope_per_day"),
        round_div(F.regr_intercept("y", "x"), 4).alias("intercept"),
        round_div(F.corr("y", "x"), 4).alias("corr_vt"),
    )


@register(
    "events_attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT COALESCE(touch, 'direct') AS channel,
           COUNT(*) AS n_purchases,
           ROUND(SUM(value) + 0.00000001, 2) AS revenue
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY channel
    """,
    tags=("funnel", "attribution", "window"),
    bench=True,
    doc="Last-touch attribution: each purchase is credited to the user's "
    "most recent preceding non-purchase event type (ignore-nulls "
    "last_value over the user's event-time order; purchases with no "
    "prior touch credit 'direct'), then revenue rolls up per channel. "
    "One window shuffle on user_id + one aggregation — the standard "
    "marketing-attribution pattern, event-time ordered so replays and "
    "backfills credit identically.",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    seq = ev.withColumn("touch", touch)
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            round_div(F.sum("value"), 2).alias("revenue"),
        )
        .orderBy("channel")
    )


@register(
    "events_time_to_convert",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT user_id, MIN(ts) AS first_purchase_ts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id,
             (epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts)) / 3600e6
               AS hours
      FROM s JOIN p ON s.user_id = p.user_id
      WHERE p.first_purchase_ts >= s.signup_ts
    )
    SELECT COUNT(*) AS n_converted,
           ROUND(quantile_cont(hours, 0.5) + 0.00000001, 3) AS p50_hours,
           ROUND(quantile_cont(hours, 0.9) + 0.00000001, 3) AS p90_hours,
           ROUND(MAX(hours) + 0.00000001, 3) AS max_hours
    FROM conv
    """,
    tags=("funnel", "conversion", "latency"),
    doc="Time-to-convert: hours from first signup to first purchase per "
    "user, summarized as population percentiles — two per-user MIN "
    "aggregates joined on the user key (both shuffles carry one row per "
    "user), then a percentile over the converted set. The standard "
    "activation-latency metric next to the ordered funnel.",
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    conv = (
        s.join(p, "user_id")
        .filter(F.col("first_purchase_ts") >= F.col("signup_ts"))
        .select(
            ((epoch_us("first_purchase_ts") - epoch_us("signup_ts")) / 3600e6).alias(
                "hours"
            )
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        round_div(F.percentile("hours", F.lit(0.5)), 3).alias("p50_hours"),
        round_div(F.percentile("hours", F.lit(0.9)), 3).alias("p90_hours"),
        round_div(F.max("hours"), 3).alias("max_hours"),
    )


@register(
    "events_cohort_ltv",
    bench=True,
    oracle="""
    WITH cohorts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT e.user_id, c.cohort_week,
             CAST(datediff('day', c.cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT)
               AS week_offset,
             e.value
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
    ),
    wk AS (
      SELECT cohort_week, week_offset, SUM(value) AS wk_rev
      FROM rev GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset,
           ROUND(SUM(wk_rev) OVER (
             PARTITION BY cohort_week ORDER BY week_offset
             ROWS UNBOUNDED PRECEDING) + 0.00000001, 2) AS cum_revenue
    FROM wk ORDER BY cohort_week, week_offset
    """,
    tags=("behavior", "cohort", "ltv"),
    doc="Cohort lifetime value: cumulative purchase revenue per signup-week "
    "cohort by week offset. The fact joins the one-row-per-user cohort "
    "table, aggregates to the (cohort × offset) grid — a few hundred rows "
    "at ANY corpus size — and the cumulative window runs over that tiny "
    "grid, never the fact.",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", "ts").cast("date"), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            "value",
        )
    )
    wk = rev.groupBy("cohort_week", "week_offset").agg(F.sum("value").alias("wk_rev"))
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        wk.withColumn("cum_revenue", round_div(F.sum("wk_rev").over(w), 2))
        .select("cohort_week", "week_offset", "cum_revenue")
        .orderBy("cohort_week", "week_offset")
    )
