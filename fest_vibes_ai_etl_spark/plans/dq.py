"""Data-quality audit + built-in session-window queries.

``dq_violations_report`` re-expresses the reference's Postgres constraints
(`src/shared/db/database.py:151-199`: unique natural keys, FKs, non-null
columns) as lakehouse audit jobs over the driver tables, including checks
that deliberately FIND violations (a restricted parent set and duplicate
document fingerprints) so the report proves it detects, not just passes.

``events_session_window_builtin`` is the built-in ``session_window``
operator over events — same gap semantics as the lag→cumsum
``events_sessionization`` query, but executed by Spark's native session
aggregation (merging windows in the agg operator, streaming-ready).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_div
from ..functions.scalar import epoch_us

from ..operators import quality
from ..sources import table
from .catalog import register

SESSION_GAP_MIN = 30


@register(
    "dq_violations_report",
    oracle="""
    SELECT 'not_null' AS check, 'orders.o_custkey' AS target,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'not_null', 'documents.text',
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'unique', 'orders(o_orderkey)',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'unique', 'documents(fingerprint)',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
                 COUNT(*) AS n
          FROM documents GROUP BY 1)
    UNION ALL
    SELECT 'referential', 'lineitem.l_orderkey -> orders',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL AND l.l_orderkey IS NOT NULL
    UNION ALL
    SELECT 'referential', 'lineitem.l_suppkey -> supplier[s_suppkey % 7 <> 3]',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    LEFT JOIN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 <> 3) s
      ON l.l_suppkey = s.s_suppkey
    WHERE s.s_suppkey IS NULL AND l.l_suppkey IS NOT NULL
    UNION ALL
    SELECT 'expression', 'lineitem: discount in [0,1]',
           CAST(SUM(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 1)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    """,
    tags=("quality", "audit"),
    bench=True,
)
def dq_violations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over the warehouse: non-null, uniqueness (incl. a
    derived natural key — the document fingerprint), referential integrity
    (one passing FK, one against a deliberately restricted parent set that
    must find orphans — proving the check detects, not just passes), and a
    row-predicate check. Each check is one aggregate / one broadcast
    anti-join; the report is a union of 1-row results."""
    orders = table(spark, sf_dir, "orders")
    docs = table(spark, sf_dir, "documents")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")

    from ..functions.text import fingerprint

    docs_fp = docs.select(fingerprint(F.col("text")).alias("fp"))
    checks = [
        quality.check_not_null(orders, "orders", ["o_custkey"]),
        quality.check_not_null(docs, "documents", ["text"]),
        quality.check_unique(orders, "orders", ["o_orderkey"]),
        quality.check_unique(docs_fp, "documents", ["fp"]).withColumn(
            "target", F.lit("documents(fingerprint)")
        ),
        quality.check_referential(
            li, orders, "l_orderkey", "o_orderkey", "lineitem.l_orderkey -> orders"
        ),
        quality.check_referential(
            li,
            supp.filter(F.col("s_suppkey") % 7 != 3),
            "l_suppkey",
            "s_suppkey",
            "lineitem.l_suppkey -> supplier[s_suppkey % 7 <> 3]",
        ),
        quality.check_expression(
            li,
            "lineitem",
            "discount in [0,1]",
            (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1),
        ),
    ]
    return quality.dq_report(checks)


@register(
    "events_session_window_builtin",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS t,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t_prev
      FROM events
    ),
    marked AS (
      SELECT user_id, t,
             CASE WHEN t_prev IS NULL
                       OR t - t_prev > {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM seq
    ),
    sessions AS (
      SELECT user_id, t,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, MIN(t) AS session_start_us, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("window", "session", "builtin"),
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's NATIVE session_window aggregate
    (windows merge inside the agg operator — the same operator Structured
    Streaming uses with watermarks, so this plan is streaming-ready as-is).
    The oracle derives identical sessions with the classic lag→cumsum
    construction. Session identity is emitted as epoch-microsecond starts —
    exact integers on both engines."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            epoch_us(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


@register(
    "events_daily_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
    ),
    spine AS (
      SELECT t.day::DATE AS day FROM bounds,
             UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS t(day)
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT s.day, ty.event_type,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n,
           ROUND(AVG(COALESCE(d.n, 0)) OVER (
             PARTITION BY ty.event_type ORDER BY s.day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) + 0.00000001, 2)
             AS ma7
    FROM spine s CROSS JOIN types ty
    LEFT JOIN daily d ON d.day = s.day AND d.event_type = ty.event_type
    ORDER BY ty.event_type, s.day
    """,
    tags=("dq", "gapfill", "timeseries"),
    doc="Date-spine gap filling + 7-day moving average: the complete "
    "(day × event_type) grid is generated with sequence/explode (a few "
    "thousand rows even at decades of retention — the spine NEVER scales "
    "with the fact), daily counts left-join onto it, and missing days "
    "surface as explicit zeros so the moving average is computed over the "
    "true calendar, not just observed days. The window partitions by type "
    "over the tiny spine — no fact-sized window anywhere.",
)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_raw"))
    grid = spine.crossJoin(types)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    return (
        grid.join(daily, ["day", "event_type"], "left")
        .withColumn("n", F.coalesce(F.col("n_raw"), F.lit(0)).cast("long"))
        .withColumn("ma7", round_div(F.avg("n").over(w), 2))
        .select("day", "event_type", "n", "ma7")
        .orderBy("event_type", "day")
    )


_PROFILE_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_discount",
    "l_returnflag",
    "l_shipdate",
]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
      SELECT '{c}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
             CAST(MIN({c}) AS VARCHAR) AS min_val,
             CAST(MAX({c}) AS VARCHAR) AS max_val
      FROM lineitem""")
    union = "\n      UNION ALL\n".join(parts)
    return f"SELECT * FROM (\n{union}\n    ) ORDER BY column_name"


@register(
    "table_stats_profile",
    oracle=_profile_oracle(),
    tags=("dq", "stats", "analyze"),
    doc="ANALYZE-style column statistics (rows, nulls, exact NDV, min/max "
    "as strings) for the fact table — what a cost-based optimizer and a "
    "data-contract monitor both consume. ONE scan total: Spark plans the "
    "multi-distinct aggregate as its own expansion; the oracle spells the "
    "same stats as per-column scans. At corpus scale swap exact NDV for "
    "the HLL sketch (plans/sketches.py) — same output contract, constant "
    "memory.",
)
def table_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__n_null, {c}__ndv, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) "
                "AS (column_name, n, n_null, ndv, min_val, max_val)"
            )
        )
        .orderBy("column_name")
    )


K_ANON = 5


@register(
    "privacy_k_anonymity_audit",
    oracle=f"""
    WITH groups AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 2000.0) AS INT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(MAX(n) AS BIGINT) AS max_group_size
    FROM groups
    """,
    tags=("dq", "privacy", "k-anonymity"),
    doc="k-anonymity audit over the quasi-identifier tuple (nation, market "
    "segment, account-balance band): how many equivalence classes fall "
    "below k=5, and how many rows those classes re-identify. The "
    "release-gate a privacy review runs before sharing a derived table; "
    "one hash aggregate over the quasi-identifier key, then a bounded "
    "summary — same cost shape as any GROUP BY at 100 TB.",
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    groups = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000.0).cast("int").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("n") < K_ANON, 1).otherwise(0)).cast("long").alias(
            "n_violating_groups"
        ),
        F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(0)).cast("long").alias(
            "rows_at_risk"
        ),
        F.min("n").cast("long").alias("min_group_size"),
        F.max("n").cast("long").alias("max_group_size"),
    )


L_DIV = 3


@register(
    "privacy_l_diversity_audit",
    oracle=f"""
    WITH cells AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / 2000.0) AS INT) AS bal_band,
             c_mktsegment,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM customer GROUP BY 1, 2, 3
    ),
    groups AS (
      SELECT c_nationkey, bal_band,
             CAST(SUM(c) AS BIGINT)   AS n,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             ROUND(LN(SUM(c)) - SUM(c * LN(c)) / SUM(c) + 0.00000001, 6)
               AS entropy
      FROM cells GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n_distinct < {L_DIV} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(SUM(CASE WHEN n_distinct < {L_DIV} THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(n_distinct) AS BIGINT) AS min_distinct_sensitive,
           ROUND(MIN(entropy) + 0.00000001, 4) AS min_group_entropy
    FROM groups
    """,
    tags=("dq", "privacy", "l-diversity"),
    doc="l-diversity audit — the companion gate to privacy_k_anonymity_audit "
    "(k-anonymity alone cannot stop attribute disclosure when a small "
    "equivalence class is homogeneous in the sensitive value): per "
    "quasi-identifier group (nation, balance band), how many DISTINCT "
    "sensitive values (market segment) appear and the group's sensitive-"
    "value entropy ln(n) − Σc·ln(c)/n; groups below l=3 are violations "
    "and their rows are at attribute-disclosure risk. Two chained hash "
    "aggregates ((QI, sensitive) cells, then QI groups) — both partial-"
    "aggregable, bounded by the QI domain, the same 100-TB cost shape as "
    "any two-level GROUP BY.",
)
def privacy_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000.0).cast("int").alias("bal_band"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    groups = cells.groupBy("c_nationkey", "bal_band").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.round(
            F.log(F.sum("c"))
            - F.sum(F.col("c") * F.log("c")) / F.sum("c")
            + 1e-8,
            6,
        ).alias("entropy"),
    )
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("n_distinct") < L_DIV, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("n_distinct") < L_DIV, F.col("n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("n_distinct").cast("long").alias("min_distinct_sensitive"),
        round_div(F.min("entropy"), 4).alias("min_group_entropy"),
    )
