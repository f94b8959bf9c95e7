"""Statistical & ordered-aggregate suite: LISTAGG, MIN_BY/MAX_BY, sample
moments, exact interpolated quantiles.

The reference's ORM layer leans on Postgres aggregate conveniences
(string_agg of artist genres in the cache read path, min/max over scrape
timestamps for first-wins — /root/reference/src/shared/db/queries.py); this
module re-expresses that family as oracle-checked Spark aggregates and adds
the standard statistical-profile set a warehouse user expects.

All are single-shuffle hash aggregates with map-side partial combine — at
100 TB the only cost is one exchange on the (low-cardinality) group key, so
every query here scales linearly with input and never skews (group counts
are bounded by priority/status domains).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_div
from ..functions.scalar import epoch_us
from ..sources import table
from .catalog import register


@register(
    "agg_listagg_nations",
    oracle="""
    SELECT r_name,
           COUNT(*) AS n_nations,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("agg", "listagg", "sql"),
)
def agg_listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG ... WITHIN GROUP) — the ANSI form
    of Postgres string_agg the reference uses for genre lists. Deterministic
    because the WITHIN GROUP ordering is total (names unique per region)."""
    table(spark, sf_dir, "region").createOrReplaceTempView("la_region")
    table(spark, sf_dir, "nation").createOrReplaceTempView("la_nation")
    return spark.sql("""
        SELECT r_name,
               COUNT(*) AS n_nations,
               LISTAGG(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        FROM la_region JOIN la_nation ON n_regionkey = r_regionkey
        GROUP BY r_name
    """)


@register(
    "agg_argminmax_orders",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC,  o_orderkey ASC)  AS rk_lo,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rk_hi
      FROM orders
    )
    SELECT o_orderpriority,
           MIN(CASE WHEN rk_lo = 1 THEN o_orderkey END) AS cheapest_order,
           MIN(CASE WHEN rk_hi = 1 THEN o_orderkey END) AS priciest_order,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM ranked
    GROUP BY o_orderpriority
    """,
    tags=("agg", "argmin"),
)
def agg_argminmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN_BY / MAX_BY with a struct ordering key for a deterministic
    tie-break (price, then key) — the argmin answered with one aggregate
    instead of the oracle's two window passes. At scale this is the shape to
    prefer: one partial-aggregable pass, no per-group sort."""
    orders = table(spark, sf_dir, "orders")
    tie = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return orders.groupBy("o_orderpriority").agg(
        F.min_by("o_orderkey", tie).alias("cheapest_order"),
        F.max_by("o_orderkey", tie).alias("priciest_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "stats_moments_lineitem",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n,
           ROUND(VAR_SAMP(l_quantity) + 0.00000001, 4) AS qty_var,
           ROUND(STDDEV_SAMP(l_discount) + 0.00000001, 4) AS disc_sd,
           ROUND(CORR(l_quantity, l_extendedprice) + 0.00000001, 4) AS qty_price_corr
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg", "stats"),
)
def stats_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-moment profile (variance / stddev / correlation) per line
    status. Single-pass co-moment aggregates in both engines; outputs are
    epsilon-rounded because the merge order of partial moments differs."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        round_div(F.var_samp("l_quantity"), 4).alias("qty_var"),
        round_div(F.stddev_samp("l_discount"), 4).alias("disc_sd"),
        round_div(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
    )


@register(
    "agg_median_quantiles",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           ROUND(MEDIAN(o_totalprice) + 0.00000001, 4) AS med_price,
           ROUND(QUANTILE_CONT(o_totalprice, 0.25) + 0.00000001, 4) AS p25,
           ROUND(QUANTILE_CONT(o_totalprice, 0.75) + 0.00000001, 4) AS p75
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "quantiles"),
)
def agg_median_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median / quartiles per priority (percentile_cont
    semantics in both engines). Exact percentile is a per-group sort — fine
    on bounded group counts; unbounded-cardinality profiles should use the
    approx_percentile sketch instead (see sketch_quantiles_by_type)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        round_div(F.median("o_totalprice"), 4).alias("med_price"),
        round_div(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        round_div(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
    )


@register(
    "histogram_value_buckets",
    oracle="""
    SELECT CASE WHEN value < 0.0 THEN 0
                WHEN value >= 100.0 THEN 21
                ELSE CAST(FLOOR(value / 5.0) + 1 AS INT) END AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(value) + 0.00000001, 4) AS lo,
           ROUND(MAX(value) + 0.00000001, 4) AS hi
    FROM events
    GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via WIDTH_BUCKET (20 buckets over [0,100) plus
    the under/overflow buckets 0 and 21) — the single-pass distribution
    profile; pairs with sketch_quantiles_by_type for the adaptive-bin
    version. DuckDB has no width_bucket, so the oracle spells out the same
    floor arithmetic."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(20)).cast("int").alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_div(F.min("value"), 4).alias("lo"),
            round_div(F.max("value"), 4).alias("hi"),
        )
    )


@register(
    "agg_geomean_pandas_udaf",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(EXP(AVG(LN(o_totalprice))) + 0.000001, 2) AS geo_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "udaf", "pandas"),
)
def agg_geomean_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF surface: per-group geometric mean as a GROUPED_AGG
    pandas UDF (the reference has no custom aggregates — SURVEY §2.9 — so
    this is the engine's demonstration of the API). The UDF receives each
    group's column as one Arrow-backed Series; Spark still parallelizes
    across groups, so the cost model is the same as any keyed aggregate —
    one shuffle on the group key — with the caveat that there is NO
    map-side partial aggregation for pandas UDAFs: at 100 TB prefer the
    algebraic rewrite exp(avg(ln x)) (the oracle's form, one codegen'd
    hash agg) and reserve the UDAF for genuinely non-algebraic logic.
    The closure is defined in-function so cloudpickle ships it by value
    (executors don't import this package). Type-hint style (Series ->
    scalar == GROUPED_AGG) — the string-constant PandasUDFType API is
    deprecated and warns since Spark 3."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo(s: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(s.to_numpy(dtype="float64")).mean()))

    # Spark disallows mixing pandas and JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a pandas
    # aggregate too.
    @pandas_udf("long")
    def cnt(s: pd.Series) -> int:
        return len(s)
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        cnt("o_orderkey").alias("n_orders"),
        F.round(geo("o_totalprice") + F.lit(0.000001), 2).alias("geo_price"),
    )


@register(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med,
             ABS(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN 0.6745 * ABS(d.value - d.med) / NULLIF(m.mad, 0)
                              > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(MAX(0.6745 * ABS(d.value - d.med) / NULLIF(m.mad, 0))
                 + 0.00000001, 4) AS max_robust_z
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    tags=("stats", "outliers", "robust"),
    doc="Robust outlier detection via the Median Absolute Deviation: "
    "robust-z = 0.6745·|v − median| / MAD, flagged above 3.5 (the Iglewicz-"
    "Hoaglin rule). Unlike the stddev z-score (events_value_outliers), the "
    "breakdown point is 50% — a few extreme values cannot mask themselves "
    "by inflating the scale estimate. Two per-group percentile aggregates "
    "broadcast back through joins; both engines interpolate the median "
    "identically so the flags and the max score hash-match.",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = ev.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    rz = 0.6745 * F.col("adev") / F.nullif(F.col("mad"), F.lit(0))
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(rz > 3.5, 1).otherwise(0)).cast("long").alias("n_outliers"),
            round_div(F.max(rz), 4).alias("max_robust_z"),
        )
        .orderBy("event_type")
    )


@register(
    "events_equidepth_histogram",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.50) AS q2,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(CASE WHEN e.value > b.q3 THEN 3
                     WHEN e.value > b.q2 THEN 2
                     WHEN e.value > b.q1 THEN 1
                     ELSE 0 END AS INT) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(e.value), 2) AS lo,
           ROUND(MAX(e.value), 2) AS hi
    FROM events e JOIN b ON e.event_type = b.event_type
    GROUP BY 1, 2 ORDER BY e.event_type, bucket
    """,
    tags=("stats", "histogram", "equidepth"),
    doc="Equi-depth (quartile) histogram per event type: exact interpolated "
    "boundaries from one per-group percentile aggregate broadcast back, "
    "then a single bucketing pass — the optimizer-statistics shape "
    "(equi-depth beats equi-width under skew because every bucket carries "
    "the same row weight). Boundary doubles interpolate identically in "
    "both engines, so bucket assignment — and the hash — agree exactly.",
)
def events_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    ev = table(spark, sf_dir, "events").select("event_type", "value")
    b = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.5)).alias("q2"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    bucket = (
        F.when(F.col("value") > F.col("q3"), 3)
        .when(F.col("value") > F.col("q2"), 2)
        .when(F.col("value") > F.col("q1"), 1)
        .otherwise(0)
        .cast("int")
    )
    return (
        ev.join(broadcast(b), "event_type")
        .withColumn("bucket", bucket)
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "events_user_gap_stats",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    per_user AS (
      SELECT user_id, quantile_cont(gap_us, 0.5) AS med_gap_us
      FROM seq WHERE gap_us IS NOT NULL GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           ROUND(quantile_cont(med_gap_us, 0.5) / 3600e6 + 0.00000001, 3)
             AS p50_median_gap_h,
           ROUND(quantile_cont(med_gap_us, 0.9) / 3600e6 + 0.00000001, 3)
             AS p90_median_gap_h
    FROM per_user
    """,
    tags=("behavior", "gaps", "two-level-agg"),
    doc="Inter-event cadence: per-user median gap between consecutive "
    "events (lag window keyed on user), then the population p50/p90 of "
    "those medians — the two-level aggregation that answers 'how often do "
    "typical vs heavy users act'. The second level runs over one row per "
    "user, so only the first window touches fact-sized data.",
)
def events_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn(
        "gap_us", epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
    ).filter(F.col("gap_us").isNotNull())
    per_user = seq.groupBy("user_id").agg(
        F.percentile("gap_us", F.lit(0.5)).alias("med_gap_us")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        round_div(F.percentile("med_gap_us", F.lit(0.5)) / 3600e6, 3).alias(
            "p50_median_gap_h"
        ),
        round_div(F.percentile("med_gap_us", F.lit(0.9)) / 3600e6, 3).alias(
            "p90_median_gap_h"
        ),
    )


@register(
    "supplier_revenue_hhi",
    oracle="""
    WITH rev AS (
      SELECT s_nationkey AS nationkey, l_suppkey,
             SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT nationkey, SUM(r) AS t FROM rev GROUP BY nationkey)
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM((r / t) * (r / t)) + 0.00000001, 4) AS hhi
    FROM rev JOIN tot USING (nationkey) JOIN nation ON nationkey = n_nationkey
    GROUP BY n_name ORDER BY nation
    """,
    tags=("stats", "concentration", "hhi"),
    doc="Supplier revenue concentration per nation via the Herfindahl-"
    "Hirschman index (sum of squared market shares; 1/n = perfectly even, "
    "1.0 = monopoly). Aggregation-of-aggregation: per-supplier revenue, "
    "per-nation totals joined back on the (tiny) nation key, one squared-"
    "share sum — the supplier-grain intermediate is the only fact-derived "
    "shuffle.",
)
def supplier_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), "l_suppkey")
        .agg(F.sum("v").alias("r"))
    )
    tot = rev.groupBy("nationkey").agg(F.sum("r").alias("t"))
    share2 = (F.col("r") / F.col("t")) * (F.col("r") / F.col("t"))
    return (
        rev.join(tot, "nationkey")
        .join(broadcast(nation), F.col("nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            round_div(F.sum(share2), 4).alias("hhi"),
        )
        .orderBy("nation")
    )


@register(
    "parts_pareto_8020",
    oracle="""
    WITH rev AS (
      SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT r, SUM(r) OVER (ORDER BY r DESC, l_partkey ROWS UNBOUNDED PRECEDING)
               AS cum_r,
             SUM(r) OVER () AS tot,
             COUNT(*) OVER () AS n_parts
      FROM rev
    )
    SELECT CAST(MIN(n_parts) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN cum_r - r < 0.8 * tot THEN 1 ELSE 0 END) AS BIGINT)
             AS parts_for_80pct,
           ROUND(CAST(SUM(CASE WHEN cum_r - r < 0.8 * tot THEN 1 ELSE 0 END)
                      AS DOUBLE) / MIN(n_parts) + 0.00000001, 4)
             AS pareto_fraction
    FROM ranked
    """,
    tags=("stats", "pareto", "abc"),
    doc="Pareto/ABC analysis: how many parts carry 80% of revenue. The "
    "cumulative share runs over the PER-PART aggregate (not the fact) with "
    "the two-phase distributed prefix sum — range-partitioned sort on "
    "revenue, per-partition cumsum, broadcast partition offsets — so even "
    "a billion-part catalog never meets a single-reducer window. A part is "
    "counted if the cumulative revenue BEFORE it is still under the 80% "
    "line (the boundary part that crosses the line is included).",
)
def parts_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v")
    )
    rev = li.groupBy("l_partkey").agg(F.sum("v").alias("r"))
    # two-phase distributed prefix sum over revenue-descending order
    sorted_rev = (
        rev.repartitionByRange(F.desc("r"), F.asc("l_partkey"))
        .sortWithinPartitions(F.desc("r"), F.asc("l_partkey"))
        .withColumn("_pid", F.spark_partition_id())
    )
    local = F.sum("r").over(
        Window.partitionBy("_pid")
        .orderBy(F.desc("r"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_local = sorted_rev.withColumn("_local", local)
    offsets = (
        with_local.groupBy("_pid")
        .agg(F.sum("r").alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            ),
        )
        .select("_pid", "_offset")
    )
    totals = rev.agg(
        F.sum("r").alias("tot"), F.count(F.lit(1)).alias("n_parts")
    )
    ranked = (
        with_local.join(broadcast(offsets), "_pid")
        .withColumn("cum_r", F.col("_local") + F.col("_offset"))
        .crossJoin(broadcast(totals))
    )
    return ranked.agg(
        F.min("n_parts").cast("long").alias("n_parts"),
        F.sum(F.when(F.col("cum_r") - F.col("r") < 0.8 * F.col("tot"), 1).otherwise(0))
        .cast("long")
        .alias("parts_for_80pct"),
        round_div(
            F.sum(
                F.when(F.col("cum_r") - F.col("r") < 0.8 * F.col("tot"), 1).otherwise(0)
            )
            / F.min("n_parts"),
            4,
        ).alias("pareto_fraction"),
    )


@register(
    "events_ab_test_analysis",
    oracle="""
    WITH assign AS (
      SELECT DISTINCT user_id, user_id % 2 AS variant FROM events
    ),
    conv AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
      SELECT a.variant,
             COUNT(*) AS n,
             SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS x
      FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
      GROUP BY a.variant
    )
    SELECT CAST(variant AS INT) AS variant,
           CAST(n AS BIGINT) AS n_users,
           CAST(x AS BIGINT) AS n_converted,
           ROUND(CAST(x AS DOUBLE) / n + 0.00000001, 4) AS cr,
           ROUND((x + 1.9208) / (n + 3.8416)
                 - 1.96 * sqrt(x * (n - x) / CAST(n AS DOUBLE) + 0.9604) / (n + 3.8416)
                 + 0.00000001, 4) AS wilson_lo,
           ROUND((x + 1.9208) / (n + 3.8416)
                 + 1.96 * sqrt(x * (n - x) / CAST(n AS DOUBLE) + 0.9604) / (n + 3.8416)
                 + 0.00000001, 4) AS wilson_hi
    FROM cells ORDER BY variant
    """,
    tags=("stats", "abtest", "experiment"),
    doc="A/B experiment readout: users deterministically assigned by "
    "user_id parity, conversion = any purchase, per-variant conversion "
    "rate with the 95% WILSON score interval (z=1.96; well-behaved at "
    "small n and extreme rates, unlike the normal approximation). One "
    "distinct-users pass, one left-semi-style conversion join on the user "
    "key, arithmetic identical in both engines.",
)
def events_ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().withColumn(
        "variant", (F.col("user_id") % 2).cast("int")
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    cells = (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0))).alias("x"),
        )
    )
    n, x = F.col("n"), F.col("x")
    center = (x + 1.9208) / (n + 3.8416)
    halfw = 1.96 * F.sqrt(x * (n - x) / n.cast("double") + 0.9604) / (n + 3.8416)
    return cells.select(
        "variant",
        n.cast("long").alias("n_users"),
        x.cast("long").alias("n_converted"),
        round_div(x.cast("double") / n, 4).alias("cr"),
        round_div(center - halfw, 4).alias("wilson_lo"),
        round_div(center + halfw, 4).alias("wilson_hi"),
    ).orderBy("variant")


@register(
    "events_ks_statistic",
    bench=True,
    oracle="""
    WITH pts AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ka,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS kb
      FROM events
      WHERE event_type IN ('click', 'view')
      GROUP BY value
    ),
    na AS (SELECT CAST(SUM(ka) AS DOUBLE) AS n FROM pts),
    nb AS (SELECT CAST(SUM(kb) AS DOUBLE) AS n FROM pts),
    ecdf AS (
      SELECT value,
             SUM(ka) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS ca,
             SUM(kb) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cb
      FROM pts
    )
    SELECT ROUND(MAX(ABS(ca / na.n - cb / nb.n)) + 0.00000001, 4) AS ks_d,
           CAST(MIN(na.n) AS BIGINT) AS n_a,
           CAST(MIN(nb.n) AS BIGINT) AS n_b
    FROM ecdf, na, nb
    """,
    tags=("stats", "ks", "distribution"),
    doc="Two-sample Kolmogorov-Smirnov statistic between the click and "
    "view value distributions, tie-safe: both samples are first grouped "
    "to DISTINCT values with per-value a/b counts, then the ECDFs are "
    "cumulative sums over those distinct values — the textbook two-sample "
    "KS evaluation points. Because every window row is a unique value, "
    "the running sums are permutation-invariant (no within-tie "
    "intermediate excursions can differ between engines). The cumulative "
    "sums use the two-phase distributed prefix (range-partitioned sort, "
    "local cumsum, broadcast offsets) — same pattern as the sweep line — "
    "so the ECDF never funnels through one reducer.",
)
def events_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    ev = table(spark, sf_dir, "events")
    pts = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("is_a"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("is_b"),
        )
    )
    srt = (
        pts.repartitionByRange(F.col("value"))
        .sortWithinPartitions("value")
        .withColumn("_pid", F.spark_partition_id())
    )
    wloc = Window.partitionBy("_pid").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    with_local = srt.withColumn("_la", F.sum("is_a").over(wloc)).withColumn(
        "_lb", F.sum("is_b").over(wloc)
    )
    # n_a/n_b ride the SAME tiny per-partition aggregate that produces the
    # prefix offsets (Σ is_a over pts ≡ Σ _na over partitions — exact long
    # sums, cast to double only at the end, so the divisions see the same
    # doubles). Before round 14 they were two separate pts.agg() branches,
    # and since Spark re-plans a shared DataFrame per branch, each one
    # re-ran the full scan+groupBy subtree: 4 passes over events for one
    # KS evaluation; now 2 (the ECDF rows and the offsets).
    # `wall` is an un-partitioned window ON PURPOSE (Spark warns): offs is
    # ONE ROW PER SHUFFLE PARTITION (~spark.sql.shuffle.partitions rows),
    # the same bounded-input convention as the _oa/_ob prefix windows below.
    wall = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = (
        with_local.groupBy("_pid")
        .agg(F.sum("is_a").alias("_na"), F.sum("is_b").alias("_nb"))
        .withColumn(
            "_oa",
            F.coalesce(
                F.sum("_na").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "_ob",
            F.coalesce(
                F.sum("_nb").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("n_a", F.sum("_na").over(wall).cast("double"))
        .withColumn("n_b", F.sum("_nb").over(wall).cast("double"))
        .select("_pid", "_oa", "_ob", "n_a", "n_b")
    )
    ecdf = (
        with_local.join(broadcast(offs), "_pid")
        .withColumn("ca", F.col("_la") + F.col("_oa"))
        .withColumn("cb", F.col("_lb") + F.col("_ob"))
    )
    return ecdf.agg(
        round_div(F.max(F.abs(F.col("ca") / F.col("n_a") - F.col("cb") / F.col("n_b"))), 4).alias("ks_d"),
        F.min("n_a").cast("long").alias("n_a"),
        F.min("n_b").cast("long").alias("n_b"),
    )


# ---------------------------------------------------------------------------
# Distribution-drift monitoring (the ML-observability staples)
# ---------------------------------------------------------------------------

PSI_CUT = "2024-01-16"
PSI_BINS = 10


@register(
    "events_psi_value_drift",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, value, CAST(ts AS DATE) < DATE '{PSI_CUT}' AS is_ref
      FROM events
    ),
    stats AS (
      SELECT event_type, MIN(value) AS lo,
             GREATEST(MAX(value) - MIN(value), 1e-300) AS width
      FROM ev WHERE is_ref GROUP BY event_type
    ),
    binned AS (
      SELECT ev.event_type, ev.is_ref,
             LEAST(GREATEST(CAST(FLOOR((ev.value - s.lo) / (s.width / {PSI_BINS})) AS INT), 0), {PSI_BINS - 1}) AS bin
      FROM ev JOIN stats s USING (event_type)
    ),
    cells AS (
      SELECT event_type, bin,
             CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
             CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS tgt_n
      FROM binned GROUP BY event_type, bin
    ),
    tot AS (
      SELECT event_type, SUM(ref_n) AS ref_tot, SUM(tgt_n) AS tgt_tot
      FROM cells GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(MAX(t.ref_tot) AS BIGINT) AS n_ref,
           CAST(MAX(t.tgt_tot) AS BIGINT) AS n_tgt,
           ROUND(SUM(
             ((c.ref_n + 0.5) / (t.ref_tot + {PSI_BINS} * 0.5)
              - (c.tgt_n + 0.5) / (t.tgt_tot + {PSI_BINS} * 0.5))
             * LN(((c.ref_n + 0.5) / (t.ref_tot + {PSI_BINS} * 0.5))
                  / ((c.tgt_n + 0.5) / (t.tgt_tot + {PSI_BINS} * 0.5)))
           ) + 0.00000001, 6) AS psi
    FROM cells c JOIN tot t USING (event_type)
    GROUP BY c.event_type ORDER BY c.event_type
    """,
    tags=("stats", "drift", "psi"),
    doc="Population-stability index of the value distribution, first half "
    "of the month (reference) vs second (target), per event type: 10 "
    "equal-width bins fit on the reference, add-half smoothing. The "
    "monitoring gate a production scoring pipeline runs per feature per "
    "day; one binning pass + two bounded aggregates, no shuffle wider "
    "than (type, bin).",
)
def events_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import drift

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.to_date("ts") < F.lit(PSI_CUT).cast("date")).alias("is_ref"),
    )
    stats = drift.fit_reference(ev.filter("is_ref"), bins=PSI_BINS)
    binned = drift.bin_values(ev, stats, bins=PSI_BINS)
    cells = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("tgt_n"),
    )
    return drift.psi_from_cells(cells, bins=PSI_BINS).orderBy("event_type")


@register(
    "events_chi2_type_dow",
    oracle="""
    WITH obs AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow, CAST(COUNT(*) AS DOUBLE) AS o
      FROM events GROUP BY event_type, dayofweek(ts) + 1
    ),
    rt AS (SELECT event_type, SUM(o) AS row_tot FROM obs GROUP BY event_type),
    ct AS (SELECT dow, SUM(o) AS col_tot FROM obs GROUP BY dow),
    n AS (SELECT SUM(o) AS n FROM obs),
    terms AS (
      SELECT obs.o, rt.row_tot * ct.col_tot / n.n AS e,
             rt.row_tot, ct.col_tot
      FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n
    )
    SELECT ROUND(SUM((o - e) * (o - e) / e) + 0.00000001, 4) AS chi2,
           CAST((SELECT COUNT(*) - 1 FROM rt) * (SELECT COUNT(*) - 1 FROM ct) AS INT) AS dof,
           ROUND(SQRT(SUM((o - e) * (o - e) / e)
                 / ((SELECT MAX(n) FROM n)
                    * LEAST((SELECT COUNT(*) - 1 FROM rt), (SELECT COUNT(*) - 1 FROM ct))))
                 + 0.00000001, 4) AS cramers_v
    FROM terms
    """,
    tags=("stats", "chi2", "independence"),
    doc="Chi-squared independence test of event_type x day-of-week with "
    "Cramér's V effect size — the categorical-drift / feature-association "
    "probe. Contingency cells are one hash aggregate; marginals are "
    "broadcast back onto the (bounded, |types|x7) cell table.",
)
def events_chi2_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").alias("dow")
    )
    obs = ev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("row_tot"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("n"))
    nr = rt.agg((F.count(F.lit(1)) - 1).alias("r1"))
    nc = ct.agg((F.count(F.lit(1)) - 1).alias("c1"))
    terms = (
        obs.join(broadcast(rt), "event_type")
        .join(broadcast(ct), "dow")
        .crossJoin(broadcast(n))
        .withColumn("e", F.col("row_tot") * F.col("col_tot") / F.col("n"))
    )
    chi2 = F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
    return (
        terms.agg(chi2.alias("_chi2"), F.max("n").alias("_n"))
        .crossJoin(broadcast(nr))
        .crossJoin(broadcast(nc))
        .select(
            round_div(F.col("_chi2"), 4).alias("chi2"),
            (F.col("r1") * F.col("c1")).cast("int").alias("dof"),
            round_div(
                F.sqrt(F.col("_chi2") / (F.col("_n") * F.least("r1", "c1"))), 4
            ).alias("cramers_v"),
        )
    )


@register(
    "events_dow_seasonal_outliers",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             dayofweek(ts) + 1 AS dow,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    season AS (
      SELECT event_type, dow, AVG(n) AS mu, STDDEV_SAMP(n) AS sd
      FROM daily GROUP BY event_type, dow
    )
    SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n,
           ROUND(s.mu + 0.00000001, 4) AS expected,
           ROUND(CASE WHEN s.sd > 0 THEN (d.n - s.mu) / s.sd END + 0.00000001, 4) AS z,
           COALESCE(ABS(CASE WHEN s.sd > 0 THEN (d.n - s.mu) / s.sd END) >= 2.0, FALSE) AS is_outlier
    FROM daily d JOIN season s USING (event_type, dow)
    ORDER BY event_type, day
    """,
    tags=("stats", "anomaly", "seasonal"),
    doc="Seasonality-aware volume anomalies: per (event_type, day-of-week) "
    "mean/stddev baseline, daily counts flagged at |z| >= 2 — the 'is "
    "today's traffic weird FOR A TUESDAY' monitor, which a flat threshold "
    "gets wrong twice a week. Two bounded aggregates; the baseline "
    "broadcast back onto the (type, day) table.",
)
def events_dow_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.to_date("ts").alias("day"),
            F.dayofweek("ts").alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    season = daily.groupBy("event_type", "dow").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    z = F.when(F.col("sd") > 0, (F.col("n") - F.col("mu")) / F.col("sd"))
    return (
        daily.join(broadcast(season), ["event_type", "dow"])
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n"),
            round_div(F.col("mu"), 4).alias("expected"),
            round_div(z, 4).alias("z"),
            F.coalesce(F.abs(z) >= 2.0, F.lit(False)).alias("is_outlier"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "events_forecast_backtest_mape",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ),
    joined AS (
      SELECT a.event_type, a.day, a.n, f.n AS forecast
      FROM daily a JOIN daily f
        ON f.event_type = a.event_type AND f.day = a.day - INTERVAL 7 DAY
    )
    SELECT event_type,
           COUNT(*) AS n_days,
           ROUND(AVG(ABS(n - forecast) / n) + 0.00000001, 4) AS mape,
           ROUND(AVG(ABS(n - forecast)) + 0.00000001, 4) AS mae
    FROM joined GROUP BY event_type ORDER BY event_type
    """,
    tags=("stats", "forecast", "backtest"),
    doc="Backtest of the seasonal-naive forecast (predict today = same "
    "weekday last week): per-type MAPE/MAE over every day with a "
    "7-day-old ancestor. The baseline every real forecasting model must "
    "beat — and the pipeline shape (as-of self-join on the date key, "
    "bounded per-type aggregate) is the same harness a real model's "
    "backtest uses.",
)
def events_forecast_backtest_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    f = daily.select(
        F.col("event_type").alias("f_type"),
        F.col("day").alias("fday"),
        F.col("n").alias("forecast"),
    )
    joined = daily.join(
        f,
        (F.col("f_type") == F.col("event_type"))
        & (F.col("fday") == F.date_sub(F.col("day"), 7)),
    ).select("event_type", "day", "n", "forecast")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            round_div(F.avg(F.abs(F.col("n") - F.col("forecast")) / F.col("n")), 4).alias("mape"),
            round_div(F.avg(F.abs(F.col("n") - F.col("forecast"))), 4).alias("mae"),
        )
        .orderBy("event_type")
    )


CHURN_QUIET_DAYS = 7


@register(
    "events_survival_curve",
    oracle=f"""
    WITH spans AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day, MAX(CAST(ts AS DATE)) AS last_day
      FROM events GROUP BY user_id
    ),
    bounds AS (SELECT MAX(CAST(ts AS DATE)) AS end_day FROM events),
    durations AS (
      SELECT s.user_id,
             CASE WHEN s.last_day <= b.end_day - INTERVAL {CHURN_QUIET_DAYS} DAY
                  THEN CAST(s.last_day - s.first_day AS INT) ELSE CAST(b.end_day - s.first_day AS INT) END AS t,
             CASE WHEN s.last_day <= b.end_day - INTERVAL {CHURN_QUIET_DAYS} DAY
                  THEN 1 ELSE 0 END AS churned
      FROM spans s CROSS JOIN bounds b
    ),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM durations),
    per_t AS (
      SELECT t,
             CAST(COUNT(*) AS BIGINT) AS n_at_t,
             CAST(SUM(churned) AS BIGINT) AS d_events
      FROM durations GROUP BY t
    ),
    risk AS (
      SELECT t, n_at_t, d_events,
             (SELECT n FROM tot)
               - COALESCE(SUM(n_at_t) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t
    )
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d_events,
           ROUND(EXP(SUM(LN(1.0 - d_events / n_risk))
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 + 0.00000001, 4) AS survival
    FROM risk WHERE n_risk > 0 ORDER BY t
    """,
    tags=("stats", "survival", "churn"),
    doc="Kaplan-Meier survival curve of time-to-churn: a user churns when "
    "their last event sits >= 7 quiet days before the observation end "
    "(otherwise right-censored at the window edge — the distinction naive "
    "churn rates get wrong). S(t) = prod(1 - d_i/n_i) computed as "
    "exp(running sum of logs) over the ~|distinct days| risk table — the "
    "heavy work is one per-user span aggregate; everything after is "
    "bounded by the calendar, not the fact.",
)
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    ev = table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    bounds = ev.agg(F.max(F.to_date("ts")).alias("end_day"))
    churned = F.col("last_day") <= F.date_sub(F.col("end_day"), CHURN_QUIET_DAYS)
    durations = spans.crossJoin(broadcast(bounds)).select(
        "user_id",
        F.when(
            churned, F.datediff("last_day", "first_day")
        ).otherwise(F.datediff("end_day", "first_day")).cast("int").alias("t"),
        F.when(churned, 1).otherwise(0).alias("churned"),
    )
    tot = durations.agg(F.count(F.lit(1)).cast("double").alias("n"))
    per_t = durations.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_at_t"),
        F.sum("churned").alias("d_events"),
    )
    w_prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        per_t.crossJoin(broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("n") - F.coalesce(F.sum("n_at_t").over(w_prior), F.lit(0.0)),
        )
        .filter(F.col("n_risk") > 0)
    )
    return risk.select(
        "t",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_events").cast("long").alias("d_events"),
        round_div(
            F.exp(
                F.sum(F.log(1.0 - F.col("d_events") / F.col("n_risk"))).over(w_run)
            ),
            4,
        ).alias("survival"),
    ).orderBy("t")


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY event_type
    ),
    walk AS (
      SELECT d.event_type, d.day, t.n_days,
             CAST(t.n_days * SUM(d.n) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day) * t.total
             AS BIGINT) AS t_scaled
      FROM daily d JOIN tot t USING (event_type)
    )
    SELECT event_type, day AS cp_day,
           ROUND(CAST(ABS(t_scaled) AS DOUBLE) / n_days + 0.00000001, 4) AS cusum_peak,
           CAST(n_days AS INT) AS n_days
    FROM (
      SELECT event_type, day, t_scaled, n_days,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ABS(t_scaled) DESC, day) AS rk
      FROM walk
    ) WHERE rk = 1 ORDER BY event_type
    """,
    tags=("stats", "changepoint", "cusum"),
    doc="CUSUM change-point detection on daily volume per event type: the "
    "cumulative deviation from the period mean peaks at the most likely "
    "level-shift day. The statistic is computed SCALED BY n_days so every "
    "intermediate stays a BIGINT — the argmax is exact integer arithmetic "
    "on both engines, no float-order exposure; only the reported peak "
    "magnitude divides back to double. One daily aggregate + windows over "
    "calendar-bounded rows.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_days")
    )
    w_run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_idx = Window.partitionBy("event_type").orderBy("day")
    walk = daily.join(broadcast(tot), "event_type").select(
        "event_type",
        "day",
        "n_days",
        (
            F.col("n_days") * F.sum("n").over(w_run)
            - F.row_number().over(w_idx) * F.col("total")
        ).cast("long").alias("t_scaled"),
    )
    w_peak = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("t_scaled")).desc(), "day"
    )
    return (
        walk.withColumn("rk", F.row_number().over(w_peak))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            round_div(F.abs(F.col("t_scaled")).cast("double") / F.col("n_days"), 4).alias(
                "cusum_peak"
            ),
            F.col("n_days").cast("int").alias("n_days"),
        )
        .orderBy("event_type")
    )


BOOT_B = 200          # bootstrap replicates
BOOT_P = 0.632        # deterministic subsample rate ≈ P(Poisson(1) > 0)
# 95% CI bounds as ranks of the sorted replicate metrics — DERIVED from
# BOOT_B so changing the replicate count cannot silently desync the Spark
# plan from the literal ranks interpolated into the oracle SQL.
BOOT_LO_RK = int(0.025 * BOOT_B) + 1   # 6 at B=200
BOOT_HI_RK = BOOT_B - int(0.025 * BOOT_B)  # 195 at B=200
_BOOT_FRAC = (
    "(('0x' || substr(md5('boot-v1:' || CAST(b AS VARCHAR) || ':' "
    "|| CAST(event_id AS VARCHAR)), 1, 6))::BIGINT / 16777216.0)"
)


@register(
    "events_bootstrap_mean_ci",
    oracle=f"""
    WITH base AS (
      SELECT event_id, value FROM events WHERE event_type = 'purchase'
    ),
    reps AS (
      SELECT b.b,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) + 0.00000001, 4) AS m
      FROM base, (SELECT UNNEST(generate_series(1, {BOOT_B})) AS b) b
      WHERE {_BOOT_FRAC} < {BOOT_P}
      GROUP BY b.b
    ),
    ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rk FROM reps
    ),
    full_mean AS (
      SELECT ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) + 0.00000001, 4) AS mean_full
      FROM base
    )
    SELECT CAST({BOOT_B} AS BIGINT) AS n_replicates,
           (SELECT mean_full FROM full_mean) AS mean_full,
           (SELECT m FROM ranked WHERE rk = {BOOT_LO_RK}) AS ci_lo,
           (SELECT m FROM ranked WHERE rk = {BOOT_HI_RK}) AS ci_hi
    """,
    tags=("stats", "bootstrap", "ci", "deterministic"),
    doc="Bootstrap 95% CI for the mean purchase value — the resampling "
    "made DETERMINISTIC and therefore exactly oracle-checkable: replicate "
    "b includes row r iff the portable md5 fraction of (b, event_id) < "
    "0.632 (the P(Poisson(1)>0) rate that makes Bernoulli subsampling "
    "approximate the classic with-replacement bootstrap), replicate means "
    "use exact decimal sums (engine-identical doubles), and the CI bounds "
    "are rank 6/195 of the 200 sorted replicate means (b tie-break). "
    "Spark shape: one map-side explode of 200 replicate tags, partial-agg "
    "combined groupBy — the fact is scanned ONCE for all replicates; at "
    "100 TB the same plan holds with replicates sharded map-side "
    "(B·|rows| never materializes, only B·|partitions| partials shuffle).",
)
def events_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trainprep import hash_fraction

    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "value")
    )
    tagged = base.withColumn(
        "b", F.explode(F.sequence(F.lit(1), F.lit(BOOT_B)))
    )
    key = F.concat_ws(":", F.col("b"), F.col("event_id"))
    reps = (
        tagged.filter(hash_fraction(key, "boot-v1:") < BOOT_P)
        .groupBy("b")
        .agg(
            round_div(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("m")
        )
    )
    from pyspark.sql import Window

    ranked = reps.withColumn(
        "rk", F.row_number().over(Window.orderBy("m", "b"))
    )
    full_mean = base.agg(
        round_div(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_full")
    )
    lo = ranked.filter(F.col("rk") == BOOT_LO_RK).select(F.col("m").alias("ci_lo"))
    hi = ranked.filter(F.col("rk") == BOOT_HI_RK).select(F.col("m").alias("ci_hi"))
    return (
        full_mean.withColumn("n_replicates", F.lit(BOOT_B).cast("long"))
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select("n_replicates", "mean_full", "ci_lo", "ci_hi")
    )


@register(
    "events_bootstrap_lift_ci",
    oracle=f"""
    WITH base AS (
      SELECT event_id, event_type, value FROM events
      WHERE event_type IN ('purchase', 'click')
    ),
    reps AS (
      SELECT b.b,
             ROUND(
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    FILTER (WHERE event_type = 'purchase') AS DOUBLE)
                 / COUNT(*) FILTER (WHERE event_type = 'purchase')
               - CAST(SUM(CAST(value AS DECIMAL(18,6)))
                      FILTER (WHERE event_type = 'click') AS DOUBLE)
                 / COUNT(*) FILTER (WHERE event_type = 'click')
               + 0.00000001, 4) AS d
      FROM base, (SELECT UNNEST(generate_series(1, {BOOT_B})) AS b) b
      WHERE {_BOOT_FRAC} < {BOOT_P}
      GROUP BY b.b
    ),
    ranked AS (
      SELECT d, ROW_NUMBER() OVER (ORDER BY d, b) AS rk FROM reps
    ),
    full_diff AS (
      SELECT ROUND(
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    FILTER (WHERE event_type = 'purchase') AS DOUBLE)
                 / COUNT(*) FILTER (WHERE event_type = 'purchase')
               - CAST(SUM(CAST(value AS DECIMAL(18,6)))
                      FILTER (WHERE event_type = 'click') AS DOUBLE)
                 / COUNT(*) FILTER (WHERE event_type = 'click')
               + 0.00000001, 4) AS lift
      FROM base
    )
    SELECT (SELECT lift FROM full_diff) AS lift,
           (SELECT d FROM ranked WHERE rk = {BOOT_LO_RK}) AS ci_lo,
           (SELECT d FROM ranked WHERE rk = {BOOT_HI_RK}) AS ci_hi,
           CASE WHEN (SELECT d FROM ranked WHERE rk = {BOOT_LO_RK}) > 0
                  OR (SELECT d FROM ranked WHERE rk = {BOOT_HI_RK}) < 0
                THEN TRUE ELSE FALSE END AS significant
    """,
    tags=("stats", "bootstrap", "abtest", "ci"),
    doc="Bootstrap 95% CI for the purchase-vs-click mean-value LIFT — the "
    "A/B answer the point-estimate abtest query can't give alone. Same "
    "deterministic machinery as events_bootstrap_mean_ci (shared replicate "
    "membership per row via md5(b, event_id); both groups' means computed "
    "with FILTERed exact decimal sums inside ONE groupBy, so the fact "
    "still scans once); 'significant' = the CI excludes zero.",
)
def events_bootstrap_lift_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trainprep import hash_fraction

    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("event_id", "event_type", "value")
    )
    tagged = base.withColumn(
        "b", F.explode(F.sequence(F.lit(1), F.lit(BOOT_B)))
    )
    key = F.concat_ws(":", F.col("b"), F.col("event_id"))
    is_p = F.col("event_type") == "purchase"
    dec = F.col("value").cast("decimal(18,6)")

    def diff_expr():
        sp = F.sum(F.when(is_p, dec)).cast("double")
        np_ = F.sum(F.when(is_p, 1).otherwise(0))
        sc = F.sum(F.when(~is_p, dec)).cast("double")
        nc = F.sum(F.when(~is_p, 1).otherwise(0))
        return round_div(sp / np_ - sc / nc, 4)

    reps = (
        tagged.filter(hash_fraction(key, "boot-v1:") < BOOT_P)
        .groupBy("b")
        .agg(diff_expr().alias("d"))
    )
    from pyspark.sql import Window

    ranked = reps.withColumn("rk", F.row_number().over(Window.orderBy("d", "b")))
    full = base.agg(diff_expr().alias("lift"))
    lo = ranked.filter(F.col("rk") == BOOT_LO_RK).select(F.col("d").alias("ci_lo"))
    hi = ranked.filter(F.col("rk") == BOOT_HI_RK).select(F.col("d").alias("ci_hi"))
    return (
        full.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "lift", "ci_lo", "ci_hi",
            ((F.col("ci_lo") > 0) | (F.col("ci_hi") < 0)).alias("significant"),
        )
    )


EWMA_A = 0.7  # decay base: weight of a day k days back is EWMA_A**k
EWMA_LOOKBACK = 7


@register(
    "events_ewma_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type, a.day, a.n,
             SUM(POWER({EWMA_A}, date_diff('day', b.day, a.day)) * b.n) AS wsum,
             SUM(POWER({EWMA_A}, date_diff('day', b.day, a.day)))       AS wnorm
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type
       AND b.day >= a.day - INTERVAL {EWMA_LOOKBACK} DAY AND b.day < a.day
      GROUP BY 1, 2, 3
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n,
           ROUND(wsum / wnorm + 0.00000001, 4)     AS ewma_forecast,
           ROUND(n * wnorm / wsum + 0.00000001, 4) AS resid_ratio,
           (ROUND(n * wnorm / wsum + 0.00000001, 4) >= 1.5
            OR ROUND(n * wnorm / wsum + 0.00000001, 4) <= 0.6667) AS is_anomaly
    FROM j ORDER BY event_type, day
    """,
    tags=("stats", "forecast", "ewma", "anomaly"),
    doc="Exponentially-weighted moving-average forecast + anomaly flag per "
    "(event_type, day): today's volume vs the decay-weighted mean of the "
    "prior 7 days (weight a^k for a day k back, truncated-window EWMA — "
    "robust to calendar gaps because the exponent is the DAY DISTANCE, "
    "not the row offset). Complements the seasonal-naive backtest "
    "(events_forecast_backtest_mape) with the other classical baseline. "
    "The Spark plan is one daily aggregate, then a range-frame window "
    "whose collect_list feeds a JVM-side F.aggregate fold — no self-join, "
    "no UDF; at 100 TB the window state is bounded by lookback × groups, "
    "and the daily table it runs over is already days×types-sized.",
)
def events_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .withColumn("di", F.datediff("day", F.lit("2024-01-01")))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("di")
        .rangeBetween(-EWMA_LOOKBACK, -1)
    )
    hist = daily.withColumn(
        "hist", F.collect_list(F.struct("di", "n")).over(w)
    ).filter(F.size("hist") > 0)
    decay = lambda x: F.pow(F.lit(EWMA_A), (F.col("di") - x["di"]).cast("double"))
    wsum = F.aggregate(
        "hist", F.lit(0.0), lambda acc, x: acc + decay(x) * x["n"]
    )
    wnorm = F.aggregate("hist", F.lit(0.0), lambda acc, x: acc + decay(x))
    scored = hist.select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n"),
        round_div(wsum / wnorm, 4).alias("ewma_forecast"),
        round_div(F.col("n") * wnorm / wsum, 4).alias("resid_ratio"),
    )
    return scored.withColumn(
        "is_anomaly",
        (F.col("resid_ratio") >= 1.5) | (F.col("resid_ratio") <= 0.6667),
    ).orderBy("event_type", "day")


@register(
    "regression_multifeature_ols",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(l_quantity)                  AS sx1,
             SUM(l_discount)                  AS sx2,
             SUM(l_extendedprice)             AS sy,
             SUM(l_quantity * l_quantity)     AS sx11,
             SUM(l_discount * l_discount)     AS sx22,
             SUM(l_quantity * l_discount)     AS sx12,
             SUM(l_quantity * l_extendedprice) AS sx1y,
             SUM(l_discount * l_extendedprice) AS sx2y,
             SUM(l_extendedprice * l_extendedprice) AS syy
      FROM lineitem GROUP BY l_returnflag
    ),
    c AS (
      SELECT l_returnflag, n,
             sx11 - sx1 * sx1 / n AS c11,
             sx22 - sx2 * sx2 / n AS c22,
             sx12 - sx1 * sx2 / n AS c12,
             sx1y - sx1 * sy / n  AS c1y,
             sx2y - sx2 * sy / n  AS c2y,
             syy  - sy * sy / n   AS cyy,
             sx1, sx2, sy
      FROM s
    ),
    b AS (
      SELECT l_returnflag, n, sx1, sx2, sy, c1y, c2y, cyy,
             (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
             (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
      FROM c
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND(b1 + 0.00000001, 4) AS beta_qty,
           ROUND(b2 + 0.00000001, 4) AS beta_disc,
           ROUND((sy - b1 * sx1 - b2 * sx2) / n + 0.00000001, 4) AS intercept,
           ROUND((b1 * c1y + b2 * c2y) / cyy + 0.00000001, 4)    AS r2
    FROM b ORDER BY l_returnflag
    """,
    tags=("stats", "regression", "ml"),
    doc="Multi-feature OLS (extendedprice ~ quantity + discount per return "
    "flag) solved in closed form from SUFFICIENT STATISTICS: one "
    "partial-aggregable pass collects the 10 moment sums, the 2×2 normal "
    "equations solve by Cramer's rule inside the projection — the "
    "distributed-ML pattern where model fitting costs exactly one "
    "map-side-combined aggregate regardless of row count (p features ⇒ "
    "O(p²) sums, never a second data pass; the same shape fits ridge by "
    "adding λ to the diagonal). Extends the built-in simple-regression "
    "aggregates (events_trend_per_user) to the multivariate case Spark "
    "and DuckDB lack natively.",
)
def regression_multifeature_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("l_quantity").alias("sx1"),
        F.sum("l_discount").alias("sx2"),
        F.sum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sx11"),
        F.sum(F.col("l_discount") * F.col("l_discount")).alias("sx22"),
        F.sum(F.col("l_quantity") * F.col("l_discount")).alias("sx12"),
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sx1y"),
        F.sum(F.col("l_discount") * F.col("l_extendedprice")).alias("sx2y"),
        F.sum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("syy"),
    )
    c = s.select(
        "l_returnflag", "n", "sx1", "sx2", "sy",
        (F.col("sx11") - F.col("sx1") * F.col("sx1") / F.col("n")).alias("c11"),
        (F.col("sx22") - F.col("sx2") * F.col("sx2") / F.col("n")).alias("c22"),
        (F.col("sx12") - F.col("sx1") * F.col("sx2") / F.col("n")).alias("c12"),
        (F.col("sx1y") - F.col("sx1") * F.col("sy") / F.col("n")).alias("c1y"),
        (F.col("sx2y") - F.col("sx2") * F.col("sy") / F.col("n")).alias("c2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("cyy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b = c.select(
        "l_returnflag", "n", "sx1", "sx2", "sy", "c1y", "c2y", "cyy",
        ((F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det).alias("b1"),
        ((F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det).alias("b2"),
    )
    return b.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        round_div(F.col("b1"), 4).alias("beta_qty"),
        round_div(F.col("b2"), 4).alias("beta_disc"),
        round_div(
            (F.col("sy") - F.col("b1") * F.col("sx1") - F.col("b2") * F.col("sx2"))
            / F.col("n"),
            4,
        ).alias("intercept"),
        round_div(
            (F.col("b1") * F.col("c1y") + F.col("b2") * F.col("c2y")) / F.col("cyy"), 4
        ).alias("r2"),
    ).orderBy("l_returnflag")
