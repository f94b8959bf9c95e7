"""Relational query suite — SURVEY §2.2-§2.7 capabilities on the driver tables.

Each query is the Spark-idiomatic expression of an operator class the
reference implements (citations in docstrings); the paired oracle is ANSI SQL
for DuckDB. Plans are written scale-first: filters before joins (pushdown),
small dims broadcast, aggregations declared so partial (map-side) aggregation
applies, deterministic tie-breaks on every ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions import scalar
from ..functions.rounding import dec_sum, round_div
from ..sources import table
from .catalog import register

# ---------------------------------------------------------------------------
# Aggregation core (SURVEY §2.4: A1-A6)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)              AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           ROUND(AVG(l_quantity) + 0.000001, 2)        AS avg_qty,
           ROUND(AVG(l_extendedprice) + 0.000001, 2)   AS avg_price,
           ROUND(AVG(l_discount) + 0.00000001, 4)      AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style grouped aggregation (full scan, hash agg with map-side
    partial agg; the filter reaches the parquet scan as a pushed predicate)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            round_div(F.avg("l_quantity"), 2).alias("avg_qty"),
            round_div(F.avg("l_extendedprice"), 2).alias("avg_price"),
            round_div(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct_per_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*)                    AS n_customers,
           ROUND(SUM(c_acctbal), 2)    AS sum_acctbal
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_distinct_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (reference A1 genre-set union ≙ distinct agg)."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


@register(
    "agg_collect_sorted_list",
    oracle="""
    SELECT s_nationkey AS nationkey,
           COUNT(*) AS n_suppliers,
           STRING_AGG(s_name, ',' ORDER BY s_name) AS supplier_names
    FROM supplier GROUP BY s_nationkey
    """,
    tags=("agg", "collect_list"),
)
def agg_collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-list per key (reference A5: genres-of-artist lists,
    /root/reference/src/cache_manager/service.py:89-92). Sorted for
    determinism, joined to a string for cross-engine comparability."""
    return (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("supplier_names"),
        )
    )


@register(
    "agg_conditional_counts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*)                                              AS n_orders,
           COUNT(*) FILTER (WHERE o_totalprice > 200000)         AS n_big,
           ROUND(AVG(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END) + 0.000001, 2) AS avg_urgent_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "conditional"),
)
def agg_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counts (reference A4: events-with-embeddings count,
    /root/reference/tests/dev_utils/count_events.py:24-40)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
            round_div(
                F.avg(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))), 2
            ).alias("avg_urgent_price"),
        )
    )


# ---------------------------------------------------------------------------
# Join suite (SURVEY §2.3: J1-J9)
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style 3-way join + agg + top-k. Customer side is filtered
    before the join (pushdown) and broadcast (small dim); the final top-10 is
    a TakeOrderedAndProject, not a full sort."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey   = c_custkey
                JOIN lineitem ON l_orderkey  = o_orderkey
                JOIN supplier ON s_suppkey   = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg", "multiway"),
    bench=True,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-way join. Dim chain (region→nation) broadcasts;
    fact-side joins shuffle on their keys; AQE picks broadcast for the
    filtered customer side at small SF and sort-merge at scale."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    nations_in_region = broadcast(
        nation.join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(supp), (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey))
        .join(nations_in_region, cust.c_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "join_left_with_agg",
    oracle="""
    SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    GROUP BY COALESCE(c_mktsegment, 'UNKNOWN')
    """,
    tags=("join", "outer"),
)
def join_left_with_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + agg (reference J7 uses left joins for optional dims)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
        .groupBy(F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "join_semi_existence",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("join", "semi"),
)
def join_semi_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the reference's existence probes (J9,
    /root/reference/src/loader/service.py:534-539) as a set-oriented plan."""
    cust = table(spark, sf_dir, "customer")
    big_orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_absence",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def join_anti_absence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — insert-if-absent (reference J1/J6 get-or-create)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_self_pairs",
    oracle="""
    SELECT a.n_regionkey AS regionkey, a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
    """,
    tags=("join", "self"),
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join — the reference's artist_relations edge traversal (J8,
    /root/reference/src/shared/db/models/models.py:161-174)."""
    a = table(spark, sf_dir, "nation").alias("a")
    b = table(spark, sf_dir, "nation").alias("b")
    return a.join(
        b, (F.col("a.n_regionkey") == F.col("b.n_regionkey")) & (F.col("a.n_name") < F.col("b.n_name"))
    ).select(
        F.col("a.n_regionkey").alias("regionkey"),
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
    )


@register(
    "q_order_document",
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE)   AS orderdate,
           c.c_name,
           n.n_name                      AS nation,
           r.r_name                      AS region,
           ROUND(o.o_totalprice, 2)      AS total_price,
           COUNT(l.l_partkey)            AS n_items,
           STRING_AGG(CAST(l.l_partkey AS VARCHAR), ',' ORDER BY l.l_linenumber, l.l_partkey) AS part_keys
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-02-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, c.c_name, n.n_name, r.r_name, o.o_totalprice
    ORDER BY orderdate, o_orderkey
    """,
    tags=("join", "multiway", "collect_list", "flagship"),
    bench=True,
)
def q_order_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's canonical read path (§3.4 cache query,
    /root/reference/src/cache_manager/service.py:29-123) re-shaped onto the
    driver tables — date-filtered fact, 4-way dim join, per-entity
    collect-list, deterministic ordering. Dims broadcast; the fact side
    aggregates lineitems with map-side partial agg."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    li = table(spark, sf_dir, "lineitem")
    items = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.count("l_partkey").alias("n_items"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("l_linenumber"), F.col("l_partkey")))
                    ),
                    lambda s: s["l_partkey"].cast("string"),
                ),
                ",",
            ).alias("part_keys"),
        )
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(items, orders.o_orderkey == items.l_orderkey)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.round(F.col("o_totalprice"), 2).alias("total_price"),
            "n_items",
            "part_keys",
        )
        .orderBy("orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Window suite (SURVEY §2.5: W1-W3 + implied top-k)
# ---------------------------------------------------------------------------


@register(
    "window_first_wins_dedup",
    oracle="""
    SELECT user_id, event_id,
           CAST(date_trunc('second', ts) AS TIMESTAMP) AS first_ts
    FROM (SELECT user_id, event_id, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
    tags=("window", "dedup"),
    bench=True,
)
def window_first_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins per key (reference W3/P12: unique-index DO NOTHING ≙
    earliest row wins, /root/reference/src/shared/db/database.py:151-164)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_trunc("second", F.col("ts")).alias("first_ts"),
        )
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
    FROM events
    """,
    tags=("window", "lag"),
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag/lead analytics (not in reference — standard Spark; declared for
    the engine's relational surface)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum
    FROM events
    """,
    tags=("window", "frame"),
    bench=True,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with explicit frame."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("run_sum")
    )


@register(
    "window_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS price, CAST(rk AS INT) AS rk
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
          FROM part)
    WHERE rk <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (the HNSW-implied top-k pattern, SURVEY §2.5)."""
    part = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", F.round("p_retailprice", 2).alias("price"), "rk")
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT (reference SO3: insert-if-absent set difference)."""
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.subtract(supp)  # EXCEPT DISTINCT


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION + dedup (reference SO1 genre-name set union,
    /root/reference/src/loader/service.py:843-845)."""
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


# ---------------------------------------------------------------------------
# Scalar function suites (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "scalar_string_suite",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name)                         AS name_lc,
           UPPER(p_brand)                        AS brand_uc,
           CAST(LENGTH(p_name) AS INT)           AS name_len,
           SUBSTRING(p_name, 1, 5)               AS name_pfx,
           REPLACE(p_name, ' ', '_')             AS name_us,
           (p_name LIKE '%red%')                 AS has_red,
           CONCAT_WS('-', p_brand, p_type)       AS brand_type,
           TRIM('  ' || p_name || ' ')           AS name_trim
    FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions F7-F11 (lower/contains/trim/concat/replace/substr)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.col("p_name").contains("red").alias("has_red"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
    )


@register(
    "scalar_date_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)     AS y,
           CAST(MONTH(o_orderdate) AS INT)    AS m,
           CAST(DAY(o_orderdate) AS INT)      AS d,
           CAST(QUARTER(o_orderdate) AS INT)  AS q,
           STRFTIME(o_orderdate, '%Y-%m')     AS ym,
           CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date
    FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions F4-F6 (year/month/format/diff/add)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


@register(
    "scalar_case_ttl_tiers",
    oracle=f"""
    SELECT CASE WHEN days < 0 THEN {scalar.TTL_PAST}
                WHEN days = 0 THEN {scalar.TTL_TODAY}
                WHEN days <= 7 THEN {scalar.TTL_WEEK}
                ELSE {scalar.TTL_FUTURE} END AS ttl_seconds,
           COUNT(*) AS n
    FROM (SELECT CAST(DATEDIFF('day', DATE '1995-06-17', CAST(o_orderdate AS DATE)) AS INT) AS days
          FROM orders)
    GROUP BY 1
    """,
    tags=("scalar", "case"),
)
def scalar_case_ttl_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL tiering F13 (/root/reference/src/shared/cache/redis_cache.py:65-96)
    against a fixed reference date for determinism."""
    o = table(spark, sf_dir, "orders")
    ttl = scalar.ttl_seconds(F.col("o_orderdate").cast("date"), F.lit("1995-06-17").cast("date"))
    return o.groupBy(ttl.alias("ttl_seconds")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "scalar_case_capacity_buckets",
    oracle="""
    SELECT CASE WHEN c_acctbal < 100 THEN 'intimate'
                WHEN c_acctbal < 500 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n,
           ROUND(AVG(c_acctbal) + 0.000001, 2) AS avg_bal
    FROM customer GROUP BY 1
    """,
    tags=("scalar", "case"),
)
def scalar_case_capacity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity bucketing F14 (/root/reference/src/loader/service.py:163-169)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(scalar.capacity_bucket(F.col("c_acctbal")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), round_div(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )


@register(
    "scalar_regexp_extract_default",
    oracle="""
    SELECT doc_id,
           COALESCE(NULLIF(REGEXP_EXTRACT(text, '\\b(merge|join|scan)\\b', 1), ''), 'none') AS first_kw
    FROM documents
    """,
    tags=("scalar", "regex"),
)
def scalar_regexp_extract_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract with default F1 (/root/reference/src/extractor/
    service.py:447-471 — time-pattern extraction, default on miss)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        scalar.regexp_extract_default(F.col("text"), r"\b(merge|join|scan)\b", 1, "none").alias(
            "first_kw"
        ),
    )


@register(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
    """,
    tags=("scalar", "json"),
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction F16/F17 (the events.props payload; reference
    serializes/deserializes EventDTO JSON, /root/reference/src/shared/utils/
    helpers.py:17-53)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select("event_id", k.alias("k_val")).filter(F.col("k_val") > 50)


@register(
    "scalar_printf_formatting",
    oracle="""
    SELECT c_custkey,
           PRINTF('%s [%s]', c_name, c_mktsegment) AS label,
           CONCAT_WS(', ', c_name, c_mktsegment)   AS joined
    FROM customer
    """,
    tags=("scalar", "format"),
)
def scalar_printf_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_string / concat_ws F6-F8 (address assembly,
    /root/reference/src/extractor/service.py:243)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.format_string("%s [%s]", F.col("c_name"), F.col("c_mktsegment")).alias("label"),
        F.concat_ws(", ", "c_name", "c_mktsegment").alias("joined"),
    )


@register(
    "s13_date_sequence",
    oracle="""
    WITH ds AS (
      SELECT CAST(UNNEST(GENERATE_SERIES(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY)) AS DATE) AS d
    )
    SELECT d, CAST(MONTH(d) AS INT) AS m, CAST(DAY(d) AS INT) AS dd FROM ds
    """,
    tags=("source", "generator"),
)
def s13_date_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range generator source S13 (/root/reference/src/param_generator/
    app.py:19-34) — sequence + explode, fixed range for determinism."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(F.lit("2024-01-01").cast("date"), F.lit("2024-01-31").cast("date"))
            ).alias("d")
        )
        .select("d", F.month("d").alias("m"), F.dayofmonth("d").alias("dd"))
    )


# ---------------------------------------------------------------------------
# Events: time-window rollups + filters (SURVEY §2.2 P11, gold-path shapes)
# ---------------------------------------------------------------------------


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value,
           ROUND(AVG(value) + 0.000001, 2) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    tags=("agg", "time"),
    bench=True,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup (tumbling window as date_trunc; the
    streaming variant uses the same plan under a watermark)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            round_div(F.avg("value"), 2).alias("avg_value"),
        )
    )


@register(
    "events_daily_pivot",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS clicks,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS views,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signups,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS errors
    FROM events GROUP BY 1
    """,
    tags=("agg", "pivot"),
)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (single shuffle, no crosstab scan)."""
    ev = table(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(name)
        for t, name in [
            ("click", "clicks"), ("view", "views"), ("purchase", "purchases"),
            ("signup", "signups"), ("error", "errors"),
        ]
    ]
    return ev.groupBy(F.to_date("ts").alias("day")).agg(*aggs)


@register(
    "p11_date_range_filter",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_sec
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
      AND event_type IN ('click', 'purchase')
    """,
    tags=("filter", "pushdown"),
)
def p11_date_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cache-manager date-range predicate P11 (/root/reference/src/
    cache_manager/service.py:43-58). On a date-partitioned lakehouse table
    this prunes partitions; here the time range is pushed to the parquet
    scan as a raw-nanos predicate (see sources.events_time_range)."""
    from ..sources.tables import events_time_range

    ev = events_time_range(spark, sf_dir, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id", "user_id", "event_type",
            F.date_trunc("second", F.col("ts")).alias("ts_sec"),
        )
    )
