"""Extended relational surface: as-of/range joins, rollup, analytic window
suite, map/array function suites, approximate aggregates.

These go beyond the reference's operator inventory (flagged "standard Spark /
scale extension" per SURVEY §7.3) but are first-class engine capabilities:
a training-data pipeline at 100 TB leans on exactly these shapes
(point-in-time feature lookups, hierarchical rollups, sketch aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_div
from ..operators.asof import asof_join
from ..sources import table
from .catalog import register


@register(
    "asof_join_latest_purchase",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id,
           c.user_id,
           CAST(date_trunc('second', c.ts) AS TIMESTAMP) AS click_ts,
           p.event_id                                    AS matched_event_id,
           ROUND(p.value, 2)                             AS matched_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("join", "asof", "custom-operator"),
    bench=True,
)
def asof_join_latest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's most recent purchase at
    or before it (union-tag-carry plan — see operators/asof.py; DuckDB's
    native ASOF JOIN is the oracle)."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["event_id", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_trunc("second", F.col("ts")).alias("click_ts"),
        "matched_event_id",
        F.round("matched_value", 2).alias("matched_value"),
    )


@register(
    "range_join_error_window",
    oracle="""
    SELECT s.event_id AS signup_id, e.event_id AS error_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
      ON s.user_id = e.user_id
     AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 1 HOUR
    """,
    tags=("join", "range"),
)
def range_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed interval join: errors within one hour after a signup, same user.
    The equi-key carries the shuffle; the range predicate filters within the
    key group (no cross-join — at scale, add time-bucket keys to bound the
    worst hot key)."""
    ev = table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    return (
        s.join(
            e,
            (F.col("s_user") == F.col("e_user"))
            & (F.col("e_ts") >= F.col("s_ts"))
            & (F.col("e_ts") < F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("signup_id", "error_id")
    )


@register(
    "rollup_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (status → priority → grand total) — one pass,
    Spark expands grouping sets without rescanning."""
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "window_analytics_suite",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CAST(DENSE_RANK()  OVER w_price AS INT)  AS price_rank,
           CAST(NTILE(4)      OVER w_price AS INT)  AS quartile,
           CAST(LEAD(o_orderkey) OVER w_time AS BIGINT) AS next_orderkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w_time, 2) AS first_price,
           ROUND(SUM(o_totalprice) OVER w_range, 2) AS sum_30d
    FROM (SELECT *, CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS d
          FROM orders)
    WINDOW
      w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
      w_time  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      w_range AS (PARTITION BY o_custkey ORDER BY d RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "analytics"),
)
def window_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / ntile / lead / first_value / range-frame sum in one pass
    over the same partitioning (Spark reuses the shuffle across frames)."""
    o = table(spark, sf_dir, "orders").withColumn(
        "d", F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    )
    w_price = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_range = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w_price).alias("price_rank"),
        F.ntile(4).over(w_price).alias("quartile"),
        F.lead("o_orderkey").over(w_time).alias("next_orderkey"),
        F.round(F.first("o_totalprice").over(w_time), 2).alias("first_price"),
        F.round(F.sum("o_totalprice").over(w_range), 2).alias("sum_30d"),
    )


@register(
    "window_distribution_suite",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           ROUND(PERCENT_RANK() OVER w + 0.00000001, 4) AS pct_rank,
           ROUND(CUME_DIST()    OVER w + 0.00000001, 4) AS cum_dist,
           CAST(NTH_VALUE(o_orderkey, 2) OVER w AS BIGINT) AS second_priciest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window", "distribution"),
)
def window_distribution_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value — the distribution window family.
    The ordering is total (price then key), so both distribution functions
    are tie-free and deterministic; same single shuffle as any one of them."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        round_div(F.percent_rank().over(w), 4).alias("pct_rank"),
        round_div(F.cume_dist().over(w), 4).alias("cum_dist"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_priciest"),
    )


@register(
    "map_json_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           array_to_string(json_keys(props), ',')         AS prop_keys,
           CAST(len(json_keys(props)) AS INT)             AS n_keys
    FROM events
    """,
    tags=("scalar", "map", "json"),
)
def map_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload as a typed map column: from_json → element_at/map_keys
    (the engine's map-function surface; reference F16/F17 JSON codecs)."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "array_functions_suite",
    oracle="""
    WITH t AS (SELECT p_partkey, regexp_split_to_array(p_name, ' ') AS words FROM part)
    SELECT p_partkey,
           CAST(len(words) AS INT)                    AS n_words,
           list_contains(words, 'widget')             AS has_widget,
           words[1]                                   AS first_word,
           array_to_string(list_reverse(list_sort(words)), ',') AS sorted_desc,
           CAST(list_position(words, 'gear') AS INT)  AS gear_pos
    FROM t
    """,
    tags=("scalar", "array"),
)
def array_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface: size/contains/index/sort/reverse/position
    (reference uses list append/len/membership in the crawler, SURVEY §2.7)."""
    p = table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_contains(words, "widget").alias("has_widget"),
        F.element_at(words, 1).alias("first_word"),
        F.array_join(F.reverse(F.array_sort(words)), ",").alias("sorted_desc"),
        F.coalesce(F.array_position(words, "gear"), F.lit(0)).cast("int").alias("gear_pos"),
    )


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
    tags=("agg", "approx"),
    doc="Per-type distinct-user counts. The HLL++ accuracy claim that used "
    "to ride along as a hardcoded TRUE AS est_within_5pct oracle column "
    "lives in approx_distinct_users_eval (eval_only + pytest floor) — a "
    "data-dependent measured bound must never be pinned in a value oracle "
    "(the flaw class that broke rounds 3 and 4).",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "approx_distinct_users_eval",
    tags=("agg", "approx", "eval"),
    eval_only=True,
    doc="Measured HLL++ approx_count_distinct(rsd=0.01) per event_type next "
    "to the exact count. No SQL oracle BY DESIGN: the estimate is "
    "engine-specific. tests/test_sketches.py asserts every row lands "
    "within 5%·exact (a 5σ bound at rsd=0.01; deterministic for fixed "
    "data — HLL++ is seedless).",
)
def approx_distinct_users_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        )
        .withColumn(
            "est_within_5pct",
            (F.abs(F.col("approx_users") - F.col("exact_users"))
             <= 0.05 * F.col("exact_users")),
        )
        .orderBy("event_type")
    )


@register(
    "percentiles_by_type",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5) + 0.000001, 2)  AS p50,
           ROUND(quantile_cont(value, 0.95) + 0.000001, 2) AS p95,
           ROUND(MIN(value), 2) AS min_v,
           ROUND(MAX(value), 2) AS max_v
    FROM events GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)
def percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (Spark ``percentile``; the approximate
    sketch twin is ``percentile_approx`` for the 100 TB path)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        round_div(F.percentile("value", F.lit(0.5)), 2).alias("p50"),
        round_div(F.percentile("value", F.lit(0.95)), 2).alias("p95"),
        F.round(F.min("value"), 2).alias("min_v"),
        F.round(F.max("value"), 2).alias("max_v"),
    )


@register(
    "higher_order_array_suite",
    oracle="""
    WITH g AS (
      SELECT l_orderkey,
             list(l_extendedprice ORDER BY l_linenumber) AS prices,
             list(l_quantity     ORDER BY l_linenumber) AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(prices) AS INT)                                        AS n_items,
           ROUND(list_sum(list_transform(prices, x -> x * 0.9)) + 0.000001, 2) AS disc_total,
           CAST(len(list_filter(prices, x -> x > 30000)) AS INT)           AS n_big,
           len(list_filter(qtys, q -> q > 45)) > 0                         AS any_hot,
           len(list_filter(qtys, q -> q <= 0)) = 0                         AS all_pos,
           ROUND(list_sum(list_transform(range(1, len(prices) + 1),
                                         i -> qtys[i] * prices[i])), 2)    AS weighted_sum
    FROM g
    """,
    tags=("array", "higher-order", "lambda"),
)
def higher_order_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas — transform / filter / aggregate / exists /
    forall / zip_with over per-order line arrays, all inside codegen (the
    Spark-distinctive alternative to exploding and re-aggregating: zero extra
    shuffles once the array is built). Arrays are ordered by the unique
    linenumber so element order — and therefore the left-to-right fold — is
    identical on both engines."""
    li = table(spark, sf_dir, "lineitem")
    g = (
        li.groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("l_linenumber", "l_extendedprice", "l_quantity"))
            ).alias("lines")
        )
        .select(
            "l_orderkey",
            F.transform("lines", lambda s: s["l_extendedprice"]).alias("prices"),
            F.transform("lines", lambda s: s["l_quantity"]).alias("qtys"),
        )
    )
    fold_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)  # noqa: E731
    return g.select(
        "l_orderkey",
        F.size("prices").alias("n_items"),
        round_div(fold_sum(F.transform("prices", lambda x: x * 0.9)), 2).alias("disc_total"),
        F.size(F.filter("prices", lambda x: x > 30000)).alias("n_big"),
        F.exists("qtys", lambda q: q > 45).alias("any_hot"),
        F.forall("qtys", lambda q: q > 0).alias("all_pos"),
        F.round(fold_sum(F.zip_with("qtys", "prices", lambda q, p: q * p)), 2).alias(
            "weighted_sum"
        ),
    )


@register(
    "map_lambda_suite",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events WHERE user_id < 40
      GROUP BY user_id, event_type
    )
    SELECT user_id, event_type, CAST(n * 100 AS BIGINT) AS scaled
    FROM counts
    WHERE n >= 2
    """,
    tags=("map", "lambda", "higher-order"),
)
def map_lambda_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (the one lambda family the array suite
    doesn't cover): per-user type→count maps via map_from_entries, values
    rescaled with transform_values, rare types dropped with map_filter,
    exploded back to rows for the relational oracle. All codegen'd map
    expressions — the map never leaves the JVM."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    per_type = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("type_counts")
    )
    shaped = mapped.select(
        "user_id",
        F.map_filter(
            F.transform_values("type_counts", lambda _, v: v * 100),
            lambda _, v: v >= 200,
        ).alias("m"),
    )
    return shaped.select(
        "user_id", F.explode("m").alias("event_type", "scaled")
    )


@register(
    "orders_market_basket",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM basket),
    part_freq AS (
      SELECT l_partkey, COUNT(*) AS pf FROM basket GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, support,
           ROUND(support * n.n_orders / (fa.pf * fb.pf) + 0.00000001, 4) AS lift
    FROM pairs
    JOIN part_freq fa ON part_a = fa.l_partkey
    JOIN part_freq fb ON part_b = fb.l_partkey
    CROSS JOIN n
    ORDER BY support DESC, part_a, part_b
    LIMIT 25
    """,
    tags=("analytics", "basket", "selfjoin"),
    doc="Market-basket pair mining: co-occurrence support and lift "
    "(P(a,b)/(P(a)P(b))) for part pairs within an order. The self-join is "
    "keyed on the basket id, so candidate pairs are Σ|basket|² — bounded "
    "by basket size (≈4-7 lines/order), not corpus size; the part-"
    "frequency joins are left to AQE (part cardinality scales with the "
    "fact at 100 TB, so a hard broadcast hint would be wrong — AQE "
    "broadcasts only when the built side is actually small) and the "
    "global top-25 is a TakeOrdered, not a full sort.",
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    basket = (
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    n = basket.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    pf = basket.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("pf"))
    a = basket.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = basket.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    fa = pf.select(F.col("l_partkey").alias("part_a"), F.col("pf").alias("pf_a"))
    fb = pf.select(F.col("l_partkey").alias("part_b"), F.col("pf").alias("pf_b"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            round_div(
                F.col("support") * F.col("n_orders") / (F.col("pf_a") * F.col("pf_b")), 4
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(25)
    )
