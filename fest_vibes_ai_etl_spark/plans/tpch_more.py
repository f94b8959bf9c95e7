"""Remaining TPC-H decision-support shapes, adapted to the driver tables.

The driver testdata has no ``partsupp`` and lineitem carries no
shipmode/commitdate/receiptdate, so the partsupp-dependent shapes (Q2, Q9,
Q11, Q16, Q20) use ``lineitem`` as the part↔supplier association and the
date-dependent ones (Q12, Q21) define lateness relative to
``o_orderdate + INTERVAL`` — the *planner* shape each query exercises is
preserved exactly:

- Q2  correlated MIN subquery → per-group min + equality join-back
- Q6  pure scan-aggregate (every predicate pushed to the parquet reader)
- Q8  market-share: two-level conditional ratio over a 7-table join
- Q9  profit rollup over fact⋈3 dims with a LIKE filter
- Q11 group HAVING against an uncorrelated global scalar
- Q12 non-equi residual on a hash join + conditional two-way counts
- Q13 outer-join count-of-counts (join → agg → re-agg)
- Q15 agg CTE reused for MAX scalar + equality (view-over-agg)
- Q16 NOT IN → broadcast anti-join + COUNT(DISTINCT)
- Q20 nested IN chains → stacked semi-joins over an aggregated HAVING
- Q21 EXISTS + NOT EXISTS over the same fact (semi + anti self-joins)

All oracle-checked value-for-value against DuckDB; money sums accumulate in
DECIMAL(18,6) (``dec_sum``) and ratios get the ``round_div`` epsilon so both
engines round identically (see functions/rounding.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.rounding import dec_sum, round_div
from ..sources import table
from .catalog import register


def _ts(s: str):
    return F.lit(s + " 00:00:00").cast("timestamp")


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("scan", "agg", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6: the canonical scan-aggregate — every predicate is a plain
    column comparison, so all three reach the parquet scan as PushedFilters
    and the single global sum is a two-phase partial aggregate (no shuffle
    of data rows, only of one partial row per partition)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
           l_extendedprice AS min_price
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 5 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND l_extendedprice = (
            SELECT MIN(l2.l_extendedprice)
            FROM lineitem l2
            JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
            JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
            JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
            WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 25
    """,
    tags=("join", "subquery", "correlated-min"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape (lineitem as the part↔supplier association): for each
    qualifying part, the European supplier(s) offering its minimum price.
    The correlated MIN decorrelates into one per-part aggregate over the
    SAME filtered join — built once, aggregated, and joined back on
    (partkey, price). Bounded dims (nation/region) broadcast by hint; the
    SF-scaling sides are left to AQE. The fact is scanned once per side
    of the join-back (the aggregate side is tiny)."""
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "STANDARD")
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = table(spark, sf_dir, "lineitem")

    eur_supp = (
        supp.join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(eur_supp, li.l_suppkey == eur_supp.s_suppkey)
        .select("p_partkey", "p_name", "l_extendedprice", "s_acctbal", "s_name", "n_name")
    )
    min_price = offers.groupBy(F.col("p_partkey").alias("mp_pk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        offers.join(
            min_price,
            (offers.p_partkey == F.col("mp_pk"))
            & (offers.l_extendedprice == F.col("min_price")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_price")
        .distinct()
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(25)
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT yr,
           CAST(ROUND(
             CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END
                           AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE)
             + 0.00000001, 4) AS DOUBLE) AS mkt_share
    FROM (SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY yr
    """,
    tags=("join", "multiway", "ratio"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one supplier nation's share of PROMO revenue into the
    AMERICA market, per year — a 7-table join where every dimension
    joins small-side (AQE decides; bounded dims by hint) and only the two
    fact joins (lineitem⋈orders on orderkey,
    ⋈customer on custkey) shuffle. The share is a conditional-sum ratio in
    DECIMAL (numerator and denominator in one aggregate pass)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(n1), cust.c_nationkey == F.col("c_nkey"))
        .join(broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(broadcast(n2), supp.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            round_div(
                F.sum(nat_vol.cast("decimal(18,6)")).cast("double")
                / F.sum(vol.cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               - p_retailprice * l_quantity * 0.1
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(YEAR(o_orderdate) AS INT)
    """,
    tags=("join", "multiway", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape: profit on 'red' product lines by supplier nation and
    order year (retailprice·qty·0.1 stands in for ps_supplycost — no
    partsupp table in the driver data). The LIKE filter prunes part before
    its small-side join (AQE-decided); only lineitem⋈orders shuffles."""
    part = table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(dec_sum(profit).alias("profit"))
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH part_value AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS value_dec
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey,
           CAST(ROUND(value_dec, 2) AS DOUBLE) AS part_value
    FROM part_value
    WHERE CAST(value_dec AS DOUBLE) >
          (SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.002 FROM part_value)
    """,
    tags=("agg", "having", "scalar-subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape: per-part traded value restricted to two supplier
    nations, keeping parts above a fraction of the GLOBAL total — a grouped
    aggregate reused twice (per-group and re-aggregated to one scalar that
    broadcasts back as a cross join). The shared aggregate is persisted so
    the fact scan + shuffle happens once, not once per consumer."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    part_value = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("value_dec")
        )
        .persist()
    )
    thresh = part_value.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.002)).alias("thresh")
    )
    out = (
        part_value.crossJoin(broadcast(thresh))
        .filter(F.col("value_dec").cast("double") > F.col("thresh"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("value_dec", 2).cast("double").alias("part_value"),
        )
    )
    return out


@register(
    "q12_late_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    tags=("join", "non-equi", "conditional-agg"),
)
def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: lines shipped ≥90 days after order placement
    (standing in for commit/receipt lateness), split into high/low priority
    counts per return flag. The orderkey equi-join carries the
    ``l_shipdate >= o_orderdate + 90d`` inequality as a residual; the IN
    filter and date range push to the lineitem scan."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
    tags=("join", "outer", "count-of-counts"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: distribution of orders-per-customer including the
    zero bucket — LEFT join with the priority exclusion INSIDE the join
    condition (so excluded customers still appear with count 0), COUNT of
    the nullable key, then a second aggregate over the counts. The second
    agg's input is one row per customer — cheap regardless of fact size."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("agg", "scalar-subquery", "view-over-agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: quarterly revenue per supplier, keep the max. The
    revenue aggregate is built once and persisted (it feeds both the MAX
    scalar and the equality filter — Catalyst does not CSE across subquery
    boundaries, see SCALE.md); revenue is rounded to cents in DECIMAL on
    both engines so the equality compares identical doubles."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
        .persist()
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 3, 5, 7)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "anti", "count-distinct"),
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape (lineitem as the part↔supplier association): distinct
    suppliers per part attribute combo, excluding a NOT IN supplier set —
    the exclusion is a small-side anti-join (the subquery is provably
    non-null here, so NOT IN ≡ anti-join without the null trap)."""
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 5, 7)
    )
    li = table(spark, sf_dir, "lineitem")
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad_supp, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_shippers",
    oracle="""
    SELECT s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_2', 'NATION_5')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 50)
    ORDER BY s_name
    """,
    tags=("join", "semi", "nested-in"),
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape: nested IN chains — suppliers in two nations who
    shipped >50 units of 'red…' parts in 1997. part IN-list → semi-join
    into lineitem, grouped HAVING → semi-join into supplier. Each IN level
    becomes one small-side semi-join (AQE-decided); nothing scans twice."""
    red_parts = table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red")
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    heavy = (
        li.join(red_parts, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_5")
    )
    return (
        supp.join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(heavy, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
    JOIN nation     ON s_nationkey = n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n_name IN ('NATION_1', 'NATION_4', 'NATION_6')
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("join", "semi", "anti", "self-join"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order (late ≙ shipped >60 days after order
    placement — the driver data carries no commit/receipt dates). The
    EXISTS is a semi self-join on orderkey with a suppkey-inequality
    residual; the NOT EXISTS is the same shape as an anti-join restricted
    to late lines. The fact is scanned once per role (l1 / l2 / l3) — at
    100 TB each probe side would be pre-filtered by the same order-status
    semi-join before shuffling on orderkey."""
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_4", "NATION_6")
    )
    orders_f = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem")

    late_cutoff = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .filter(F.col("l_shipdate") > late_cutoff)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .filter(F.col("l_shipdate") > late_cutoff)
        .select(
            F.col("l_orderkey").alias("y_orderkey"),
            F.col("l_suppkey").alias("y_suppkey"),
        )
    )
    sole_late = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.x_orderkey) & (l1.l_suppkey != l2.x_suppkey),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == l3.y_orderkey) & (l1.l_suppkey != l3.y_suppkey),
            "left_anti",
        )
    )
    return (
        sole_late.join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
