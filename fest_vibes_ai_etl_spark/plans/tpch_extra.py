"""Decision-support query shapes beyond the core suite — subqueries,
disjunctive predicates, multi-cube grouping, unpivot, multiset set-ops.

These complete the relational surface a user of the reference engine's data
model would expect from a warehouse-grade engine (SURVEY §2.3-§2.6 declares
the capability classes; the core suite in relational.py covers the common
shapes, this module the planner-hard ones): correlated EXISTS / scalar
subqueries (decorrelated by Catalyst into semi / broadcast joins), HAVING
over an aggregated subquery, OR-of-ANDs join predicates, CUBE with
grouping_id, UNPIVOT, EXCEPT ALL. All oracle-checked against DuckDB on the
driver tables, all written scale-first (filter-before-join, small sides
broadcast, aggregation declared partial-aggregable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.rounding import dec_sum, round_div
from ..sources import table
from .catalog import register


@register(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "subquery"),
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: correlated EXISTS with an extra non-equi correlation
    (l_shipdate > o_orderdate) → left-semi join on key + inequality, then
    count per priority. The date filter prunes the probe side pre-join."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           CAST(ROUND(SUM(CAST(volume AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(YEAR(l_shipdate) AS INT) AS yr,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                        JOIN orders   ON o_orderkey = l_orderkey
                        JOIN customer ON c_custkey = o_custkey
                        JOIN nation n1 ON s_nationkey = n1.n_nationkey
                        JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY supp_nation, cust_nation, yr
    """,
    tags=("join", "multiway", "disjunctive"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bilateral trade volume between a nation pair by year.
    Both nation dims broadcast; the pair predicate is an OR across the two
    join branches, kept above the joins so each equi-join stays planar."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q10_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name AS nation,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: lost revenue from returned items, top-20 customers.
    Return-flag and date filters reach the scans; top-20 is
    TakeOrderedAndProject (no global sort)."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_ratio",
    oracle="""
    SELECT CAST(ROUND(
             100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             + 0.00000001, 4) AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("join", "agg", "ratio"),
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: promo revenue share for one month — conditional
    aggregate ratio over a fact⋈dim join (part broadcasts). Both sums
    accumulate in DECIMAL so the ratio is bit-stable across engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_vol = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            round_div(
                100.0
                * F.sum(promo_vol.cast("decimal(18,6)")).cast("double")
                / F.sum(vol.cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "q17_small_quantity_avg",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#3'
      AND l1.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                           WHERE l2.l_partkey = l1.l_partkey)
    """,
    tags=("join", "subquery", "scalar-subquery"),
)
def q17_small_quantity_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate + join — the scale-correct plan:
    the per-part avg is a partial-aggregable groupBy, and only Brand#3 parts
    survive to the join (filter pushed below both join inputs).

    The quantity threshold compares against 0.5·avg(integer-valued doubles):
    exactly representable halves, so no cross-engine rounding hazard."""
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = table(spark, sf_dir, "lineitem")
    brand_li = li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
    part_avg = (
        brand_li.groupBy(F.col("l_partkey").alias("avg_pk"))
        .agg((F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty"))
    )
    return (
        brand_li.join(part_avg, F.col("l_partkey") == F.col("avg_pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) / 7.0, 2))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           ROUND(o_totalprice, 2)    AS total_price,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY total_price DESC, o_orderkey
    LIMIT 20
    """,
    tags=("join", "agg", "having", "subquery"),
    bench=True,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: IN over a HAVING-filtered aggregate → semi-join
    against the aggregated keys. The heavy lineitem groupBy happens once and
    its survivors (few) broadcast into the enrichment joins."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 35)
    """,
    tags=("join", "disjunctive"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: OR-of-ANDs mixing both join sides. The equi-key
    (partkey) still drives a hash join; the disjunction evaluates as the
    join's residual condition. Single-side conjuncts (brand IN, qty range)
    are derivable by the optimizer as pushed scan filters."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 15)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 25)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(20, 35)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q22_idle_balance",
    oracle="""
    WITH thresh AS (
      SELECT ROUND(AVG(c_acctbal) + 0.000001, 2) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT SUBSTRING(c_name, 10, 2) AS code,
           COUNT(*) AS n_custs,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer, thresh
    WHERE c_acctbal > thresh.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY SUBSTRING(c_name, 10, 2)
    """,
    tags=("join", "anti", "scalar-subquery"),
)
def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: uncorrelated scalar subquery (global avg balance,
    rounded to cents on both engines so double summation order can't flip
    boundary rows) broadcast as a 1-row cross join, then anti-join against
    orders, grouped by a customer-id code prefix."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    thresh = cust.filter(F.col("c_acctbal") > 0.0).agg(
        round_div(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    return (
        cust.crossJoin(broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("code"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube", "grouping"),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims with grouping_id — all 4 grouping sets in one pass
    (Spark expands the sets map-side; no rescan per set)."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


@register(
    "unpivot_flag_measures",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             ROUND(SUM(l_quantity), 2)      AS sum_qty,
             ROUND(SUM(l_extendedprice), 2) AS sum_price,
             ROUND(SUM(l_discount), 2)      AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
    """,
    tags=("unpivot", "agg"),
)
def unpivot_flag_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): per-flag measures melted to (measure, value)
    rows — Spark's native unpivot, no UNION-of-scans."""
    agg = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.sum("l_discount"), 2).alias("sum_disc"),
        )
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "setop_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop", "multiset"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (bag semantics; preserves
    multiplicity, unlike setop_except's distinct semantics)."""
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.exceptAll(supp)


@register(
    "grouping_sets_status_segment",
    oracle="""
    SELECT o_orderstatus, c_mktsegment,
           CAST(GROUPING(o_orderstatus, c_mktsegment) AS INT) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((o_orderstatus), (c_mktsegment), ())
    """,
    tags=("agg", "grouping-sets", "sql"),
)
def grouping_sets_status_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither ROLLUP nor CUBE) via the engine's SQL
    entry path — two independent 1-dim breakdowns plus the grand total in one
    pass over the join, each set tagged by grouping_id."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    return spark.sql("""
        SELECT o_orderstatus, c_mktsegment,
               CAST(grouping_id() AS INT) AS gid,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM gs_orders LEFT JOIN gs_customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((o_orderstatus), (c_mktsegment), ())
    """)
