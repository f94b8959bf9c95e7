"""Modern SQL surface: recursive CTEs and lateral correlated subqueries.

Both run through the engine's SQL entry path (temp views + ``spark.sql``),
oracle-checked against DuckDB running equivalent SQL. Spark's recursion
(4.0+) accepts UNION ALL only — no fixpoint dedup — so the recursive query
here walks an ACYCLIC structure (each row derived exactly once); cyclic
reachability (dedup clusters) stays on the iterative operator path
(operators/cluster.py), whose DuckDB oracle does use a UNION fixpoint."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import table
from .catalog import register


@register(
    "recursive_cte_supplier_tree",
    oracle="""
    WITH RECURSIVE tree(suppkey, depth, path_bal) AS (
      SELECT s_suppkey, 0, s_acctbal FROM supplier WHERE s_suppkey = 1
      UNION ALL
      SELECT s.s_suppkey, t.depth + 1, t.path_bal + s.s_acctbal
      FROM supplier s JOIN tree t ON (s.s_suppkey >> 1) = t.suppkey
      WHERE s.s_suppkey > 1
    )
    SELECT depth,
           COUNT(*) AS n_nodes,
           ROUND(AVG(path_bal) + 0.000001, 2) AS avg_path_bal
    FROM tree
    GROUP BY depth
    """,
    tags=("sql", "recursive-cte"),
)
def recursive_cte_supplier_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native WITH RECURSIVE: walk the implicit binary tree over supplier
    keys (parent = suppkey >> 1), accumulating the root-path balance; roll
    up node count and average path balance per depth. Each recursion step is
    one join against the previous frontier — the engine materializes
    O(depth) = O(log n) iterations, exactly the iterated-join shape of the
    hand-written loops in operators/graph.py, but declared in SQL."""
    table(spark, sf_dir, "supplier").createOrReplaceTempView("rc_supplier")
    return spark.sql("""
        WITH RECURSIVE tree(suppkey, depth, path_bal) AS (
          SELECT s_suppkey, 0, s_acctbal FROM rc_supplier WHERE s_suppkey = 1
          UNION ALL
          SELECT s.s_suppkey, t.depth + 1, t.path_bal + s.s_acctbal
          FROM rc_supplier s JOIN tree t ON (s.s_suppkey >> 1) = t.suppkey
          WHERE s.s_suppkey > 1
        )
        SELECT depth,
               COUNT(*) AS n_nodes,
               ROUND(AVG(path_bal) + 0.000001, 2) AS avg_path_bal
        FROM tree
        GROUP BY depth
    """)


@register(
    "lateral_topn_per_region",
    oracle="""
    SELECT r.r_name, l.n_name, l.n_customers
    FROM region r, LATERAL (
      SELECT n_name, COUNT(*) AS n_customers
      FROM nation JOIN customer ON c_nationkey = n_nationkey
      WHERE n_regionkey = r.r_regionkey
      GROUP BY n_name
      ORDER BY n_customers DESC, n_name
      LIMIT 2
    ) l
    """,
    tags=("sql", "lateral"),
)
def lateral_topn_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: per region, the top-2 nations by
    customer count. Catalyst decorrelates this into the same
    aggregate+window plan the explicit row_number() formulation produces —
    the surface is what's being covered, not a new physical strategy."""
    table(spark, sf_dir, "region").createOrReplaceTempView("lt_region")
    table(spark, sf_dir, "nation").createOrReplaceTempView("lt_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("lt_customer")
    return spark.sql("""
        SELECT r.r_name, l.n_name, l.n_customers
        FROM lt_region r JOIN LATERAL (
          SELECT n_name, COUNT(*) AS n_customers
          FROM lt_nation JOIN lt_customer ON c_nationkey = n_nationkey
          WHERE n_regionkey = r.r_regionkey
          GROUP BY n_name
          ORDER BY n_customers DESC, n_name
          LIMIT 2
        ) l
    """)
