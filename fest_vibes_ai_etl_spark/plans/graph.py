"""Graph query: PageRank over the customer–supplier interaction graph.

The oracle is the same fixed number of iterations unrolled into chained SQL
CTEs (generated below, so Spark loop and SQL unrolling can never drift).
Both engines do the identical arithmetic (pr/deg sums, d·Σ + (1-d)), so the
epsilon-rounded scores hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_div
from ..operators.graph import pagerank
from ..sources import table
from .catalog import register

ITERATIONS = 3
DAMPING = 0.85
TOPN = 25


def _oracle() -> str:
    prev = "pr0"
    iters = []
    for i in range(1, ITERATIONS + 1):
        iters.append(
            f"""pr{i} AS (
      SELECT e.dst AS node,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
               + CAST(0.85 AS DOUBLE) * SUM(p.pr / d.d) AS pr
      FROM edges e
      JOIN {prev} p ON e.src = p.node
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    )"""
        )
        prev = f"pr{i}"
    chain = ",\n    ".join(iters)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    pr0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS pr FROM deg),
    {chain},
    top AS (
      SELECT node, ROUND(pr + 0.00000001, 4) AS score
      FROM {prev}
      ORDER BY score DESC, node
      LIMIT {TOPN}
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
                ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
           score
    FROM top
    ORDER BY score DESC, node
    """


@register(
    "graph_pagerank_suppliers",
    oracle=_oracle(),
    tags=("graph", "iterative", "pagerank"),
    bench=True,
)
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized customer–supplier graph (edge =
    customer ordered a part this supplier shipped), 3 iterations, top-25.
    Per iteration: one node-keyed join + one aggregation; the edge+degree
    table is loop-invariant and persisted once (Catalyst does not CSE
    across iterations — same discipline as the connected-components loop).
    Nodes are packed into one long (custkey·2 / suppkey·2+1) so the edge
    distinct and every iteration shuffle hash 8-byte keys, not strings —
    the readable 'c…'/'s…' label is decoded only for the 25 survivors."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # pairs feeds both union branches of the symmetrized edge list AND the
    # degree aggregate inside pagerank() — four subtree references Catalyst
    # recomputes without an explicit persist (no cross-join-side CSE).
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
        .persist()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    pr = pagerank(edges, iterations=ITERATIONS, damping=DAMPING)
    top = (
        pr.select("node", round_div(F.col("pr"), 4).alias("score"))
        .orderBy(F.desc("score"), "node")
        .limit(TOPN)
    )
    return top.select(
        F.concat(
            F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
            (F.col("node") / 2).cast("long").cast("string"),
        ).alias("node"),
        "score",
    ).orderBy(F.desc("score"), "node")
