"""Skyline (pareto frontier) operator — 2-D dominance without O(n²).

The classic formulation ("rows no other row dominates") is a correlated
NOT EXISTS — a quadratic nested loop. For the 2-D case (minimize one axis,
maximize the other) the frontier has a sweep-line characterization that
Spark can execute as two hash aggregates plus a prefix max:

  a row (x, y) is on the frontier  ⇔  y = max{y' : x' = x}        (best at
                                       its own x)
                                   ∧  y > max{y' : x' < x}        (strictly
                                       better than everything cheaper)

The prefix max over distinct x values is computed scalably with the same
range-partition + per-partition-offset trick as
``operators.trainprep.global_positions``: no single-partition window over
the data, only a #partitions-row window on the driver-sized offsets table.
At 100 TB the cost is one groupBy(x) shuffle + one range repartition of the
*distinct-x* table (≪ input) + one shuffle join back on x.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Rows of ``df`` not dominated on (minimize ↓, maximize ↑).

    Dominance: q dominates p iff q.min ≤ p.min ∧ q.max ≥ p.max with at
    least one strict. Ties on both axes keep all tied rows (neither
    dominates the other).
    """
    x, y = minimize, maximize
    g = df.groupBy(x).agg(F.max(y).alias("_gmax"))

    keyed = g.repartitionByRange(F.col(x)).sortWithinPartitions(x)
    parts = keyed.withColumn("_pid", F.spark_partition_id())
    w_in = Window.partitionBy("_pid").orderBy(x).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # Feeds both the offsets aggregate and the bounds join — Catalyst does
    # not CSE shared subtrees across join sides, so persist the (distinct-x
    # sized, small) table rather than re-running the groupBy from the scan.
    with_prev = parts.withColumn(
        "_prev_in_part", F.max("_gmax").over(w_in)
    ).persist()

    # Exclusive prefix max across partitions: #partitions rows, broadcast.
    w_pid = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        with_prev.groupBy("_pid")
        .agg(F.max("_gmax").alias("_pmax"))
        .withColumn("_before", F.max("_pmax").over(w_pid))
        .select("_pid", "_before")
    )

    bounds = (
        with_prev.join(F.broadcast(offsets), "_pid")
        # greatest() ignores NULLs, so the first row of the first partition
        # (no cheaper x anywhere) keeps a NULL bound → "no dominator".
        .withColumn("_cummax_lt", F.greatest("_before", "_prev_in_part"))
        .select(x, "_gmax", "_cummax_lt")
    )

    cond: Column = (F.col(y) == F.col("_gmax")) & (
        F.col("_cummax_lt").isNull() | (F.col(y) > F.col("_cummax_lt"))
    )
    return df.join(bounds, x).where(cond).drop("_gmax", "_cummax_lt")
