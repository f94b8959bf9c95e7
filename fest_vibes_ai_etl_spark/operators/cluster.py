"""Duplicate-cluster resolution: connected components over near-dup pairs.

Pairwise dedup (dedup.py) emits edges; choosing ONE survivor per duplicate
*group* requires the transitive closure — connected components. Implemented
as iterative min-label propagation (label = smallest doc id reachable):

    labels ← id
    repeat: label[v] ← min(label[v], min over neighbors' labels)
    until no label changes

Each iteration is two hash joins + a groupBy — all distributed; the driver
only checks the convergence counter (O(diameter) iterations, and near-dup
graphs have tiny diameters in practice). This is the standard large-graph
CC formulation (the GraphFrames-free version); `localCheckpoint` per round
keeps the plan from growing exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, a_col: str = "a_id", b_col: str = "b_id", max_iter: int = 20
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component is
    the minimum node id in the connected component."""
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        # Materialize once: sym is joined every iteration, and without the
        # checkpoint each round re-executes the whole upstream edge pipeline
        # (for near-dup dedup that's the full candidate join) — measured as
        # the dominant cost of cluster dedup, not the CC math itself.
        .localCheckpoint()
    )
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_component"), F.col("component")) < F.col("component")).alias(
                    "__changed"
                ),
            )
        )
        updated = updated.localCheckpoint()  # truncate lineage per round
        n_changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    return labels


def dedup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Keep one row per duplicate cluster (the minimum id — matching the
    reference's first-wins identity rule) plus all non-duplicated rows."""
    comp = connected_components(pairs)
    victims = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(victims, id_col, "left_anti")
