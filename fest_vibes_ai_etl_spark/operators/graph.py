"""Iterative graph algorithms over edge-list DataFrames.

The reference stores one graph relationally — the artist self-relation edge
list (`src/shared/db/models/relationships.py:17-53`) — and only ever walks
it one hop (related-artist names in the cache query). At engine scale the
useful extensions are whole-graph iterative algorithms; connected
components lives in `operators/cluster.py` (dedup clusters), and this
module adds PageRank — importance scoring over e.g. a customer–supplier
interaction graph.

Scale design: the per-iteration step is one join (edges ⋈ current ranks on
src) + one aggregation (sum contributions by dst) — both shuffle on node
keys, and AQE handles the hub-node skew. The edge+degree table is
loop-invariant, so it is persisted once; ranks are the only thing that
iterates. For deep iteration counts, localCheckpoint the rank table every
few rounds to cut lineage growth (same discipline as cluster.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 8,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Unnormalized PageRank (pr = (1-d) + d·Σ pr_in/deg_in) over a directed
    edge list (src, dst). Callers wanting the undirected variant symmetrize
    first; with a symmetrized graph every node has out-degree ≥ 1, so there
    is no dangling-mass correction to apply. Returns (node, pr).

    The edge+degree table is the loop invariant: it is persisted once and
    every other table (initial ranks included) derives from the cached copy,
    so the upstream edge construction runs exactly once. With
    ``broadcast_ranks`` the per-iteration join ships the rank table (one row
    per node — orders of magnitude smaller than the edges) to the executors
    and the big edge table never moves; the only shuffle per iteration is the
    map-side-combined contribution sum. Leave it False when #nodes is too
    large to broadcast (beyond ~100M nodes); the join then shuffles on the
    node key and AQE picks the strategy."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e = (
        edges.join(deg, "src")
        .select("src", "dst", "d")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pr = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("pr")
    )
    for i in range(iterations):
        rhs = F.broadcast(pr) if broadcast_ranks else pr
        contrib = e.join(rhs, e["src"] == rhs["node"]).select(
            "dst", (F.col("pr") / F.col("d")).alias("c")
        )
        pr = contrib.groupBy("dst").agg(
            (F.lit(1.0 - damping) + F.lit(damping) * F.sum("c")).alias("pr")
        ).select(F.col("dst").alias("node"), "pr")
        if (i + 1) % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=True)
    return pr
