"""Shuffle-pruned top-k per group.

The textbook ``row_number() OVER (PARTITION BY g ORDER BY v) <= k`` shuffles
EVERY row to its group's reducer and sorts there. But top-k is partially
computable: a row that isn't in its group's top-k within its own input
partition can't be in the global top-k. Pre-pruning map-side caps the
shuffle at k·|groups|·|partitions| rows — on a 100 TB fact with thousands
of rows per (group, partition), orders of magnitude less traffic for the
same exact answer.

Spark has no partial-aggregate hook for window functions, so the prune is
one Arrow-batched pass (mapInPandas over each input partition); the final
exact ranking stays the ordinary window. Determinism comes from the same
total order (value desc, then id) applied in both phases."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    k: int,
    prune: bool = True,
) -> DataFrame:
    """Exact top-k rows per group by (order_col DESC, id_col ASC). With
    ``prune`` (default) a map-side pass drops rows that already lose within
    their own partition; the result is identical, only the shuffle shrinks."""
    out = df
    if prune:
        cols = df.columns
        gcols = list(group_cols)

        def local_prune(batches):
            for pdf in batches:
                if pdf.empty:
                    yield pdf
                    continue
                ranked = pdf.sort_values(
                    [*gcols, order_col, id_col],
                    ascending=[True] * len(gcols) + [False, True],
                    kind="mergesort",
                )
                yield ranked.groupby(gcols, sort=False).head(k)[cols]

        out = df.mapInPandas(local_prune, schema=df.schema)
    w = Window.partitionBy(*group_cols).orderBy(F.desc(order_col), F.asc(id_col))
    return (
        out.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*df.columns, "rk")
    )
