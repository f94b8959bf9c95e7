"""Snapshot reconciliation: row-level diff of two table versions.

The reference's loader reconciles incoming batches against the warehouse one
row at a time with ON CONFLICT upserts (`src/loader/service.py:259-806`);
at warehouse scale the complementary audit operator is a set-level diff of
two snapshots — what was added, removed, changed, unchanged — driving both
data-quality checks and incremental downstream refresh.

One full-outer join on the key, hash-compare on the tracked columns. The
compare hashes (xxhash64 over the column struct) are computed map-side, so
the shuffle carries key + 8-byte hash per side regardless of row width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Returns one row per key present in either snapshot:
    (*keys, status ∈ {added, removed, changed, unchanged}).

    ``compare_cols`` defaults to all non-key columns common to both sides.
    Wide rows cost nothing extra in the shuffle: each side reduces its
    tracked columns to one 64-bit hash before the join."""
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in set(keys)
        ]
    o = old.select(*keys, F.xxhash64(F.struct(*compare_cols)).alias("_old_h"))
    n = new.select(*keys, F.xxhash64(F.struct(*compare_cols)).alias("_new_h"))
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_old_h").isNull(), F.lit("added"))
        .when(F.col("_new_h").isNull(), F.lit("removed"))
        .when(F.col("_old_h") == F.col("_new_h"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("status"))
