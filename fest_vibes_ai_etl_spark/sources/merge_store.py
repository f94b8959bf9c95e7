"""Exactly-once MERGE into partitioned parquet — no Delta required.

SURVEY §7.2 hard item (2): the reference gets upsert atomicity from Postgres
ON CONFLICT; plain parquet has no MERGE. The discipline that replaces it:

1. read ONLY the target partitions the source touches (partition pruning on
   the merge keys' partition column);
2. ``merge_coalesce`` those partitions with the source (idempotent);
3. dynamic-partition-overwrite the result — untouched partitions' files are
   never rewritten, and a re-run of the same source is a byte-identical
   no-op.

At 100 TB this is the difference between rewriting the table nightly and
rewriting only the dates that arrived. Failure mid-write is safe: dynamic
overwrite commits per-partition via the Hadoop committer, and re-running the
merge converges (idempotence is tested, not assumed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_coalesce


def merge_into_partitioned(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: Sequence[str],
    partition_col: str,
    coalesce_cols: Sequence[str] | None = None,
    overwrite_cols: Sequence[str] = (),
    keep_if_null_cols: Sequence[str] = (),
) -> None:
    """Upsert ``source`` into the parquet table at ``target_path``
    (partitioned by ``partition_col``) with merge_coalesce semantics,
    rewriting only the partitions present in the source.

    Invariant: a merge key must not move between partitions (an entity's
    partition value is part of its identity — true for the silver tables,
    where event_date is derived from the event's natural key). A key that
    changed partitions would leave its old row in an untouched partition."""
    touched = [r[0] for r in source.select(partition_col).distinct().collect()]

    from pyspark.errors import AnalysisException

    try:
        target = spark.read.parquet(target_path)
        target_slice = target.filter(F.col(partition_col).isin(touched))
        merged = merge_coalesce(
            target_slice,
            source,
            keys=keys,
            coalesce_cols=coalesce_cols,
            overwrite_cols=overwrite_cols,
            keep_if_null_cols=keep_if_null_cols,
        )
    except AnalysisException:  # first write — table doesn't exist yet
        merged = source

    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
