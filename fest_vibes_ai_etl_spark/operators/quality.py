"""Declarative data-quality checks over DataFrames — the assertion layer the
reference enforces with Postgres constraints (unique indexes, FKs:
`src/shared/db/database.py:151-199`). A lakehouse has no enforcing engine,
so constraints become *audit jobs*: each check reduces to a count of
violating rows, and the report is a union of tiny aggregates.

Every check is one aggregation (or one join for referential checks) —
nothing materializes violating rows unless the caller asks (``violations``
returns the offending rows for quarantine, same P8 pattern as
pipeline/normalize.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_not_null(df: DataFrame, table: str, cols: list[str]) -> DataFrame:
    """One row per column: (check, target, n_violations)."""
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(c)
        for c in cols
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{table}.{c}', {c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) as (target, n_violations)"
    ).select(F.lit("not_null").alias("check"), "target", "n_violations")


def check_unique(df: DataFrame, table: str, keys: list[str]) -> DataFrame:
    """Rows beyond the first per key value (0 when the key is unique)."""
    dups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("n_violations"))
    )
    return dups.select(
        F.lit("unique").alias("check"),
        F.lit(f"{table}({', '.join(keys)})").alias("target"),
        "n_violations",
    )


def check_referential(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, label: str
) -> DataFrame:
    """Orphan child rows whose FK has no parent (left_anti + count). The
    parent side is keys-only and deduplicated, so it broadcasts for any
    realistic dimension."""
    orphans = (
        child.select(F.col(fk))
        .filter(F.col(fk).isNotNull())
        .join(F.broadcast(parent.select(F.col(pk).alias(fk)).distinct()), fk, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )
    return orphans.select(
        F.lit("referential").alias("check"),
        F.lit(label).alias("target"),
        "n_violations",
    )


def check_expression(df: DataFrame, table: str, name: str, pred: Column) -> DataFrame:
    """Rows violating an arbitrary row predicate (pred = the VALID condition)."""
    return (
        df.agg(F.sum(F.when(~pred, 1).otherwise(0)).cast("long").alias("n_violations"))
        .select(
            F.lit("expression").alias("check"),
            F.lit(f"{table}: {name}").alias("target"),
            F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        )
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union of check results — one audit row per declared constraint."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out
