"""Merge/upsert engine — the reference's ON CONFLICT semantics, set-oriented.

The reference does row-at-a-time Postgres upserts (J1-J4,
/root/reference/src/loader/service.py:259-806). Here the same semantics are a
single distributed plan: full-outer join on the natural key + per-column
COALESCE. Idempotent by construction (merge of identical source twice ≡ once),
which replaces the reference's deadlock-retry machinery (O4) entirely.

At scale: the join shuffles both sides on the key once; if the target is
bucketed by the key the shuffle is one-sided. New-key surrogate IDs are
``xxhash64`` of the natural key — deterministic across retries, unlike
``monotonically_increasing_id``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def surrogate_key(*natural_key_cols) -> F.Column:
    """Deterministic 64-bit surrogate key from the natural key (stable across
    runs/retries; collision probability negligible at catalog-dim scale)."""
    return F.xxhash64(*natural_key_cols)


def merge_coalesce(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    coalesce_cols: Sequence[str] | None = None,
    overwrite_cols: Sequence[str] = (),
    keep_if_null_cols: Sequence[str] = (),
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys`` with the reference's
    column semantics (J2, /root/reference/src/loader/service.py:348-351):

    - ``coalesce_cols``   — new value unless null, else keep old (default for
      all shared non-key columns)
    - ``overwrite_cols``  — always take the source value when the source row
      exists (reference J3 lat/lon/flags overwrite)
    - ``keep_if_null_cols`` — only fill when target value is null (reference
      J4: event description filled only if previously null)
    """
    coalesce_cols = list(
        coalesce_cols
        if coalesce_cols is not None
        else [c for c in source.columns if c in target.columns and c not in keys]
    )
    t = target.alias("t")
    s = source.alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    src_exists = F.col(f"s.{keys[0]}").isNotNull()

    by_name: dict[str, F.Column] = {}
    for k in keys:
        by_name[k] = F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k)
    for c in set(target.columns) | set(source.columns):
        if c in keys:
            continue
        in_t, in_s = c in target.columns, c in source.columns
        if not in_s:
            by_name[c] = F.col(f"t.{c}").alias(c)
        elif not in_t:
            by_name[c] = F.col(f"s.{c}").alias(c)
        elif c in overwrite_cols:
            by_name[c] = F.when(src_exists, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        elif c in keep_if_null_cols:
            by_name[c] = F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c)
        else:  # coalesce-merge default
            by_name[c] = F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
    # Deterministic column order: keys first, then sorted remainder.
    ordered = list(keys) + sorted(set(by_name) - set(keys))
    return joined.select(*[by_name[c] for c in ordered])


def get_or_create(
    dim: DataFrame, new_rows: DataFrame, key_cols: Sequence[str], id_col: str
) -> DataFrame:
    """Reference J1 genre get-or-create (/root/reference/src/loader/
    service.py:259-322): append rows whose natural key is absent, with a
    deterministic surrogate id. Existing rows (and their ids) are untouched."""
    missing = new_rows.dropDuplicates(list(key_cols)).join(
        dim.select(*key_cols), list(key_cols), "left_anti"
    )
    missing = missing.withColumn(id_col, surrogate_key(*[F.col(c) for c in key_cols]))
    return dim.unionByName(missing.select(*dim.columns), allowMissingColumns=False)


def replace_associations(
    bridge: DataFrame, new_pairs: DataFrame, entity_key: str
) -> DataFrame:
    """Reference J5 bridge refresh (/root/reference/src/loader/
    service.py:424-512): for every entity present in ``new_pairs``, replace
    its association rows wholesale; other entities' rows are untouched.
    Set-oriented: anti-join out the touched entities, union the new pairs."""
    touched = new_pairs.select(entity_key).distinct()
    kept = bridge.join(touched, entity_key, "left_anti")
    return kept.unionByName(new_pairs.dropDuplicates(bridge.columns).select(*bridge.columns))


def first_wins(df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]) -> DataFrame:
    """Order-defined first-wins dedup (reference P12 seen_urls / unique-index
    DO-NOTHING, made deterministic via row_number)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
