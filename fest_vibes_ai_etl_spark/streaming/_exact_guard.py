"""Shared exact-fingerprint replay-guard helpers for the incremental
dedup family (exact / span / near streams).

All three streams keep a ``<corpus>_exactidx`` sidecar — (id, fp,
fpk = xxhash64(fp)) rows banded on ``fpk`` (the exact stream stores the
fp-only variant) — so the per-batch "was this byte-identical text already
stored?" guard reads ONLY the batch's own fpk bands instead of the whole
corpus fp column. The helpers here are the family-shared pieces: the
sidecar's path convention, pair construction, the post-crash heal, and
the one-time per-stream index settlement. They live in their own module
(not in a stream) so no stream imports from a sibling stream — the
module hierarchy matches the data flow: streams → guard helpers →
``banded_index``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .banded_index import BandedIndexLayoutError
from .tombstones import NULL_TEXT_SENTINEL


def exact_index_path(corpus_dir: str) -> str:
    """The exact-fingerprint sidecar, shared by the span and near streams
    (same layout: (id, fp, fpk) banded on fpk); the exact stream uses the
    same path with an fp-only schema (distinct ``schema_tag``)."""
    return corpus_dir.rstrip("/") + "_exactidx"


def _fpk(col: str = "fp"):
    return F.xxhash64(F.col(col)).alias("fpk")


def _exact_pairs(df: DataFrame, id_col: str) -> DataFrame:
    """(id, fp, fpk) rows for the exact-dup sidecar. The fp is coalesced
    to the family's null-text sentinel so legacy corpora (fp=NULL rows)
    stay joinable after migration."""
    return df.select(
        F.col(id_col).alias("id"),
        F.coalesce("fp", F.lit(NULL_TEXT_SENTINEL)).alias("fp"),
    ).withColumn("fpk", F.xxhash64(F.col("fp")))


def _heal_exact_index(spark, exact_index, repl_pairs: DataFrame) -> None:
    """Post-crash heal of an ``_exactidx`` sidecar: re-append replayed
    rows' fingerprints the crashed attempt never got to write.
    ``repl_pairs`` carries the sidecar's full schema (..., fp, fpk); the
    anti-join keys on every non-fpk column, so an fpk collision can't
    mask a genuinely-missing row."""
    keys = [c for c in repl_pairs.columns if c != "fpk"]
    ebands = exact_index.touched_bands(repl_pairs.select("fpk"))
    erows = exact_index.read_bands(spark, ebands) if ebands else None
    missing = (
        repl_pairs.join(erows, keys, "left_anti")
        if erows is not None
        else (repl_pairs if ebands else None)
    )
    if missing is not None and not missing.isEmpty():
        exact_index.append(missing)


def _settle_indexes(spark, idx_builders, idx_settled) -> None:
    """One-time (per stream) index reconciliation: validate each index's
    persisted layout, invalidating + rebuilding from the corpus on a
    mismatch (the corpus is authoritative; probing across a layout
    mismatch silently admits duplicates), and migration-building any
    index that doesn't exist yet."""
    if idx_settled:
        return
    for idx, build_pairs in idx_builders:
        try:
            present = idx.exists(spark)
        except BandedIndexLayoutError:
            idx.invalidate(spark)
            present = False
        if not present:
            idx.build_from(build_pairs())
    idx_settled.append(True)
