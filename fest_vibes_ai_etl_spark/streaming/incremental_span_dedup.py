"""Incremental SUBSTRING-level dedup against everything ever ingested.

The winnowing upgrade of ``incremental_near_dedup``: new documents are
dropped not only when byte-identical to history but when they share a
duplicated PASSAGE (≥ ``min_shared`` winnowed fingerprints ⇒ a common
substring of roughly ≥ w + k − 1 characters) with ANY stored document —
the cross-batch version of ``dedup.duplicate_span_pairs``, i.e. the
streaming form of Lee-et-al-2022-style substring dedup.

State = the corpus itself, the family's replay-convergence design: each
stored row carries its exact fingerprint (``fp``, md5) and its winnowed
fingerprint set (``wfps`` array<long>, expected density 2/(w+1) of the
gram count). A replayed batch finds its own rows byte-identical in
history (fp anti-join) and appends nothing — convergence does NOT depend
on the span rule, so even fingerprint-poor short docs can't duplicate on
replay. Probing history reads only (doc_id, wfps) — parquet column
pruning keeps the text column untouched — and explodes to the same
(id, fp) shape the batch side has; at 100 TB the corpus would be written
bucketed by a winnow-fingerprint band so the probe join is bucket-local.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import winnow_fingerprints


def _span_victims(
    batch_fps: DataFrame,
    other_fps: DataFrame,
    id_col: str,
    min_shared: int,
    self_pairs_ordered: bool,
) -> DataFrame:
    """Batch ids sharing ≥ min_shared fingerprints with the other side.
    ``self_pairs_ordered=True`` restricts to a.id > b.id (within-batch:
    lowest id of each pair wins, matching the near-dup family's rule)."""
    a = batch_fps.select(F.col("id").alias("a_id"), "fp")
    b = other_fps.select(F.col("id").alias("b_id"), "fp")
    cond = F.col("a_id") > F.col("b_id") if self_pairs_ordered else F.lit(True)
    return (
        a.join(b, "fp")
        .filter(cond)
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select(F.col("a_id").alias(id_col))
        .distinct()
    )


def start_incremental_span_dedup(
    docs: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    w: int = 15,
    min_shared: int = 3,
    available_now: bool = True,
):
    """``docs`` is a streaming DataFrame. Appends to ``corpus_dir`` only
    rows that are neither exact duplicates nor duplicated-passage carriers
    (≥ ``min_shared`` shared winnowed fingerprints) of any previously
    stored row, carrying (fp, wfps) alongside the data."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # the family's shared null-safe fingerprint: null text must still
        # produce a joinable key, or the exact-dedup survivor semi-join
        # drops the row entirely and replay re-appends it
        from .incremental_dedup import fingerprint

        fresh = batch_df.dropDuplicates([id_col]).withColumn("fp", fingerprint(text_col))
        wf = winnow_fingerprints(fresh, id_col, text_col, k=k, w=w).persist()
        wfps = wf.groupBy("id").agg(F.array_sort(F.collect_list("fp")).alias("wfps"))
        # keep a handle to the persisted frame itself: unpersist() requires
        # the SAME plan (uncacheQuery is sameResult-based), and `fresh` is
        # reassigned through joins below — unpersisting the derived frame
        # would silently leak one cache entry per micro-batch
        cached = (
            fresh.join(wfps.withColumnRenamed("id", id_col), id_col, "left")
            .withColumn("wfps", F.coalesce(F.col("wfps"), F.array().cast("array<long>")))
            .persist()
        )
        fresh = cached
        fresh.count()
        try:
            hist = spark.read.parquet(corpus_dir)
        except AnalysisException as exc:
            # ONLY PATH_NOT_FOUND is a legitimate first batch; an existing-
            # but-unreadable corpus (UNABLE_TO_INFER_SCHEMA etc.) must
            # propagate or every history check is silently skipped.
            from ..errors import is_path_not_found

            if not is_path_not_found(exc):
                raise
            hist = None
        # exact dedup: deterministic survivor (min id per fingerprint), then
        # the replay guard — anti-join against history's fp column
        keep = fresh.groupBy("fp").agg(F.min(F.col(id_col)).alias(id_col))
        fresh = fresh.join(keep, ["fp", id_col], "left_semi")
        if hist is not None:
            # coalesce: pre-sentinel corpora hold fp=NULL for null text
            fresh = fresh.join(
                hist.select(F.coalesce("fp", F.lit("null-text")).alias("fp")),
                "fp",
                "left_anti",
            )
        # span dedup WITHIN the batch: lowest id of each pair wins
        live_fps = wf.join(fresh.select(F.col(id_col).alias("id")), "id", "left_semi")
        victims = _span_victims(live_fps, live_fps, id_col, min_shared, True)
        fresh = fresh.join(victims, id_col, "left_anti")
        # span dedup vs HISTORY: probe the stored wfps (column-pruned scan)
        if hist is not None:
            hist_fps = hist.select(
                F.col(id_col).alias("id"), F.explode("wfps").alias("fp")
            )
            live_fps = wf.join(
                fresh.select(F.col(id_col).alias("id")), "id", "left_semi"
            )
            hvictims = _span_victims(live_fps, hist_fps, id_col, min_shared, False)
            fresh = fresh.join(hvictims, id_col, "left_anti")
        fresh.write.mode("append").parquet(corpus_dir)
        cached.unpersist()
        wf.unpersist()

    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
