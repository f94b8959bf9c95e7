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
replay.

History probe (the scale seam): the default ``history_probe="bucketed"``
maintains a band-partitioned sidecar (``<corpus>_fpidx``, see
``banded_index``) holding the pre-exploded (id, fp) pairs. A batch can
only share a fingerprint that the batch itself carries, so the probe reads
ONLY the band directories of the batch's own fingerprints — partition
pruning keeps every other band's files closed, and the per-batch explode
of the whole corpus is gone entirely (the index is exploded once, at
append time). ``history_probe="scan"`` keeps the pre-round-7 full-scan
path (re-explode stored ``wfps`` per batch — linear per batch, quadratic
over a backfill) for A/B measurement; ``tools/probe_scaling.py`` records
the walls of both at 1×/4×/16× accumulated history. The exact-dup
anti-join still reads the corpus ``fp`` column (one thin 16-byte column —
linear but ~1000× smaller than the wfps explode it replaced).

Crash consistency: corpus append commits first, index append second, so a
crash between the two can only leave the index MISSING rows for stored
docs (phantom index rows for unstored docs would make replays delete
fresh data). The replayed batch heals the gap: rows found byte-identical
in history get their missing (id, fp) pairs re-appended, pruned to the
batch's own bands.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import winnow_fingerprints
from .banded_index import BandedFingerprintIndex


def span_index_path(corpus_dir: str) -> str:
    return corpus_dir.rstrip("/") + "_fpidx"


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
    n_bands: int = 64,
    history_probe: str = "bucketed",
    max_doc_chars: int | None = None,
):
    """``docs`` is a streaming DataFrame. Appends to ``corpus_dir`` only
    rows that are neither exact duplicates nor duplicated-passage carriers
    (≥ ``min_shared`` shared winnowed fingerprints) of any previously
    stored row, carrying (fp, wfps) alongside the data. Size ``n_bands``
    well above the typical batch's distinct-fingerprint count at
    deployment scale (thousands); the default 64 suits test corpora.
    ``max_doc_chars`` is the long-doc skew guard passed through to
    ``winnow_fingerprints`` (fingerprint-set invariant, so corpora built
    with and without it are interchangeable)."""
    if history_probe not in ("bucketed", "scan"):
        raise ValueError(
            f"unknown history_probe {history_probe!r}: "
            f"expected 'bucketed' or 'scan'"
        )
    fp_index = BandedFingerprintIndex(
        span_index_path(corpus_dir), key_col="fp", n_bands=n_bands
    )
    # one-time per-stream index reconciliation flag. Meaning depends on
    # mode: bucketed — "index confirmed to exist (or was just migrated),
    # skip further existence stats"; scan — "any stale index has been
    # invalidated". Either way: non-empty = the mode's index state is
    # settled for this stream, don't redo the check per batch.
    idx_settled: list[bool] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # the family's shared null-safe fingerprint: null text must still
        # produce a joinable key, or the exact-dedup survivor semi-join
        # drops the row entirely and replay re-appends it
        from .incremental_dedup import fingerprint

        fresh = batch_df.dropDuplicates([id_col]).withColumn("fp", fingerprint(text_col))
        wf = winnow_fingerprints(
            fresh, id_col, text_col, k=k, w=w, max_doc_chars=max_doc_chars
        ).persist()
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
        use_index = history_probe == "bucketed"
        need_heal = False
        if not use_index and not idx_settled:
            # scan mode appends corpus rows WITHOUT maintaining any
            # existing index — a stale index would make a later bucketed
            # run miss duplicates forever (exists() would skip the
            # migration rebuild). Invalidate it so bucketed mode rebuilds.
            fp_index.invalidate(spark)
            idx_settled.append(True)
        if hist is not None and use_index:
            if not idx_settled:
                if not fp_index.exists(spark):
                    # pre-index corpus (older rounds / scan-mode runs):
                    # one-time migration build from the stored arrays
                    fp_index.build_from(
                        hist.select(
                            F.col(id_col).alias("id"), F.explode("wfps").alias("fp")
                        )
                    )
                idx_settled.append(True)
            # a surviving in-flight marker means a prior attempt died
            # inside the corpus→index window — only then is the heal
            # anti-join worth its cost (it sorts the pruned index slice)
            need_heal = fp_index.was_inflight(spark)
        # exact dedup: deterministic survivor (min id per fingerprint), then
        # the replay guard — anti-join against history's fp column
        keep = fresh.groupBy("fp").agg(F.min(F.col(id_col)).alias(id_col))
        fresh = fresh.join(keep, ["fp", id_col], "left_semi")
        replayed = None
        if hist is not None:
            # coalesce: pre-sentinel corpora hold fp=NULL for null text
            hkeys = hist.select(
                F.coalesce("fp", F.lit("null-text")).alias("fp"), F.col(id_col)
            )
            if need_heal:
                # TRUE replays (same id AND same bytes already stored): the
                # crashed attempt's rows may be missing index pairs —
                # capture them before the anti-join drops them
                replayed = fresh.join(hkeys, ["fp", id_col], "left_semi").select(
                    F.col(id_col).alias("id")
                )
            fresh = fresh.join(hkeys.select("fp"), "fp", "left_anti")
        # span dedup WITHIN the batch: lowest id of each pair wins
        live_fps = wf.join(fresh.select(F.col(id_col).alias("id")), "id", "left_semi")
        victims = _span_victims(live_fps, live_fps, id_col, min_shared, True)
        fresh = fresh.join(victims, id_col, "left_anti")
        # span dedup vs HISTORY
        if hist is not None:
            live_fps = wf.join(
                fresh.select(F.col(id_col).alias("id")), "id", "left_semi"
            )
            if use_index:
                heal_fps = (
                    wf.join(replayed, "id", "left_semi")
                    if replayed is not None
                    else None
                )
                probe_keys = live_fps.select("fp")
                if heal_fps is not None:
                    probe_keys = probe_keys.union(heal_fps.select("fp"))
                bands = fp_index.touched_bands(probe_keys)
                idx_rows = (
                    fp_index.read_bands(spark, bands) if bands else None
                )
                if idx_rows is not None:
                    hvictims = _span_victims(
                        live_fps, idx_rows, id_col, min_shared, False
                    )
                    fresh = fresh.join(hvictims, id_col, "left_anti")
                missing = None
                if heal_fps is not None:
                    if idx_rows is not None:
                        missing = heal_fps.join(
                            idx_rows, ["id", "fp"], "left_anti"
                        )
                    elif bands:
                        # none of the touched bands exist yet: every
                        # replayed row's pairs are missing by definition
                        missing = heal_fps
                if missing is not None and not missing.isEmpty():
                    fp_index.append(missing)
            else:
                hist_fps = hist.select(
                    F.col(id_col).alias("id"), F.explode("wfps").alias("fp")
                )
                hvictims = _span_victims(
                    live_fps, hist_fps, id_col, min_shared, False
                )
                fresh = fresh.join(hvictims, id_col, "left_anti")
        if use_index:
            fp_index.mark_inflight(spark)
        fresh.write.mode("append").parquet(corpus_dir)
        if use_index:
            # index append AFTER the corpus commit (crash ⇒ missing index
            # rows, healed on replay — never phantom rows)
            fp_index.append(
                wf.join(
                    fresh.select(F.col(id_col).alias("id")), "id", "left_semi"
                )
            )
            fp_index.clear_inflight(spark)
        cached.unpersist()
        wf.unpersist()

    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
