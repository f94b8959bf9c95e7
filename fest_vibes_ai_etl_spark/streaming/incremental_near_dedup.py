"""Incremental NEAR-dup dedup against everything ever ingested.

The training-corpus upgrade of ``incremental_dedup``: new documents are
dropped not only when byte-identical to history but when their n-gram
Jaccard similarity to ANY stored document reaches the threshold — the
cross-batch version of ``dedup.minhash_lsh_exact_pairs`` (sketch selects,
true metric decides).

State = the corpus itself. Each stored row carries its MinHash signature
(``sig``, num_hashes longs) and its shingle-set signature (``sh`` sorted
hashes + ``n``), so probing history is:

  batch bands  ⋈  history bands → candidate (batch_id, hist_id) pairs
      → exact Jaccard from the two shingle arrays
      → drop batch docs with J ≥ threshold

No second state store to race with the data write, so replay is convergent
by construction: a replayed batch finds its own rows in history at J = 1
and appends nothing.

History probe (the scale seam): the default ``history_probe="bucketed"``
maintains TWO band-partitioned sidecars (see ``banded_index``):

- ``<corpus>_bandidx`` — the pre-computed (id, band, band_hash) LSH rows,
  partitioned by ``pmod(band_hash, n_buckets)``. A batch can only collide
  on band hashes the batch itself carries, so candidate generation reads
  ONLY those partitions — no per-batch re-derivation of every stored
  signature. The exact-Jaccard verify then reads (id, sh, n) from the
  corpus semi-joined by the candidate ids — and is launched only when the
  candidate join is non-empty (an explicit gate: AQE, whose
  empty-relation propagation would otherwise skip the scan, is disabled
  inside micro-batch plans).
- ``<corpus>_exactidx`` — (id, fp, fpk = xxhash64(fp)) rows banded on
  ``fpk``, serving the EXACT-dup replay guard. Pre-round-8 this guard
  scanned the corpus's whole (fp, id) columns every micro-batch — the
  one linear-per-batch component left after the band index landed.
  Bucketed, it reads only the batch's own fpk bands; the anti-join still
  compares the full md5 string, so an fpk collision costs extra rows
  read, never a wrong drop.

Both sidecars persist their layout (``_meta.json``); a restart with
different banding parameters is detected and the stream invalidates +
rebuilds from the corpus instead of probing a wrong subset.
``history_probe="scan"`` keeps the pre-round-7 path (re-derive band
hashes from all stored ``sig`` arrays per batch) for A/B measurement in
``tools/probe_scaling.py``.

Crash consistency mirrors the span variant: one in-flight marker
brackets the corpus append and BOTH index appends; a surviving marker
makes the replayed batch fall back to the authoritative corpus fp scan
and heal both sidecars. Maintenance likewise: every ``maintain_every``
batches, bands holding more than ``maintain_max_files`` files are
compacted per-band (untouched bands' files are never rewritten).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .banded_index import BandedFingerprintIndex
from .incremental_span_dedup import (
    _exact_pairs,
    _fpk,
    _heal_exact_index,
    _settle_indexes,
    exact_index_path,
)


def near_index_path(corpus_dir: str) -> str:
    return corpus_dir.rstrip("/") + "_bandidx"


def _with_signatures(df: DataFrame, id_col: str, text_col: str,
                     k: int, num_hashes: int) -> DataFrame:
    """Attach (fp, sig, sh, n) to every row. Docs too short to shingle
    (< k tokens) carry empty sig/sh and fall back to exact-only dedup."""
    from ..operators.dedup import minhash_signatures, shingle_signature

    # the family's shared null-safe fingerprint (one sentinel convention
    # across all three incremental-dedup corpora)
    from .incremental_dedup import fingerprint

    base = df.withColumn("fp", fingerprint(text_col))
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes).withColumnRenamed(
        "id", id_col
    )
    sh = shingle_signature(df, id_col, text_col, k).withColumnRenamed("id", id_col)
    return (
        base.join(sigs, id_col, "left")
        .join(sh, id_col, "left")
        .withColumn("sig", F.coalesce("sig", F.array().cast("array<bigint>")))
        .withColumn("sh", F.coalesce("sh", F.array().cast("array<bigint>")))
        .withColumn("n", F.coalesce("n", F.lit(0)))
    )


def _band_hashes(sig_df: DataFrame, id_col: str, num_hashes: int, bands: int) -> DataFrame:
    rows = num_hashes // bands
    return sig_df.filter(F.size("sig") > 0).select(
        F.col(id_col).alias("bid"),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.slice("sig", i * rows + 1, rows).cast("string"))
                    for i in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )


def _verified_victims(
    cand: DataFrame,
    probe: DataFrame,
    target_sh: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Probe ids among the candidate pairs whose EXACT Jaccard reaches the
    threshold (sketch selects, true metric decides)."""
    ps = probe.select(
        F.col(id_col).alias("p_id"), F.col("sh").alias("sh_p"), F.col("n").alias("n_p")
    )
    ts = target_sh.select(
        F.col(id_col).alias("t_id"), F.col("sh").alias("sh_t"), F.col("n").alias("n_t")
    )
    inter = F.size(F.array_intersect("sh_p", "sh_t"))
    return (
        cand.join(ps, "p_id")
        .join(ts, "t_id")
        .withColumn("i", inter)
        .filter(F.col("i") / (F.col("n_p") + F.col("n_t") - F.col("i")) >= threshold)
        .select(F.col("p_id").alias(id_col))
        .distinct()
    )


def _near_dup_ids(
    probe: DataFrame,
    target: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    threshold: float,
    self_pairs_ordered: bool,
) -> DataFrame:
    """ids of ``probe`` rows whose exact Jaccard vs some ``target`` row is
    ≥ threshold. When probe IS target (``self_pairs_ordered``), only pairs
    a<b count, so the lowest id of each dup group survives."""
    pb = _band_hashes(probe, id_col, num_hashes, bands)
    tb = _band_hashes(target, id_col, num_hashes, bands)
    cond = (pb["band"] == tb["band"]) & (pb["band_hash"] == tb["band_hash"])
    if self_pairs_ordered:
        cond = cond & (tb["bid"] < pb["bid"])
    cand = (
        pb.join(tb, cond)
        .select(pb["bid"].alias("p_id"), tb["bid"].alias("t_id"))
        .dropDuplicates(["p_id", "t_id"])
    )
    return _verified_victims(cand, probe, target, id_col, threshold)


def start_incremental_near_dedup(
    docs: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    available_now: bool = True,
    n_buckets: int | None = None,
    history_probe: str = "bucketed",
    maintain_every: int | None = 16,
    maintain_max_files: int = 8,
):
    """``docs`` is a streaming DataFrame. Appends to ``corpus_dir`` only rows
    that are neither exact nor near (Jaccard ≥ threshold) duplicates of any
    previously stored row, carrying (fp, sig, sh, n) alongside the data.

    ``n_buckets=None`` (the default) adopts an existing index's persisted
    layout, or auto-sizes a fresh one from the first write's distinct-key
    count; an explicit value that contradicts the persisted layout makes
    the stream rebuild the index rather than probe a wrong subset."""
    if history_probe not in ("bucketed", "scan"):
        raise ValueError(
            f"unknown history_probe {history_probe!r}: "
            f"expected 'bucketed' or 'scan'"
        )
    band_index = BandedFingerprintIndex(
        near_index_path(corpus_dir),
        key_col="band_hash",
        n_bands=n_buckets,
        schema_tag=f"minhash:k={k},nh={num_hashes},bands={bands}",
    )
    exact_index = BandedFingerprintIndex(
        exact_index_path(corpus_dir),
        key_col="fpk",
        n_bands=n_buckets,
        schema_tag="exact:md5-xxh64",
    )
    # one-time per-stream index reconciliation flag. Meaning depends on
    # mode: bucketed — "both indexes validated/migrated, skip further
    # existence stats"; scan — "any stale index has been invalidated".
    # Either way: non-empty = the mode's index state is settled for this
    # stream, don't redo the check per batch.
    idx_settled: list[bool] = []
    n_done: list[int] = [0]  # completed batches, drives maintenance

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        use_index = history_probe == "bucketed"
        # keep a handle to the persisted frame itself: unpersist() requires
        # the SAME plan (uncacheQuery is sameResult-based), and `fresh` is
        # reassigned through joins below — unpersisting the derived frame
        # would silently leak one cache entry per micro-batch
        cached = _with_signatures(
            batch_df.dropDuplicates([id_col]), id_col, text_col, k, num_hashes
        ).persist()
        fresh = cached
        hist = None
        hist_cached = None
        try:
            hist = spark.read.parquet(corpus_dir)
            if not use_index:
                # the scan path reads history many times per batch — cache
                # it (the bucketed path reads only thin pruned slices, so
                # caching the whole corpus would defeat the point)
                hist_cached = hist.persist()
                hist = hist_cached
            hist.schema  # force resolution (replaces the count() probe)
        except AnalysisException as exc:
            # ONLY PATH_NOT_FOUND is a legitimate first batch; an existing-
            # but-unreadable corpus (UNABLE_TO_INFER_SCHEMA etc.) must
            # propagate or the history anti-join is silently skipped.
            from ..errors import is_path_not_found

            if not is_path_not_found(exc):
                raise
            hist = None
        need_heal = False
        if not idx_settled and (not use_index or hist is None):
            # Two reasons a surviving index must die before this batch:
            # scan mode appends corpus rows WITHOUT maintaining any index
            # (a stale one would make a later bucketed run miss duplicates
            # forever — exists() would skip the migration rebuild); and a
            # FIRST batch (no corpus) alongside a leftover sidecar means
            # the corpus was deleted out from under its index — probing it
            # would drop fresh docs that matched the OLD, gone corpus.
            band_index.invalidate(spark)
            exact_index.invalidate(spark)
            idx_settled.append(True)
        if hist is not None and use_index:
            _settle_indexes(
                spark,
                (
                    (
                        band_index,
                        lambda: _band_hashes(hist, id_col, num_hashes, bands).select(
                            F.col("bid").alias("id"), "band", "band_hash"
                        ),
                    ),
                    (exact_index, lambda: _exact_pairs(hist, id_col)),
                ),
                idx_settled,
            )
            # a surviving in-flight marker means a prior attempt died
            # inside the corpus→indexes window — only then run the heal path
            need_heal = band_index.was_inflight(spark)
        # exact dedup (within batch, then vs history): survivor must be
        # deterministic — min(doc_id) per fingerprint, consistent with the
        # lowest-id-wins rule for near-dups — or two runs over identical
        # input could persist different corpus contents.
        keep = fresh.groupBy("fp").agg(F.min(F.col(id_col)).alias(id_col))
        fresh = fresh.join(keep, ["fp", id_col], "left_semi")
        replayed = None
        if hist is not None:
            if use_index and not need_heal:
                # steady state: bucket-local replay guard — only the
                # batch's own fpk bands are read; the md5 compare keeps an
                # fpk band collision from ever dropping a fresh row
                ebands = exact_index.touched_bands(fresh.select(_fpk()))
                erows = (
                    exact_index.read_bands(spark, ebands) if ebands else None
                )
                if erows is not None:
                    fresh = fresh.join(erows.select("fp"), "fp", "left_anti")
            else:
                # scan mode, or post-crash heal: the corpus fp column is
                # the authority (the exact index may be missing rows)
                hkeys = hist.select(
                    F.coalesce("fp", F.lit("null-text")).alias("fp"),
                    F.col(id_col),
                )
                if need_heal:
                    # TRUE replays (same id AND same bytes already stored)
                    # may have missing index rows in EITHER sidecar after a
                    # crash between corpus and index appends — capture for
                    # heal before the anti-join
                    replayed = fresh.join(hkeys, ["fp", id_col], "left_semi")
                fresh = fresh.join(hkeys.select("fp"), "fp", "left_anti")
        # near dedup WITHIN the batch: lowest id of each near-dup pair wins
        batch_victims = _near_dup_ids(
            fresh, fresh, id_col, num_hashes, bands, threshold, self_pairs_ordered=True
        )
        fresh = fresh.join(batch_victims, id_col, "left_anti")
        # near dedup vs HISTORY
        if hist is not None:
            if use_index:
                pb = _band_hashes(fresh, id_col, num_hashes, bands)
                heal_rows = (
                    _band_hashes(replayed, id_col, num_hashes, bands).select(
                        F.col("bid").alias("id"), "band", "band_hash"
                    )
                    if replayed is not None
                    else None
                )
                probe_keys = pb.select("band_hash")
                if heal_rows is not None:
                    probe_keys = probe_keys.union(heal_rows.select("band_hash"))
                buckets = band_index.touched_bands(probe_keys)
                idx_rows = (
                    band_index.read_bands(spark, buckets) if buckets else None
                )
                missing = None
                if heal_rows is not None:
                    if idx_rows is not None:
                        missing = heal_rows.join(
                            idx_rows, ["id", "band", "band_hash"], "left_anti"
                        )
                    elif buckets:
                        # none of the touched buckets exist yet: every
                        # replayed row's pairs are missing by definition
                        missing = heal_rows
                # the candidate target must INCLUDE the heal rows: a
                # replayed doc IS stored history, and its band hashes are
                # exactly what the index is missing — probing the index
                # alone would let a batch-mate near-dup of it (dropped
                # within-batch by the crashed attempt, so no longer paired
                # in-batch on replay) slip past the history check.
                cols = ["id", "band", "band_hash"]
                target = idx_rows.select(*cols) if idx_rows is not None else None
                if missing is not None:
                    m = missing.select(*cols)
                    target = m if target is None else target.union(m)
                if target is not None:
                    # emptiness-gated verify: the exact-Jaccard verify
                    # reads the corpus (id, sh, n) columns — a full
                    # thin-column scan — so it's only launched when some
                    # band actually collided. The gate re-evaluates the
                    # (cheap, pruned) candidate join rather than persisting
                    # it: persist() of a frame derived from the foreachBatch
                    # input measurably CORRUPTED later batches' dedup here
                    # (cache-substitution inside the micro-batch plan), so
                    # no caching across this seam.
                    cand = (
                        pb.join(target, ["band", "band_hash"])
                        .select(F.col("bid").alias("p_id"), F.col("id").alias("t_id"))
                        .dropDuplicates(["p_id", "t_id"])
                    )
                    if not cand.isEmpty():
                        hist_victims = _verified_victims(
                            cand, fresh, hist, id_col, threshold
                        )
                        fresh = fresh.join(hist_victims, id_col, "left_anti")
                if missing is not None and not missing.isEmpty():
                    band_index.append(missing)
                # heal the exact sidecar the same way: replayed rows'
                # (id, fp, fpk) may be missing after a crash
                if replayed is not None:
                    _heal_exact_index(spark, exact_index, _exact_pairs(replayed, id_col))
            else:
                hist_victims = _near_dup_ids(
                    fresh, hist, id_col, num_hashes, bands, threshold,
                    self_pairs_ordered=False,
                )
                fresh = fresh.join(hist_victims, id_col, "left_anti")
        if use_index:
            band_index.mark_inflight(spark)
        fresh.write.mode("append").parquet(corpus_dir)
        if use_index:
            # index appends AFTER the corpus commit (crash ⇒ missing index
            # rows, healed on replay — never phantom rows); one marker
            # brackets both appends
            exact_index.append(_exact_pairs(fresh, id_col))
            band_index.append(
                _band_hashes(fresh, id_col, num_hashes, bands).select(
                    F.col("bid").alias("id"), "band", "band_hash"
                )
            )
            band_index.clear_inflight(spark)
        cached.unpersist()
        if hist_cached is not None:
            hist_cached.unpersist()
        n_done[0] += 1
        if use_index and maintain_every and n_done[0] % maintain_every == 0:
            band_index.maintain(spark, max_files_per_band=maintain_max_files)
            exact_index.maintain(spark, max_files_per_band=maintain_max_files)

    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
