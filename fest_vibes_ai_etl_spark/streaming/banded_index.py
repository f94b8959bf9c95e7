"""Band-partitioned fingerprint sidecar for the incremental-dedup corpora.

The incremental span/near dedup streams probe everything ever ingested on
every micro-batch. Rebuilding the probe side from the corpus per batch —
exploding each stored row's fingerprint array — costs a full corpus scan
per batch: linear per batch, quadratic over a backfill. This sidecar makes
the probe BUCKET-LOCAL instead:

- index rows are the pre-exploded (id, key) pairs, written ``partitionBy``
  a band column ``band = pmod(key, n_bands)``;
- a batch can only collide with history on keys the batch itself carries,
  and every such key lives in one of the batch's own bands — so the probe
  reads ONLY the band directories the batch touches (Spark partition
  pruning: the ``band IN (...)`` filter never opens the other directories);
- appends add exactly the new rows' pairs — no rewrite, no rebuild.

Per-batch probe cost is therefore ``(touched_bands / n_bands) ×
index_size`` instead of ``index_size``: still proportional to history
within a touched band, but a small fixed batch touches a bounded band set,
so the constant drops by roughly ``n_bands / touched_bands``. Size
``n_bands`` ≫ the typical batch's distinct-fingerprint count for deep
pruning (the 100 TB deployment shape is thousands of bands; the default 64
keeps local test corpora from fragmenting into thousands of tiny files).
Periodic per-band compaction (coalescing a band directory's accumulated
small files) is plain parquet maintenance and changes nothing semantically.

Crash consistency (single-writer stream): the corpus append commits FIRST,
the index append second. A crash between the two leaves index rows missing
for stored docs — never phantom index rows for unstored docs (which would
delete fresh data on replay). The replayed batch finds its rows
byte-identical in the corpus, and the stream HEALS the gap: replayed rows'
missing (id, key) pairs are re-appended (see the callers' heal step), so
the index converges to the corpus.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BandedFingerprintIndex:
    """Parquet (id, key) pairs partitioned by ``pmod(key, n_bands)``.

    ``key_col`` must be a LONG hash column (winnow fingerprints, LSH band
    hashes): ``pmod`` of a well-distributed hash spreads bands uniformly.
    """

    def __init__(self, path: str, key_col: str, n_bands: int = 64):
        self.path = path
        self.key_col = key_col
        self.n_bands = n_bands

    def band_of(self, col):
        return F.pmod(col, F.lit(self.n_bands)).cast("int")

    def _fs(self, spark: SparkSession):
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs, path

    def exists(self, spark: SparkSession) -> bool:
        """One filesystem stat — NOT a parquet resolution, which would
        recursively list every band directory (a whole Spark job for a
        many-band index) just to answer yes/no."""
        fs, path = self._fs(spark)
        return bool(fs.exists(path))

    def read(self, spark: SparkSession) -> DataFrame | None:
        """Full index frame, or None if never written."""
        from ..errors import is_path_not_found

        try:
            df = spark.read.parquet(self.path)
            df.schema  # force resolution
            return df
        except AnalysisException as exc:
            if not is_path_not_found(exc):
                raise
            return None

    def read_bands(self, spark: SparkSession, bands: list[int]) -> DataFrame | None:
        """Pruned read, or None when no requested band exists yet. The
        band directories are named EXPLICITLY (``basePath`` + per-band
        paths): only the touched directories are ever listed — a plain
        ``spark.read.parquet(root).filter(pband IN ...)`` prunes the SCAN
        but still pays a full recursive listing of every band at dataframe
        creation, which measured as the dominant probe cost. One
        ``listStatus`` of the root (a single readdir) filters the request
        to bands that exist, so a fresh band in the batch never 404s."""
        fs, root = self._fs(spark)
        existing = {st.getPath().getName() for st in fs.listStatus(root)}
        paths = [
            f"{self.path}/pband={b}" for b in bands if f"pband={b}" in existing
        ]
        if not paths:
            return None
        df = spark.read.option("basePath", self.path).parquet(*paths)
        return df.drop("pband")

    def append(self, pairs: DataFrame) -> None:
        """Append (id, key) rows; the band column is derived here so
        callers can't write an inconsistent banding. Appends are
        batch-sized (a micro-batch's own pairs), so they're funneled
        through one writer task — one file per touched band instead of one
        per (task, band). The repartition(1) is a shuffle boundary, so the
        upstream plan keeps its parallelism."""
        (
            pairs.repartition(1)
            .withColumn("pband", self.band_of(F.col(self.key_col)))
            .write.mode("append")
            .partitionBy("pband")
            .parquet(self.path)
        )

    def build_from(self, pairs: DataFrame) -> None:
        """One-time build (migration of a pre-index corpus): repartition by
        band first so each band directory gets one file, not one per input
        partition."""
        (
            pairs.withColumn("pband", self.band_of(F.col(self.key_col)))
            .repartition("pband")
            .write.mode("overwrite")
            .partitionBy("pband")
            .parquet(self.path)
        )

    def invalidate(self, spark: SparkSession) -> None:
        """Delete the index, its marker, AND the compaction siblings.
        Called by the streams when a batch appends to the corpus WITHOUT
        maintaining the index (scan mode): an index that silently stops
        covering the corpus would make a later bucketed run miss
        duplicates forever — absence forces the migration rebuild instead.
        The _precompact/_compacting leftovers must die too: a stale
        _precompact surviving invalidation would let a later compact()
        'recover' exactly the stale index this call deleted."""
        fs, path = self._fs(spark)
        jvm = spark._jvm
        for p in (
            path,
            jvm.org.apache.hadoop.fs.Path(self.path.rstrip("/") + "_precompact"),
            jvm.org.apache.hadoop.fs.Path(self.path.rstrip("/") + "_compacting"),
        ):
            if fs.exists(p):
                fs.delete(p, True)
        marker = self._marker_path(spark)
        if fs.exists(marker):
            fs.delete(marker, False)

    # --- crash-window marker -------------------------------------------
    # The heal step (re-appending replayed rows' missing pairs) requires
    # an anti-join against the pruned index — cheap when history is small,
    # but it SORTS the pruned slice every batch at scale, for a condition
    # that only holds after a crash. The marker makes heal zero-cost in
    # the steady state: the stream sets it before the corpus append and
    # clears it after the index append, so a surviving marker at batch
    # start means the previous attempt died inside the corpus→index
    # window and exactly then is the heal join worth running.

    def _marker_path(self, spark: SparkSession):
        jvm = spark._jvm
        return jvm.org.apache.hadoop.fs.Path(self.path.rstrip("/") + ".inflight")

    def mark_inflight(self, spark: SparkSession) -> None:
        fs, _ = self._fs(spark)
        out = fs.create(self._marker_path(spark), True)
        out.close()

    def clear_inflight(self, spark: SparkSession) -> None:
        fs, _ = self._fs(spark)
        fs.delete(self._marker_path(spark), False)

    def was_inflight(self, spark: SparkSession) -> bool:
        fs, _ = self._fs(spark)
        return bool(fs.exists(self._marker_path(spark)))

    def compact(self, spark: SparkSession) -> None:
        """Rewrite the index with one file per band. Streaming appends add
        one small file per touched band per micro-batch; over a long run a
        band directory accumulates thousands of files and the probe's open
        cost grows with file count, not data size. Compaction is plain
        parquet maintenance — same rows, same banding — staged through a
        sibling directory and swapped in atomically-enough for the
        SINGLE-WRITER stream this index serves (run it between batches or
        from the stream's own maintenance hook, not concurrently with a
        probe)."""
        fs, path = self._fs(spark)
        jvm = spark._jvm
        tmp = self.path.rstrip("/") + "_compacting"
        old = self.path.rstrip("/") + "_precompact"
        tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
        old_path = jvm.org.apache.hadoop.fs.Path(old)
        # recovery / refusal BEFORE doing anything destructive:
        # a leftover _precompact means a prior compact() died between its
        # two renames — restore it if the live index is gone, refuse (and
        # tell the operator what's what) if both exist; renaming the live
        # index INTO an existing _precompact dir would bury it.
        if fs.exists(old_path):
            if not fs.exists(path):
                if not fs.rename(old_path, path):
                    raise RuntimeError(
                        f"compact recovery: rename {old} -> {self.path} failed"
                    )
            else:
                raise RuntimeError(
                    f"refusing to compact: {old} exists from a crashed "
                    f"compaction alongside a live index at {self.path} — "
                    f"verify which is current and delete the other first"
                )
        if fs.exists(tmp_path):
            fs.delete(tmp_path, True)  # stale staging from a prior crash
        df = self.read(spark)
        if df is None:
            return
        (
            df.repartition("pband")
            .write.mode("overwrite")
            .partitionBy("pband")
            .parquet(tmp)
        )
        if not fs.rename(path, old_path):
            raise RuntimeError(f"compact: rename {self.path} -> {old} failed")
        if not fs.rename(tmp_path, path):
            # put the original back before failing — and say so loudly if
            # even that fails: the live index is then stranded at
            # _precompact, which the operator must know
            restored = fs.rename(old_path, path)
            raise RuntimeError(
                f"compact: rename {tmp} -> {self.path} failed"
                + (
                    ""
                    if restored
                    else f"; ROLLBACK ALSO FAILED — live index stranded at "
                    f"{old}, restore it manually before the next probe"
                )
            )
        fs.delete(old_path, True)

    def touched_bands(self, keys: DataFrame) -> list[int]:
        """Distinct band values present in ``keys``'s key column — the
        probe's pruning set. O(n_bands) driver memory by construction."""
        return [
            r.band
            for r in keys.select(
                self.band_of(F.col(self.key_col)).alias("band")
            )
            .distinct()
            .collect()
        ]
