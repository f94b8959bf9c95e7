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


class ConcurrentWriteError(RuntimeError):
    """Raised when a merge loses the version CAS ``max_attempts`` times."""


class VersionedParquetTable:
    """MERGE with optimistic concurrency over plain parquet — manifest-CAS.

    ``merge_into_partitioned`` above assumes a single writer (partition-
    overwrite discipline). The reference instead survives 5 concurrent
    Lambda writers via Postgres row locks + deadlock retry with exponential
    backoff (/root/reference/src/loader/service.py:862-902). This class is
    the lakehouse-native equivalent — the Iceberg/Delta commit protocol
    reduced to its core, on the filesystem the sandbox has:

    - Table state is an immutable MANIFEST: partition value → data
      directory. Manifests live in ``_commits/v{N}.json``.
    - A merge stages its output under ``data/{uuid}/`` (hive-partitioned),
      then COMMITS by creating ``_commits/v{N+1}.json`` with
      ``O_CREAT|O_EXCL`` — the filesystem's compare-and-swap (the same
      put-if-absent pattern as the cache-export sink's manifest publish,
      sources/cache_export_sink.py). Exactly one of two racing writers
      creates that name; the loser deletes its staging, re-reads the NEW
      table state, recomputes its merge, and retries with the reference's
      backoff schedule (0.1·2^attempt + jitter).
    - Readers resolve the latest manifest and see an atomic snapshot;
      replaced partitions' old directories become garbage collected by
      ``vacuum()``.

    On S3/HDFS the CAS primitive becomes conditional-PUT / atomic-create,
    which is exactly how Delta's commit service and Iceberg's catalog swap
    work — the protocol here is scale-portable even though the test bed is
    a local filesystem."""

    def __init__(self, path: str, partition_col: str):
        import os

        self.path = path
        self.partition_col = partition_col
        self._commits = os.path.join(path, "_commits")
        self._data = os.path.join(path, "data")

    # -- state ---------------------------------------------------------
    def latest(self) -> tuple[int, dict]:
        """(version, manifest). Version 0 = empty table, ``{}`` manifest."""
        import json
        import os

        try:
            names = sorted(
                n for n in os.listdir(self._commits)
                if n.startswith("v") and n.endswith(".json")
            )
        except OSError:
            return 0, {}
        if not names:
            return 0, {}
        latest = names[-1]
        with open(os.path.join(self._commits, latest)) as f:
            return int(latest[1:-5]), json.load(f)

    def history(self) -> list[int]:
        """Committed versions, ascending. Every listed version is readable
        until :meth:`vacuum` runs (vacuum keeps only the latest's roots)."""
        import os

        try:
            return sorted(
                int(n[1:-5])
                for n in os.listdir(self._commits)
                if n.startswith("v") and n.endswith(".json")
            )
        except OSError:
            return []

    def _read_manifest(self, version: int) -> dict:
        import json
        import os

        with open(os.path.join(self._commits, f"v{version:012d}.json")) as f:
            return json.load(f)

    def _manifest_df(
        self, spark: SparkSession, manifest: dict, partition_values=None
    ) -> DataFrame | None:
        """Materialize a manifest as a DataFrame (optionally pruned to
        ``partition_values``). Returns None when nothing matches. Dirs are
        grouped by staging root so Spark re-derives the hive partition
        column via basePath; one union per root, AQE coalesces."""
        import os

        manifest = {k: d for k, d in manifest.items() if not k.startswith("_")}
        if partition_values is not None:
            wanted = {str(v) for v in partition_values}
            manifest = {k: d for k, d in manifest.items() if k in wanted}
        if not manifest:
            return None
        by_root: dict[str, list[str]] = {}
        for entry in manifest.values():
            d = os.path.join(self.path, entry["dir"])
            by_root.setdefault(os.path.dirname(d), []).append(d)
        out = None
        for root, dirs in sorted(by_root.items()):
            df = spark.read.option("basePath", root).parquet(*sorted(dirs))
            # allowMissingColumns: roots staged before a schema evolution
            # lack the evolved columns; their rows read as null for them.
            out = df if out is None else out.unionByName(
                df, allowMissingColumns=True
            )
        return out

    def read(self, spark: SparkSession, partition_values=None) -> DataFrame | None:
        """Snapshot read of the LATEST manifest."""
        _v, manifest = self.latest()
        return self._manifest_df(spark, manifest, partition_values)

    def read_version(
        self, spark: SparkSession, version: int, partition_values=None
    ) -> DataFrame | None:
        """Time travel: snapshot read AT ``version`` — manifests are
        immutable, so an old version stays byte-stable until vacuumed (the
        Delta/Iceberg ``VERSION AS OF`` contract; readers needing long
        retention defer vacuum, the same trade as Delta's retention
        window)."""
        return self._manifest_df(
            spark, self._read_manifest(version), partition_values
        )

    def diff_versions(
        self, spark: SparkSession, v_old: int, v_new: int,
        keys: Sequence[str], compare_cols: Sequence[str] | None = None,
    ) -> DataFrame:
        """Row-level CDC between two committed versions:
        (*keys, status ∈ added/removed/changed/unchanged) via the
        hash-compare snapshot diff (operators/diff.py — each side reduces
        to one 64-bit hash before the join, so wide rows don't widen the
        shuffle). Manifest-level pruning first: only partitions whose
        manifest entry CHANGED between the versions are read at all —
        an unchanged partition points at the same immutable directory and
        cannot contain a delta, so a 10-partition touch on a 10k-partition
        table reads 10 partitions, not 10k."""
        from ..operators.diff import snapshot_diff

        m_old, m_new = self._read_manifest(v_old), self._read_manifest(v_new)
        changed = [
            p
            for p in set(m_old) | set(m_new)
            if not p.startswith("_") and m_old.get(p) != m_new.get(p)
        ]
        old = self._manifest_df(spark, m_old, partition_values=changed)
        new = self._manifest_df(spark, m_new, partition_values=changed)
        if old is None and new is None:
            schema = ", ".join(f"{k} string" for k in keys) + ", status string"
            return spark.createDataFrame([], schema)
        if old is None:
            return new.select(*keys).withColumn("status", F.lit("added"))
        if new is None:
            return old.select(*keys).withColumn("status", F.lit("removed"))
        return snapshot_diff(old, new, list(keys), list(compare_cols) if compare_cols else None)

    # -- write ---------------------------------------------------------
    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        keys: Sequence[str],
        coalesce_cols: Sequence[str] | None = None,
        overwrite_cols: Sequence[str] = (),
        keep_if_null_cols: Sequence[str] = (),
        max_attempts: int = 4,
        txn: tuple[str, int] | None = None,
        _pre_commit_hook=None,
    ) -> int:
        """Upsert ``source`` and commit via version CAS; returns the
        committed version. ``_pre_commit_hook(attempt)`` is a test seam
        that runs between staging and CAS (to force deterministic races).
        Raises :class:`ConcurrentWriteError` after ``max_attempts`` lost
        races.

        ``txn=(app_id, txn_version)`` makes the merge IDEMPOTENT across
        replays (Delta's txnAppId/txnVersion contract): the manifest records
        the highest committed txn_version per app_id under the reserved
        ``_txn`` key, and a merge whose txn_version is already committed
        returns the current version without writing — the exactly-once
        primitive the streaming sink (streaming/ingest.py) builds on, since
        a crashed foreachBatch replays the same (query_id, batch_id)."""
        import random
        import shutil
        import time

        pcol = self.partition_col
        touched = [r[0] for r in source.select(pcol).distinct().collect()]
        for attempt in range(max_attempts):
            version, manifest = self.latest()
            if txn is not None:
                app_id, txn_version = txn
                if manifest.get("_txn", {}).get(app_id, -1) >= txn_version:
                    return version  # replayed batch: already committed
            target_slice = self.read(spark, partition_values=touched)
            if target_slice is None:
                merged = source
            else:
                merged = merge_coalesce(
                    target_slice,
                    source,
                    keys=keys,
                    coalesce_cols=coalesce_cols,
                    overwrite_cols=overwrite_cols,
                    keep_if_null_cols=keep_if_null_cols,
                )
            staged_parts, stage_root = self._stage(merged)
            if _pre_commit_hook is not None:
                _pre_commit_hook(attempt)
            committed = self._commit_or_rebase(
                version, manifest, staged_parts, touched, txn
            )
            if committed is not None:
                return committed
            # Logical conflict: the winner rewrote one of OUR partitions, so
            # the staged merge is stale — discard and recompute against the
            # new snapshot (reference backoff schedule,
            # loader/service.py:889-893).
            shutil.rmtree(stage_root, ignore_errors=True)
            time.sleep(0.1 * (2**attempt) + random.uniform(0, 0.05))
        raise ConcurrentWriteError(
            f"merge lost the version CAS {max_attempts} times at {self.path}"
        )

    def _commit_or_rebase(
        self, version: int, manifest: dict, staged_parts: dict,
        touched, txn: tuple[str, int] | None, drop_parts=(),
    ) -> int | None:
        """CAS-commit ``staged_parts`` on top of ``manifest``; on a lost
        race, REBASE instead of recompute when the interleaved commits did
        not touch our partitions (Delta-style logical conflict detection:
        our merged output was computed from partition states the winner
        left unchanged, so it is still exactly correct — only the manifest
        base moves). Returns the committed version, or None when a real
        conflict requires the caller to recompute."""
        ours = {str(t) for t in touched}
        drop = {str(p) for p in drop_parts}
        for _rebase in range(8):
            base = {k: v for k, v in manifest.items() if k not in drop}
            new_manifest = {**base, **staged_parts}
            if txn is not None:
                new_manifest["_txn"] = {
                    **manifest.get("_txn", {}), txn[0]: txn[1]
                }
            if self._commit_cas(version + 1, new_manifest):
                return version + 1
            latest_version, latest_manifest = self.latest()
            if txn is not None and (
                latest_manifest.get("_txn", {}).get(txn[0], -1) >= txn[1]
            ):
                return latest_version  # someone replayed our txn: done
            if any(
                latest_manifest.get(p) != manifest.get(p) for p in ours
            ):
                return None  # our partitions moved: recompute required
            version, manifest = latest_version, latest_manifest
        return None

    def delete(
        self,
        spark: SparkSession,
        predicate,
        partition_values=None,
        max_attempts: int = 4,
        _pre_commit_hook=None,
    ) -> tuple[int, int]:
        """Row-level DELETE (copy-on-write): rewrite ONLY the partitions
        containing matching rows without the matching rows, commit via the
        same version CAS (rebase-safe like merge). Returns
        (committed_version, rows_deleted) — (current, 0) when nothing
        matches. Rows where the predicate is NULL are KEPT (SQL DELETE
        semantics: delete where predicate is true).

        ``partition_values`` scopes the match scan to those partitions —
        pass it whenever the predicate implies a partition range (a full
        delete otherwise scans the table once to FIND touched partitions,
        which is inherent for predicates on non-partition columns).

        Retention note (the GDPR shape): deleted rows remain readable via
        time travel until :meth:`vacuum` drops the superseded directories —
        a right-to-be-forgotten pipeline runs delete + vacuum; audit
        pipelines defer vacuum. Same trade as Delta's VACUUM retention."""
        import random
        import shutil
        import time

        pcol = self.partition_col
        keep = ~F.coalesce(predicate, F.lit(False))
        for attempt in range(max_attempts):
            version, manifest = self.latest()
            current = self.read(spark, partition_values=partition_values)
            if current is None:
                return version, 0
            touched = [
                r[0]
                for r in current.filter(F.coalesce(predicate, F.lit(False)))
                .select(pcol)
                .distinct()
                .collect()
            ]
            if not touched:
                return version, 0
            target_slice = self.read(spark, partition_values=touched)
            kept = target_slice.filter(keep)
            n_deleted = target_slice.count() - kept.count()
            staged_parts, stage_root = self._stage(kept)
            if _pre_commit_hook is not None:
                _pre_commit_hook(attempt)
            committed = self._commit_or_rebase(
                version, manifest, staged_parts, touched, None,
                drop_parts=touched,  # emptied partitions leave the manifest
            )
            if committed is not None:
                return committed, n_deleted
            shutil.rmtree(stage_root, ignore_errors=True)
            time.sleep(0.1 * (2**attempt) + random.uniform(0, 0.05))
        raise ConcurrentWriteError(
            f"delete lost the version CAS {max_attempts} times at {self.path}"
        )

    def _stage(self, df: DataFrame) -> tuple[dict, str]:
        """Write ``df`` hive-partitioned under a fresh staging root; returns
        (manifest fragment, staging root path)."""
        import os
        import uuid

        stage_id = uuid.uuid4().hex[:12]
        stage_root = os.path.join(self._data, stage_id)
        df.write.partitionBy(self.partition_col).parquet(stage_root)
        parts = {
            d.split("=", 1)[1]: {"dir": f"data/{stage_id}/{d}"}
            for d in os.listdir(stage_root)
            if d.startswith(f"{self.partition_col}=")
        }
        return parts, stage_root

    def _commit_cas(self, version: int, manifest: dict) -> bool:
        """Atomically publish ``manifest`` as ``version`` iff nobody else
        has: O_CREAT|O_EXCL on the version filename IS the compare-and-swap
        (conditional-PUT / atomic-create on S3/HDFS)."""
        import json
        import os

        os.makedirs(self._commits, exist_ok=True)
        commit_path = os.path.join(self._commits, f"v{version:012d}.json")
        try:
            fd = os.open(commit_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(manifest, sort_keys=True))
        return True

    def compact(
        self, spark: SparkSession, sort_cols=None, max_attempts: int = 4,
        _pre_commit_hook=None,
    ) -> int:
        """OPTIMIZE: rewrite the CURRENT snapshot into one fresh staging
        root (one tidy directory per partition) and commit it through the
        same version CAS as merge — concurrent merges serialize against
        the compaction, and a lost compaction race just re-reads and
        re-stages. Follow with :meth:`vacuum` to drop superseded roots.
        At 100 TB this is the small-file / manifest-fragmentation
        maintenance job every lakehouse table needs (Delta OPTIMIZE /
        Iceberg rewrite_data_files); returns the committed (or, for an
        empty table, current) version.

        ``sort_cols`` clusters rows within each rewritten partition
        (OPTIMIZE ... ZORDER BY when passed a Morton key built with
        functions/zorder.morton_key over bucketed dimensions; plain
        linear clustering for a single column) — parquet row-group
        min/max stats then prune point/range reads inside the partition."""
        import random
        import shutil
        import time

        for attempt in range(max_attempts):
            version, manifest = self.latest()
            current = self.read(spark)
            if current is None:
                return version
            staged = current.repartition(self.partition_col)
            if sort_cols:
                # partition col leads the sort: the parquet writer requires
                # rows grouped by partition columns and would otherwise
                # insert its own (clustering-destroying) sort on them.
                staged = staged.sortWithinPartitions(
                    self.partition_col, *sort_cols
                )
            staged_parts, stage_root = self._stage(staged)
            if _pre_commit_hook is not None:
                _pre_commit_hook(attempt)
            new_manifest = dict(staged_parts)
            if "_txn" in manifest:  # compaction must not reopen committed txns
                new_manifest["_txn"] = manifest["_txn"]
            if self._commit_cas(version + 1, new_manifest):
                return version + 1
            shutil.rmtree(stage_root, ignore_errors=True)
            time.sleep(0.1 * (2**attempt) + random.uniform(0, 0.05))
        raise ConcurrentWriteError(f"compact lost the version CAS at {self.path}")

    def describe_history(self, spark: SparkSession) -> DataFrame:
        """DESCRIBE HISTORY: one row per committed version —
        (version, n_partitions, partitions_changed vs the previous
        version, n_txn_apps). Metadata-only (reads manifests, never data);
        ordered ascending so the newest version is the last row."""
        rows = []
        prev: dict = {}
        for v in self.history():
            m = self._read_manifest(v)
            parts = {k: e for k, e in m.items() if not k.startswith("_")}
            changed = sorted(
                p for p in set(parts) | set(prev)
                if parts.get(p) != prev.get(p)
            )
            rows.append(
                (v, len(parts), changed, len(m.get("_txn", {})))
            )
            prev = parts
        return spark.createDataFrame(
            rows,
            "version long, n_partitions int, partitions_changed array<string>, "
            "n_txn_apps int",
        )

    def restore(self, version: int, max_attempts: int = 4) -> int:
        """Delta-style RESTORE: re-commit ``version``'s manifest as the NEW
        latest version (an undo that preserves history — nothing is
        deleted, so the mistake remains auditable via time travel). Data
        directories are immutable and shared, so restore is metadata-only:
        one manifest write through the same CAS as every commit. The
        restored manifest keeps the CURRENT ``_txn`` watermarks — rolling
        back data must not reopen committed stream transactions (a replayed
        batch would otherwise double-apply after a restore). Fails if the
        target version's directories were already vacuumed (read it first
        to check, or just let the next read fail loudly)."""
        import random
        import time

        target = {
            k: v for k, v in self._read_manifest(version).items()
            if not k.startswith("_")
        }
        for attempt in range(max_attempts):
            current_version, current_manifest = self.latest()
            if version == current_version:
                return current_version
            new_manifest = dict(target)
            if "_txn" in current_manifest:
                new_manifest["_txn"] = current_manifest["_txn"]
            if self._commit_cas(current_version + 1, new_manifest):
                return current_version + 1
            time.sleep(0.1 * (2**attempt) + random.uniform(0, 0.05))
        raise ConcurrentWriteError(f"restore lost the version CAS at {self.path}")

    def vacuum(self) -> int:
        """Delete partition DIRECTORIES no longer referenced by the LATEST
        manifest (then any emptied staging roots); returns the number of
        directories removed. Per-partition granularity matters for the
        delete path: a staging root whose partition ``a`` was superseded
        but whose ``c`` is still live must forget ``a``'s files — GDPR
        delete+vacuum has to actually remove the bytes, not just the
        manifest entry. Run only when no reader may hold an older snapshot
        (same contract as Delta VACUUM's retention window); time travel to
        vacuumed versions then fails loudly on the missing directory."""
        import os
        import shutil

        _v, manifest = self.latest()
        live = {
            e["dir"] for k, e in manifest.items() if not k.startswith("_")
        }
        removed = 0
        try:
            roots = os.listdir(self._data)
        except OSError:
            return 0
        for r in roots:
            root_path = os.path.join(self._data, r)
            for d in os.listdir(root_path):
                if not d.startswith(f"{self.partition_col}="):
                    continue
                if f"data/{r}/{d}" not in live:
                    shutil.rmtree(os.path.join(root_path, d), ignore_errors=True)
                    removed += 1
            if not any(
                n.startswith(f"{self.partition_col}=") for n in os.listdir(root_path)
            ):
                shutil.rmtree(root_path, ignore_errors=True)
        return removed
