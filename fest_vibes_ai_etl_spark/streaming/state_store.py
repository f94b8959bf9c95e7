"""Shared conventions for the persisted corpus-as-state index stores.

Three index families keep derived state next to a streamed corpus — the
dedup sidecars (``banded_index``), the IVF cell store (``operators/ivf``),
and the lexical search index (``incremental_search``). They converged on
the same operational contract (documented in ``STATE.md``); this module
holds the pieces that are genuinely identical across families so the next
family doesn't re-derive them:

- **Layout meta guard** (:func:`adopt_or_refuse_meta` /
  :func:`meta_mismatches`): every store pins its layout parameters in an
  in-directory ``_meta.json`` (underscore-prefixed: invisible to parquet
  listings, moves with the data through directory renames). A caller whose
  configuration contradicts the stored layout must REFUSE loudly — probing
  across a layout change is silent corruption, the config-drift class all
  three families close. Families with richer adoption semantics (the
  banded index's stored-n_bands-always-wins, the IVF sample re-assignment
  verify) keep those locally and share only the mismatch computation.

- **Small-file compaction for append-per-batch directories**
  (:func:`compact_small_files` / :func:`recover_dir_compaction`): a
  directory that gains one file per micro-batch grows its listing and
  footer-read cost linearly with stream age. The compactor merges the
  SMALL files of one directory into a single segment, size-tiered: files
  at or above ``target_bytes`` are graduated segments and are never
  rewritten again, so total rewrite work over a stream's life is
  O(n log n) in bytes appended (the LSM argument), not O(batches ×
  index size). Crash safety is a roll-forward journal, not a directory
  swap (a swap would have to rewrite the graduated segments too):

  1. merged segment written under an invisible ``_cstage-*`` staging dir;
  2. ``_compact.json`` manifest (atomic write) records the final name and
     the exact input files;
  3. the segment is renamed to its visible final name;
  4. the inputs are deleted; the manifest is dropped.

  A crash before (3) rolls BACK (inputs intact, staging swept); a crash
  after (3) rolls FORWARD (final is live, surviving inputs deleted).
  Between the crash and recovery a raw reader could see final+inputs
  simultaneously — the same single-writer discipline as the banded
  index's swaps applies: owners run :func:`recover_dir_compaction` at
  open time (the stream processors and probes here do), and maintenance
  never runs concurrently with a probe.
"""

from __future__ import annotations

import logging
import uuid

from pyspark.sql import DataFrame, SparkSession

from .banded_index import hadoop_read_json, hadoop_write_json

_MANIFEST = "_compact.json"
_STAGE_PREFIX = "_cstage-"

logger = logging.getLogger(__name__)


class InFlightRecoveryError(RuntimeError):
    """A crash journal (compaction manifest / staged swap) exists and the
    caller is a READ-ONLY consumer that must not repair it — repairing
    mutates the filesystem, which is only safe for the store's single
    writer. The message names the owner op that heals it."""


def detect_dir_compaction(spark: SparkSession, dir_path: str) -> bool:
    """True when ``dir_path`` carries an unhealed compaction journal —
    the read-only twin of :func:`recover_dir_compaction` (one stat, no
    mutation). A read-only probe that sees True must raise instead of
    healing: between the journal write and the final rename the
    directory is still consistent (staging is invisible), but AFTER the
    rename a raw read sees the merged segment and its inputs
    simultaneously, so 'manifest present' is the conservative refusal
    point for a consumer that cannot tell which side of the rename it
    is on."""
    jvm, fs, _ = _fs_for(spark, dir_path)
    man_p = jvm.org.apache.hadoop.fs.Path(
        dir_path.rstrip("/") + "/" + _MANIFEST
    )
    return bool(fs.exists(man_p))


# --- layout meta -----------------------------------------------------------


def meta_mismatches(meta: dict, expected: dict) -> list[str]:
    """Human-readable field mismatches between a stored layout meta and the
    caller's expected values (missing keys count as mismatches)."""
    return [
        f"{k}: stored {meta.get(k)!r} != {v!r}"
        for k, v in expected.items()
        if meta.get(k) != v
    ]


def adopt_or_refuse_meta(
    spark: SparkSession,
    meta_path: str,
    expected: dict,
    error: type[Exception],
    what: str,
    consequence: str = "",
    advisory: dict | None = None,
) -> dict:
    """The families' shared adopt-or-refuse open: write ``expected`` as the
    layout meta when none exists (first open creates the layout), return
    the stored meta when it matches, raise ``error`` when any field
    contradicts it. ``consequence`` names what silently breaks if the
    mismatch were ignored — every refusal must tell the operator why.
    ``advisory`` fields are RECORDED with the meta but never validated
    (e.g. the id column's Spark type, which delete ops use to burn ids
    before any data exists) — pre-advisory metas stay adoptable."""
    meta = hadoop_read_json(spark, meta_path)
    if meta is None:
        out = dict(expected)
        if advisory:
            out.update(advisory)
        hadoop_write_json(spark, meta_path, out)
        return out
    errs = meta_mismatches(meta, expected)
    if errs:
        raise error(
            f"{what} layout mismatch — {'; '.join(errs)}."
            + (f" {consequence}" if consequence else "")
        )
    if advisory:
        # BACKFILL advisory fields a pre-advisory meta lacks (atomic
        # rewrite; single-writer open) — otherwise stores created before
        # a field existed would degrade its consumers forever (e.g. a
        # string-keyed store's delete fallback silently typing bigint)
        missing = {k: v for k, v in advisory.items() if k not in meta}
        if missing:
            meta = dict(meta)
            meta.update(missing)
            hadoop_write_json(spark, meta_path, meta)
    return meta


# --- per-directory small-file compaction ------------------------------------


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jp.getFileSystem(spark._jsc.hadoopConfiguration()), jp


def _gone_race(fs, path) -> bool:
    """True when a failed delete/rename is explained by the target no
    longer existing — i.e. a CONCURRENT recovery of the same crash won
    the race (two probes healing one dead maintenance pass; the
    exists-then-act window is not atomic on all filesystems). The loser
    re-checks state and moves on instead of failing the probe."""
    try:
        return not fs.exists(path)
    except Exception:  # noqa: BLE001 - can't re-check: treat as real
        return False


def _delete_inputs(fs, jvm, dir_path: str, names: list[str]) -> None:
    """Drop a completed merge's input files (idempotent — recovery re-runs
    it for any inputs a crash left behind, and a concurrent recovery that
    already deleted one is tolerated). Split out so crash tests can
    inject a death between the rename and the deletes."""
    for name in names:
        p = jvm.org.apache.hadoop.fs.Path(dir_path.rstrip("/") + "/" + name)
        try:
            if fs.exists(p):
                fs.delete(p, False)
        except Exception:  # noqa: BLE001 - py4j-wrapped IOException
            if not _gone_race(fs, p):
                raise


def recover_dir_compaction(spark: SparkSession, dir_path: str) -> None:
    """Heal a crashed :func:`compact_small_files` on ``dir_path``. The
    manifest is the journal: final name present and visible → roll
    forward (delete surviving inputs); final missing → roll back (drop
    the manifest; the invisible staging dir is swept by the next
    compaction pass). One ``exists`` stat in the steady state."""
    jvm, fs, jp = _fs_for(spark, dir_path)
    man_path = dir_path.rstrip("/") + "/" + _MANIFEST
    man_p = jvm.org.apache.hadoop.fs.Path(man_path)
    if not fs.exists(man_p):
        return
    try:
        man = hadoop_read_json(spark, man_path)
    except Exception:  # noqa: BLE001 - a concurrent recovery dropped it
        if _gone_race(fs, man_p):
            return
        raise
    if man is None:  # torn manifest cannot exist (atomic write) — stale tmp
        return
    final = man.get("final")
    final_p = (
        jvm.org.apache.hadoop.fs.Path(dir_path.rstrip("/") + "/" + final)
        if final
        else None
    )
    if final is None or fs.exists(final_p):
        # final==None journals an all-rows-excluded merge (no output
        # segment): the inputs' rows were all tombstoned, deletion IS the
        # compaction — roll forward either way
        _delete_inputs(fs, jvm, dir_path, man.get("inputs", []))
    try:
        fs.delete(man_p, False)
    except Exception:  # noqa: BLE001 - concurrent recovery dropped it
        if not _gone_race(fs, man_p):
            raise


def compact_small_files(
    spark: SparkSession,
    dir_path: str,
    max_files: int = 8,
    target_bytes: int = 32 << 20,
    exclude: DataFrame | None = None,
    exclude_cols: list[str] | None = None,
    force: bool = False,
    include_graduated: bool = False,
    transform=None,
) -> int:
    """Merge one directory's small parquet files (< ``target_bytes``) into
    a single segment when more than ``max_files`` of them accumulated;
    returns the number of input files merged (0 = nothing to do). Files
    at/above ``target_bytes`` are graduated segments — never rewritten.
    ``exclude`` (with ``exclude_cols`` join keys) anti-joins rows out of
    the merged segment — the tombstone fold hook: rows in graduated
    segments survive until their segment is itself rewritten (probes
    anti-join tombstones regardless). The exclude frame's OWN broadcast
    hint (or absence) governs the join strategy — callers pass frames
    from ``read_tombstones``, which applies the bounded-broadcast escape.
    ``transform`` (df → df) rewrites the merged rows (the tombstone set's
    own maintenance passes ``distinct``). ``force=True`` compacts (and
    folds) even below the file-count threshold, and
    ``include_graduated=True`` rewrites the graduated segments too (one
    output segment, whatever its size) — together, the purge path: a
    physical erase must reach every file.

    Single-writer discipline: call between batches, never concurrently
    with a probe of the same directory. Crash-safe via the manifest
    journal (see module docstring + :func:`recover_dir_compaction`)."""
    jvm, fs, jp = _fs_for(spark, dir_path)
    if not fs.exists(jp):
        return 0
    recover_dir_compaction(spark, dir_path)
    small: list = []
    for st in fs.listStatus(jp):
        name = st.getPath().getName()
        if name.startswith(_STAGE_PREFIX):
            fs.delete(st.getPath(), True)  # stale staging from a crash
            continue
        if name.startswith("_tmp-"):
            # crashed direct-append staging: invisible garbage, sweep
            # (between batches only — the single-writer rule)
            fs.delete(st.getPath(), False)
            continue
        if name.startswith(("_", ".")) or not name.endswith(".parquet"):
            continue
        if include_graduated or st.getLen() < target_bytes:
            small.append(st.getPath())
    if len(small) == 0:
        return 0
    if not force and len(small) <= max_files:
        return 0
    if len(small) == 1 and exclude is None:
        return 0  # nothing to merge and nothing to fold
    tok = uuid.uuid4().hex
    stage = dir_path.rstrip("/") + "/" + _STAGE_PREFIX + tok
    df = spark.read.parquet(*[str(p) for p in small])
    if exclude is not None:
        df = df.join(exclude, exclude_cols, "left_anti")
    if transform is not None:
        df = transform(df)
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    stage_p = jvm.org.apache.hadoop.fs.Path(stage)
    parts = [
        st.getPath()
        for st in fs.listStatus(stage_p)
        if st.getPath().getName().endswith(".parquet")
        and not st.getPath().getName().startswith(("_", "."))
    ]
    final_name = f"part-merged-{tok}.parquet" if parts else None
    man_path = dir_path.rstrip("/") + "/" + _MANIFEST
    # journal BEFORE the visible rename: from here the merge either rolls
    # forward (final lands) or rolls back (manifest dropped, inputs kept).
    # The fencing stamp attributes the rewrite to the writer-lease epoch
    # that performed it (STATE.md §5 enforcement, audit-only for recovery)
    from .writer_lease import current_epoch_for

    hadoop_write_json(
        spark,
        man_path,
        {
            "final": final_name,
            "inputs": [p.getName() for p in small],
            "lease_epoch": current_epoch_for(dir_path),
        },
    )
    if parts:
        final_p = jvm.org.apache.hadoop.fs.Path(
            dir_path.rstrip("/") + "/" + final_name
        )
        if not fs.rename(parts[0], final_p):
            raise IOError(
                f"compaction: rename {parts[0]} -> {final_p} failed; "
                f"manifest left for recovery"
            )
    _delete_inputs(fs, jvm, dir_path, [p.getName() for p in small])
    fs.delete(jvm.org.apache.hadoop.fs.Path(man_path), False)
    fs.delete(stage_p, True)
    return len(small)
