"""Incremental lexical-search index maintenance: the postings store as
streaming state.

The batch search family (``operators/search.py``) stages the inverted
index once per corpus fingerprint; a production corpus is never static.
This stream keeps the SAME index shape current per micro-batch — the
third index family to get the corpus-as-state treatment, after the dedup
sidecars and the IVF cell store:

- ``<index_dir>/doclen`` — (doc_id, dl) rows, ONE atomic Spark append per
  batch. This is the authoritative "this document is indexed" record
  (the corpus-analog of the dedup streams): committer v1 atomicity means
  a crashed append leaves no visible rows.
- ``<index_dir>/postings/tb=<bucket>/`` — (term, tf, doc_id) rows under
  hive-style term-bucket directories (tb = pmod(xxhash64(term),
  n_term_buckets)), appended EXECUTOR-DIRECT via
  :func:`banded_index.direct_partitioned_append` with an append id
  derived from the micro-batch id — deterministic final names + the
  writer's skip-if-landed rule make the postings append REPLAY-
  IDEMPOTENT: a crashed attempt's landed buckets are skipped, holes are
  filled, never duplicated. Untrusted filesystems fall back to the
  dynamic-partition committer (slower, never wrong; warned once).
- ``<index_dir>_docidx`` — a :class:`BandedFingerprintIndex` over the
  indexed doc ids, so the per-batch "already indexed?" replay guard
  reads only the batch's OWN id bands instead of the whole doclen
  column (``history_probe="scan"`` keeps the full-column path for A/B).

Layout guard: ``<index_dir>/_meta.json`` pins ``n_term_buckets`` /
``id_col`` (staged-then-renamed write — a torn meta cannot wedge
replays). A processor or probe whose configuration contradicts the
stored layout REFUSES loudly: probing across a bucket-count change would
silently miss posting lists — the config-drift class the banded and IVF
indexes already close.

Crash matrix (postings FIRST — that append is replay-idempotent in both
guard modes, so every window before the doclen commit replays cleanly
with no marker at all; the marker brackets only doclen → docidx):
- die during/after the postings append, before doclen: nothing is
  authoritatively indexed; the replay's guard passes every doc, the
  postings re-append under the SAME append id skips landed buckets and
  fills holes (direct path) or anti-joins (term, doc) against the
  batch's buckets (committer fallback), doclen commits once. This is
  the whole crash story for ``history_probe="scan"``, which keeps no
  marker.
- die between doclen and the docidx append (bucketed only): the replay
  sees the surviving marker, falls back to the authoritative doclen
  scan, and captures the crashed window's docs as the ids doclen
  recorded but the docidx append never reached (ids already in the
  sidecar were fully committed by EARLIER batches — their postings live
  under a different append id, so re-appending them would duplicate,
  not fill). Their postings are re-appended GUARDED — a (term, doc)
  anti-join against the touched buckets, under an id distinct from the
  main append's — because the crashed attempt's append id is unknowable
  after a checkpoint re-point, so name-based skipping cannot be trusted
  on this path (and sharing the main id would let heal-written files
  make the main append's same-band files skip); their docidx rows are
  healed. The append id pins the CONTENT (an id+text fingerprint of the
  deterministically-deduped batch — min text per id, so a replay
  re-derives byte-identical rows), so a re-pointed checkpoint reusing
  batch ids with different data can neither be silently skipped nor mix
  two texts' postings under one landed/unlanded bucket split.
- die after postings, before the marker clears: same heal path; every
  re-append is a no-op or harmless.

Maintenance: every ``maintain_every`` batches the processor compacts the
``_docidx`` sidecar (the banded index's own per-band maintenance) AND the
postings/doclen directories (:func:`maintain_search_index`) — each batch
appends one file per touched ``tb=`` bucket plus one doclen file, and
without compaction probe listing/footer cost grows linearly with stream
age. The compactor is size-tiered (small files merge into a segment;
segments ≥ the byte target graduate and are never rewritten) and
journaled (crash mid-merge heals at the next open — processor, probe,
and maintenance all run :func:`recover_search_index` first).

Probe: :func:`bm25_over_index` — the batch BM25 scorer over a
partition-pruned scan of the query terms' buckets only. At 100 TB the
probe reads |terms| buckets of the store, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .banded_index import (
    BandedFingerprintIndex,
    direct_partitioned_append,
    hadoop_read_json,
)
from ._exact_guard import _settle_indexes

_META = "_meta.json"
_SCHEMA_TAG = "search:doclen-id:id-only"


class SearchIndexLayoutError(RuntimeError):
    pass


def _postings_dir(index_dir: str) -> str:
    return index_dir.rstrip("/") + "/postings"


def _doclen_dir(index_dir: str) -> str:
    return index_dir.rstrip("/") + "/doclen"


def _docidx_path(index_dir: str) -> str:
    return index_dir.rstrip("/") + "_docidx"


def _id_pairs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(fp = doc id as string, fpk = xxhash64) rows for the id sidecar —
    the exact-dedup sidecar layout with ids in place of fingerprints."""
    fp = F.col(id_col).cast("string")
    return df.select(fp.alias("fp")).withColumn("fpk", F.xxhash64(F.col("fp")))


def term_bucket(col, n_term_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_term_buckets)).cast("int")


def _check_meta(
    spark, index_dir: str, n_term_buckets: int, id_col: str,
    id_type: str | None = None,
) -> None:
    """Adopt-or-refuse against the persisted layout; write it if absent
    (the families' shared meta-guard helper — see ``state_store``).
    ``id_type`` (the id column's Spark type, advisory — recorded, never
    validated) lets delete ops burn correctly-typed ids before any data
    exists."""
    from .state_store import adopt_or_refuse_meta

    adopt_or_refuse_meta(
        spark,
        index_dir.rstrip("/") + "/" + _META,
        {"n_term_buckets": int(n_term_buckets), "id_col": id_col},
        SearchIndexLayoutError,
        f"search index at {index_dir}",
        consequence=(
            "Probing or appending across a bucket-count change silently "
            "corrupts posting-list lookups — re-point the stream or "
            "rebuild the index directory."
        ),
        advisory={"id_type": id_type} if id_type else None,
    )


def load_index_meta(spark, index_dir: str) -> dict:
    meta = hadoop_read_json(spark, index_dir.rstrip("/") + "/" + _META)
    if meta is None:
        raise SearchIndexLayoutError(
            f"no _meta.json under {index_dir}: not an incremental search "
            f"index (or its first batch never committed)"
        )
    return meta


def _postings_bucket_dirs(spark, index_dir: str) -> list[str]:
    """Existing ``tb=`` bucket directory paths under the postings store
    (one root readdir; [] when the store was never written)."""
    from .banded_index import hadoop_list_names

    jvm = spark._jvm
    pdir = _postings_dir(index_dir)
    jp = jvm.org.apache.hadoop.fs.Path(pdir)
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jp):
        return []
    return [
        f"{pdir}/{name}"
        for name in hadoop_list_names(jvm, fs, jp)
        if name.startswith("tb=")
    ]


def recover_search_index(spark, index_dir: str, buckets: list[int] | None = None) -> None:
    """Heal any crashed compaction on the index's append-per-batch
    directories (doclen + the postings buckets — ``buckets=None`` walks
    all of them, a bounded ≤ n_term_buckets listing; a probe passes just
    its query terms' buckets). Must run before reading an index a dead
    maintenance pass may have left mid-merge — the owners (the stream
    processor at open, :func:`bm25_over_index` per probe,
    :func:`maintain_search_index` itself) all do."""
    from .state_store import recover_dir_compaction

    recover_dir_compaction(spark, _doclen_dir(index_dir))
    if buckets is None:
        dirs = _postings_bucket_dirs(spark, index_dir)
    else:
        pdir = _postings_dir(index_dir)
        dirs = [f"{pdir}/tb={b}" for b in buckets]
    for d in dirs:
        recover_dir_compaction(spark, d)


def delete_from_search_index(spark, index_dir: str, ids: list) -> int:
    """Tombstone document ids: from this call on, probes exclude them
    (``bm25_over_index`` anti-joins postings AND doclen, so scores, df,
    and corpus stats all rank exactly as if the docs were physically
    gone), maintenance folds their rows out of every file it rewrites,
    and the stream BURNS the ids at batch entry — a replayed or re-sent
    doc under a tombstoned id can never be re-indexed. Physical removal
    is :func:`purge_search_tombstones`. Returns how many of the ids were
    actually indexed (all requested ids are tombstoned regardless — a
    delete may race a doc that is still in flight). Single-writer
    discipline: run between micro-batches of a HEALTHY stream — replay a
    crashed batch before issuing deletes."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import types as T

    from ..errors import is_path_not_found

    meta = load_index_meta(spark, index_dir)
    id_col = meta["id_col"]
    from .tombstones import tombstones_path

    doclen = None
    try:
        doclen = spark.read.parquet(_doclen_dir(index_dir))
        doclen.schema
    except AnalysisException as exc:
        # a delete may race the very first batch (index created, nothing
        # committed yet) or follow an erase-everything purge (dataless
        # dir): the ids still burn, nothing is stored yet
        from ..errors import is_missing_or_dataless

        if not is_missing_or_dataless(exc):
            raise
    if doclen is not None:
        ids_df = spark.createDataFrame(
            [(i,) for i in ids], T.StructType([doclen.schema[id_col]])
        )
        stored = doclen.join(F.broadcast(ids_df), id_col, "left_semi").count()
    else:
        # the advisory id_type recorded at index creation keeps even a
        # pre-first-commit burn correctly typed (string-keyed indexes
        # would otherwise get a long-typed tombstone file whose anti-join
        # silently never matches)
        idt = meta.get("id_type", "bigint")
        ids_df = spark.createDataFrame([(i,) for i in ids], f"{id_col} {idt}")
        stored = 0
    ids_df.distinct().coalesce(1).write.mode("append").parquet(
        tombstones_path(index_dir)
    )
    return int(stored)


def _search_tombstones(spark, index_dir: str, id_col: str):
    """Distinct tombstoned ids as a (id_col) frame, or None."""
    from .tombstones import read_tombstones

    tomb = read_tombstones(spark, index_dir)
    if tomb is None:
        return None
    return tomb.select(id_col).distinct()


def purge_search_tombstones(spark, index_dir: str, clear: bool = False) -> dict:
    """Physically drop tombstoned docs from the index: rewrite ONLY the
    postings buckets that contain them (one thin column-pruned scan names
    the buckets — bounded by n_term_buckets) plus the doclen directory,
    through the same journaled compactor maintenance uses (force mode,
    graduated segments included), so a crash anywhere heals at the next
    open. Probes rank identically before and after (they anti-join the
    tombstone set) — purge timing is an operations choice, not a
    correctness event. The tombstone set is KEPT by default (the id stays
    burned — the ``_docidx`` replay guard still holds it, so a re-sent id
    is skipped in both guard modes); ``clear=True`` drops it when the
    erasure must also forget the ids. Single-writer: stream stopped or
    between batches."""
    from pyspark.errors import AnalysisException

    from ..errors import is_path_not_found
    from .state_store import compact_small_files
    from .tombstones import tombstones_path

    meta = load_index_meta(spark, index_dir)
    id_col = meta["id_col"]
    recover_search_index(spark, index_dir)
    tomb = _search_tombstones(spark, index_dir, id_col)
    if tomb is None:
        return {"buckets_purged": 0, "docs_purged": 0}
    pdir = _postings_dir(index_dir)
    tbs: list[int] = []
    try:
        post = spark.read.parquet(pdir)
        tbs = [
            r[0]
            for r in post.join(F.broadcast(tomb), id_col, "left_semi")
            .select("tb")
            .distinct()
            .collect()
        ]
    except AnalysisException as exc:
        if not is_path_not_found(exc):
            raise
    for b in sorted(tbs):
        compact_small_files(
            spark,
            f"{pdir}/tb={b}",
            exclude=tomb,
            exclude_cols=[id_col],
            force=True,
            include_graduated=True,
        )
    try:
        docs = (
            spark.read.parquet(_doclen_dir(index_dir))
            .join(F.broadcast(tomb), id_col, "left_semi")
            .count()
        )
    except AnalysisException as exc:
        if not is_path_not_found(exc):
            raise
        docs = 0
    compact_small_files(
        spark,
        _doclen_dir(index_dir),
        exclude=tomb,
        exclude_cols=[id_col],
        force=True,
        include_graduated=True,
    )
    jvm = spark._jvm
    dl_p = jvm.org.apache.hadoop.fs.Path(_doclen_dir(index_dir))
    fs = dl_p.getFileSystem(spark._jsc.hadoopConfiguration())
    # DEFENSE: on this engine an all-rows-excluded merge writes one 0-row
    # schema-bearing file (verified live), so a doclen is normally never
    # dataless and this branch stays unreachable — but the journal's
    # final=None state is layout-legal, so a filesystem/engine that does
    # produce it must not leave an unreadable index behind
    erased_all = fs.exists(dl_p) and not any(
        not st.getPath().getName().startswith(("_", "."))
        for st in fs.listStatus(dl_p)
    )
    if erased_all:
        # FULL erasure: a dataless doclen directory would read as
        # unreadable, not absent — delete doclen and postings so the
        # stream's "no doclen ⇒ nothing authoritatively indexed" first-
        # batch path applies cleanly (it invalidates the sidecar itself)
        fs.delete(dl_p, True)
        pp = jvm.org.apache.hadoop.fs.Path(pdir)
        if fs.exists(pp):
            fs.delete(pp, True)
    if clear:
        # forget the ids EVERYWHERE: without the tombstone entry burn, a
        # stale _docidx row would make bucketed-mode streams skip a
        # re-sent id forever while scan mode (doclen purged) re-indexes
        # it — fold the sidecar too, so the guard modes stay equivalent
        docidx = BandedFingerprintIndex(
            _docidx_path(index_dir), key_col="fpk", schema_tag=_SCHEMA_TAG
        )
        if erased_all:
            docidx.invalidate(spark)
        elif docidx.exists(spark):
            docidx.maintain(
                spark,
                max_files_per_band=0,
                exclude=tomb.select(
                    F.col(id_col).cast("string").alias("fp")
                ),
                exclude_cols=["fp"],
            )
        tp = jvm.org.apache.hadoop.fs.Path(tombstones_path(index_dir))
        if fs.exists(tp):
            fs.delete(tp, True)
    return {"buckets_purged": len(tbs), "docs_purged": int(docs)}


def maintain_search_index(
    spark,
    index_dir: str,
    buckets: list[int] | None = None,
    max_files_per_bucket: int = 8,
    target_segment_bytes: int = 32 << 20,
    fold_tombstones: bool = True,
) -> dict:
    """Bound the postings/doclen small-file growth: every micro-batch
    appends one file per touched ``tb=`` bucket plus one doclen file, so
    without maintenance probe listing/footer cost grows linearly with
    stream age — the failure class the banded index's ``maintain()``
    closes for the dedup sidecars. Merges each over-threshold directory's
    small files into one segment (size-tiered: segments ≥
    ``target_segment_bytes`` graduate and are never rewritten, so rewrite
    work amortizes to O(log) per byte, the LSM argument). ``buckets``
    narrows the census to the buckets the caller knows it dirtied (the
    processor passes its appends' reported bucket sets — detection cost
    scales with batch activity, not index size); None walks all buckets.
    Untouched buckets' files are never rewritten. Crash-safe via the
    manifest journal in ``state_store`` (single-writer discipline: run
    between batches, never concurrently with a probe)."""
    from .state_store import compact_small_files

    recover_search_index(spark, index_dir, buckets)
    tomb = None
    if fold_tombstones:
        meta = hadoop_read_json(spark, index_dir.rstrip("/") + "/" + _META)
        if meta is not None:
            tomb = _search_tombstones(spark, index_dir, meta["id_col"])
    ex_cols = [meta["id_col"]] if tomb is not None else None
    if buckets is None:
        dirs = _postings_bucket_dirs(spark, index_dir)
    else:
        pdir = _postings_dir(index_dir)
        dirs = [f"{pdir}/tb={b}" for b in buckets]
    buckets_compacted = 0
    files_merged = 0
    for d in dirs:
        n = compact_small_files(
            spark, d, max_files=max_files_per_bucket,
            target_bytes=target_segment_bytes,
            exclude=tomb, exclude_cols=ex_cols,
        )
        if n:
            buckets_compacted += 1
            files_merged += n
    files_merged += compact_small_files(
        spark, _doclen_dir(index_dir), max_files=max_files_per_bucket,
        target_bytes=target_segment_bytes,
        exclude=tomb, exclude_cols=ex_cols,
    )
    return {"buckets_compacted": buckets_compacted, "files_merged": files_merged}


def make_search_index_processor(
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_term_buckets: int = 64,
    n_bands: int | None = None,
    history_probe: str = "bucketed",
    maintain_every: int | None = 16,
    maintain_max_files: int = 8,
    fs_options: dict | None = None,
):
    """The ``foreachBatch`` processor behind :func:`start_incremental_search_index`,
    exposed so tests and batch backfills can drive micro-batches directly.

    Contract: the index is append-only per document id — a replayed or
    re-sent id is skipped (its first indexed text wins). Re-indexing
    changed documents belongs to a rebuild, exactly like the IVF add
    path's frozen-quantizer contract."""
    from ..functions import text as T

    if history_probe not in ("bucketed", "scan"):
        raise ValueError(
            f"unknown history_probe {history_probe!r}: expected 'bucketed' or 'scan'"
        )
    docidx = BandedFingerprintIndex(
        _docidx_path(index_dir),
        key_col="fpk",
        n_bands=n_bands,
        schema_tag=_SCHEMA_TAG,
        fs_options=fs_options,
    )
    idx_settled: list[bool] = []
    n_done: list[int] = [0]
    meta_ok: list[bool] = []
    resolved_dest: list = []  # cached (kind, dest) for the postings append
    warned_committer: list[bool] = []
    # buckets dirtied since the last maintenance tick, reported by the
    # direct append itself — so maintain() lists only what this stream
    # actually touched (batch-proportional detection, the banded index's
    # dirty-set discipline). The committer fallback reports nothing:
    # dirty_unknown degrades the next tick to one full (≤ n_term_buckets)
    # walk.
    dirty_tb: set[int] = set()
    dirty_unknown: list[bool] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        from ..errors import is_path_not_found

        spark = batch_df.sparkSession
        if not meta_ok:
            # open-time heal BEFORE anything reads postings/doclen: a
            # prior process may have died mid-compaction, leaving a
            # merged segment and its inputs simultaneously visible
            recover_search_index(spark, index_dir)
            _check_meta(
                spark, index_dir, n_term_buckets, id_col,
                id_type=batch_df.schema[id_col].dataType.simpleString(),
            )
            meta_ok.append(True)
        use_index = history_probe == "bucketed"
        # Intra-batch winner must be DETERMINISTIC (min text per id), not
        # dropDuplicates' partition-order pick: the append id fingerprints
        # the batch CONTENT, so a crashed-then-replayed batch that chose a
        # different winner would skip the crashed attempt's landed buckets
        # (text A's postings) by name while filling unlanded ones with
        # text B's — exactly the mixed-postings state the fingerprint
        # exists to prevent. min(text) re-derives byte-identical rows on
        # every replay, and the fingerprint below is computed over THESE
        # deduped rows so two raw batches that dedup identically converge
        # on the same append id.
        deduped = batch_df.groupBy(id_col).agg(F.min(text_col).alias(text_col))
        fresh = deduped
        # burned ids: a tombstoned id can never be (re-)indexed, in either
        # guard mode — the content was erased. Read per batch (one fs stat
        # when no delete was ever issued). The append-id fingerprint stays
        # computed over the PRE-burn `deduped` rows so a replayed batch
        # converges on the same skip-if-landed names even if a delete
        # landed between the attempt and its replay; any postings the
        # crashed attempt landed for a then-tombstoned doc are hidden by
        # the probe's anti-join and folded out by maintenance.
        tomb = _search_tombstones(spark, index_dir, id_col)
        if tomb is not None:
            fresh = fresh.join(F.broadcast(tomb), id_col, "left_anti")
        doclen_dir = _doclen_dir(index_dir)
        hist = None
        try:
            hist = spark.read.parquet(doclen_dir)
            hist.schema
        except AnalysisException as exc:
            if not is_path_not_found(exc):
                raise
        if hist is None:
            # no doclen ⇒ nothing is authoritatively indexed; a surviving
            # sidecar describes a gone index and must die on every
            # observation of absence (the exact-dedup rule)
            docidx.invalidate(spark)
            if not idx_settled:
                idx_settled.append(True)
        elif not use_index and not idx_settled:
            docidx.invalidate(spark)
            idx_settled.append(True)
        need_heal = False
        if hist is not None and use_index:
            _settle_indexes(
                spark, ((docidx, lambda: _id_pairs(hist, id_col)),), idx_settled
            )
            need_heal = docidx.was_inflight(spark)
        replayed = None
        if hist is not None:
            if use_index and not need_heal:
                bands = docidx.touched_bands(_id_pairs(fresh, id_col).select("fpk"))
                rows = docidx.read_bands(spark, bands) if bands else None
                if rows is not None:
                    fresh = fresh.join(
                        rows.select(F.col("fp").cast("string").alias("__seen")),
                        fresh[id_col].cast("string") == F.col("__seen"),
                        "left_anti",
                    )
            else:
                seen = hist.select(F.col(id_col))
                if need_heal:
                    # the crashed window's docs are the ones doclen recorded
                    # but the docidx append never reached — ids ALREADY in
                    # the sidecar were fully committed by earlier batches
                    # (their postings live under a DIFFERENT append id, so
                    # re-appending them would duplicate, not fill holes)
                    repl = fresh.join(seen, id_col, "left_semi")
                    rb = docidx.touched_bands(_id_pairs(repl, id_col).select("fpk"))
                    rrows = docidx.read_bands(spark, rb) if rb else None
                    if rrows is not None:
                        repl = repl.join(
                            rrows.select(F.col("fp").cast("string").alias("__done")),
                            repl[id_col].cast("string") == F.col("__done"),
                            "left_anti",
                        )
                    replayed = repl
                fresh = fresh.join(seen, id_col, "left_anti")

        # Content fingerprint of the DEDUPED batch — ids AND winner text,
        # because the append id's job is to pin the CONTENT THAT WILL BE
        # INDEXED: a checkpointed replay (identical batch, deterministic
        # winner) converges on the same skip-if-landed names, while a
        # re-pointed checkpoint reusing a batch id with corrected text
        # gets different names and can never mix two texts' postings
        # under one document. Computed over `deduped` (not the raw batch)
        # so a raw batch that merely reorders or repeats rows of the same
        # logical content still converges. One tiny column-agg job.
        fp_row = deduped.select(
            F.coalesce(
                F.sum(
                    F.xxhash64(
                        F.concat_ws(
                            ":", F.col(id_col).cast("string"), F.col(text_col)
                        )
                    ).cast("decimal(38,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        batch_fp = int(fp_row["s"]) % (1 << 60)
        append_id = f"srchb{batch_id:x}-{batch_fp:015x}-{int(fp_row['n']):x}"

        def postings_of(df: DataFrame) -> DataFrame:
            toks = df.select(
                F.col(id_col), F.explode(T.tokens(F.col(text_col))).alias("term")
            )
            return (
                toks.groupBy("term", id_col)
                .agg(F.count(F.lit(1)).alias("tf"))
                .withColumn("tb", term_bucket(F.col("term"), n_term_buckets))
            )

        def _anti_join_existing(post: DataFrame) -> DataFrame:
            """(term, doc) rows of ``post`` not already in the store —
            reading only the batch's own bucket directories (column-pruned
            to the join key). The explicit guard for appends that cannot
            rely on deterministic names."""
            tbs = [r[0] for r in post.select("tb").distinct().collect()]
            if not tbs:
                return post
            try:
                existing = (
                    spark.read.parquet(_postings_dir(index_dir))
                    .filter(F.col("tb").isin(tbs))
                    .select("term", id_col)
                )
                existing.schema
            except AnalysisException as exc:
                if not is_path_not_found(exc):
                    raise
                return post
            return post.join(existing, ["term", id_col], "left_anti")

        def append_postings(post: DataFrame, aid: str, guard: bool) -> None:
            """``guard=False`` (the steady-state batch append) relies on the
            deterministic append id for replay idempotence on the direct
            path; ``guard=True`` (the heal path) anti-joins at (term, doc)
            first — a heal's rows may have landed under a DIFFERENT
            append id (the crashed attempt's), so name-based skipping
            cannot see them, and the heal's own id must differ from the
            main append's so a heal that writes files can never cause the
            main append's same-band files to be skipped."""
            post = post.persist()
            try:
                if guard:
                    post_w = _anti_join_existing(post).persist()
                else:
                    post_w = post
                written = direct_partitioned_append(
                    post_w,
                    _postings_dir(index_dir),
                    "tb",
                    fs_options=fs_options,
                    resolved=resolved_dest[0] if resolved_dest else None,
                    append_id=aid,
                )
                if written is not None:
                    dirty_tb.update(written)
                if written is None:
                    if not warned_committer:
                        import logging

                        logging.getLogger(__name__).warning(
                            "incremental search index at %s: no trusted "
                            "direct-append mapping for this filesystem — "
                            "falling back to the dynamic-partition committer "
                            "(~10 ms driver commit per bucket directory per "
                            "batch) plus a (term, doc) anti-join whose read "
                            "is INDEX-PROPORTIONAL in the touched buckets "
                            "every batch. Add the filesystem to the trusted "
                            "direct-append mapping for batch-proportional "
                            "appends.",
                            index_dir,
                        )
                        warned_committer.append(True)
                    # the committer has no skip-if-landed names: the guard
                    # is mandatory here
                    final = post_w if guard else _anti_join_existing(post_w)
                    final.repartition("tb").write.partitionBy("tb").mode(
                        "append"
                    ).parquet(_postings_dir(index_dir))
                    # the committer reports no bucket set: degrade the
                    # next maintenance tick to a full bucket walk
                    if not dirty_unknown:
                        dirty_unknown.append(True)
                if guard:
                    post_w.unpersist()
            finally:
                post.unpersist()

        if not resolved_dest:
            from .banded_index import _resolve_direct_destination

            kind, dest, _ = _resolve_direct_destination(
                spark, _postings_dir(index_dir)
            )
            # cache even the untrusted (None, ...) answer: the probe
            # (pyarrow construction / JNI load) must run once per stream,
            # not once per micro-batch
            resolved_dest.append((kind, dest))

        if use_index and need_heal and replayed is not None:
            # docs recorded in doclen whose postings/docidx rows the
            # crashed attempt may not have landed: guarded re-append under
            # a DISTINCT id — their rows may sit under the crashed
            # attempt's (unknowable) append id, and sharing the main
            # append's id would let a heal that writes files make the main
            # append's same-band files skip
            append_postings(postings_of(replayed), append_id + "h", guard=True)
            from ._exact_guard import _heal_exact_index

            _heal_exact_index(spark, docidx, _id_pairs(replayed, id_col))

        from pyspark.storagelevel import StorageLevel

        # one tokenize for postings + doclen + sidecar (batch-bounded
        # persist, unpersisted before return — the foreachBatch rule)
        enriched = fresh.select(
            F.col(id_col), T.tokens(F.col(text_col)).alias("tk")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            post = (
                enriched.select(F.col(id_col), F.explode("tk").alias("term"))
                .groupBy("term", id_col)
                .agg(F.count(F.lit(1)).alias("tf"))
                .withColumn("tb", term_bucket(F.col("term"), n_term_buckets))
            )
            # postings FIRST: this append is replay-idempotent, so a crash
            # anywhere before the doclen commit replays cleanly in BOTH
            # guard modes (scan mode has no marker — it must not have a
            # loss window after doclen)
            append_postings(post, append_id, guard=False)
            if use_index:
                docidx.mark_inflight(spark)
            (
                enriched.select(F.col(id_col), F.size("tk").alias("dl"))
                .filter(F.col("dl") > 0)
                .write.mode("append")
                .parquet(doclen_dir)
            )
            if use_index:
                docidx.append(_id_pairs(enriched, id_col))
                docidx.clear_inflight(spark)
        finally:
            enriched.unpersist()
        n_done[0] += 1
        if maintain_every and n_done[0] % maintain_every == 0:
            if use_index:
                docidx.maintain(spark, max_files_per_band=maintain_max_files)
            # postings + doclen gain one file per batch in BOTH guard
            # modes; compact the buckets this stream dirtied (full walk
            # only after a committer-fallback append, which reports none)
            maintain_search_index(
                spark,
                index_dir,
                buckets=None if dirty_unknown else sorted(dirty_tb),
                max_files_per_bucket=maintain_max_files,
            )
            dirty_tb.clear()
            dirty_unknown.clear()

    return process


def start_incremental_search_index(
    docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_term_buckets: int = 64,
    available_now: bool = True,
    history_probe: str = "bucketed",
    maintain_every: int | None = 16,
    maintain_max_files: int = 8,
    fs_options: dict | None = None,
):
    """``docs`` is a streaming DataFrame of documents. Maintains the
    term-bucketed postings store + doclen sidecar + id replay guard under
    ``index_dir``; probe with :func:`bm25_over_index`."""
    process = make_search_index_processor(
        index_dir,
        id_col=id_col,
        text_col=text_col,
        n_term_buckets=n_term_buckets,
        history_probe=history_probe,
        maintain_every=maintain_every,
        maintain_max_files=maintain_max_files,
        fs_options=fs_options,
    )
    writer = docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# sentinel distinguishing "resolve tombstones yourself" from an explicit
# None (caller already checked: no deletes exist)
_UNSET = object()


def pruned_postings(
    spark,
    index_dir: str,
    terms: list[str],
    id_col: str = "doc_id",
    tomb=_UNSET,
    heal: bool = True,
) -> DataFrame:
    """(term, id, tf) posting lists for a term set, pruned to the terms'
    ``tb=`` buckets, crash-healed (a dead maintenance pass may have left
    a merged segment and its inputs simultaneously visible), and
    tombstone-filtered. The shared probe plumbing under every lexical
    query, batch or stream.

    The probe's fixed overhead is engineered out of the hot path
    (measured ~0.6 s of a ~1.2 s wall before round 12's tuning):

    - the bucket of each query term is computed DRIVER-SIDE with the
      pure-Python twin of the writer's ``pmod(xxhash64(term), n)``
      expression (``functions/hashing.py``, engine-parity pinned by a
      property test) — evaluating it through the engine was a whole job
      submission per probe;
    - the scan reads the bucket directories by EXPLICIT path (one root
      readdir filters to buckets that exist), so DataFrame creation
      never lists or footer-reads the other n_term_buckets − |terms|
      directories; the residual ``tb IN`` filter keeps the pruning
      visible in the plan (and harmless if a caller widens the paths).

    ``tomb``/``heal`` let a composite probe (``bm25_over_index``) resolve
    the tombstone set and run the crash heal ONCE for all its reads
    instead of per helper."""
    from ..functions.hashing import pmod_bucket, xxhash64 as _xxh

    meta = load_index_meta(spark, index_dir)
    ntb = int(meta["n_term_buckets"])
    tbs = sorted({pmod_bucket(_xxh(t), ntb) for t in terms})
    if heal:
        recover_search_index(spark, index_dir, buckets=tbs)
    pdir = _postings_dir(index_dir)
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(pdir)
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    paths: list[str] = []
    if fs.exists(jp):
        from .banded_index import hadoop_list_names

        existing = set(hadoop_list_names(jvm, fs, jp))
        for b in tbs:
            if f"tb={b}" not in existing:
                continue
            # a bucket dir can exist with ZERO data files (an all-rows-
            # tombstoned merge journals final=None and deletes every
            # input) — schema inference over it would crash the probe,
            # so dataless dirs are skipped like absent ones. ≤ |terms|
            # bounded listings.
            d = f"{pdir}/tb={b}"
            if any(
                not st.getPath().getName().startswith(("_", "."))
                for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(d))
            ):
                paths.append(d)
    if not paths:
        idt = meta.get(
            "id_type", "bigint"
        )  # advisory, recorded at index creation
        return spark.createDataFrame(
            [], f"term string, {id_col} {idt}, tf bigint"
        )
    postings = (
        spark.read.option("basePath", pdir)
        .parquet(*paths)
        .filter(F.col("tb").isin(tbs) & F.col("term").isin(terms))
        .select("term", id_col, "tf")
    )
    if tomb is _UNSET:
        tomb = _search_tombstones(spark, index_dir, id_col)
    if tomb is not None:
        postings = postings.join(F.broadcast(tomb), id_col, "left_anti")
    return postings


def index_doclen(
    spark, index_dir: str, id_col: str = "doc_id", tomb=_UNSET,
    heal: bool = True,
) -> DataFrame:
    """The doclen sidecar minus tombstoned docs — so BM25's corpus stats
    (N, avgdl) and df exclude logically-deleted docs exactly as a
    post-purge index would. Every batch consumer of the shared store
    must take doclen from HERE (not a raw directory read), or its scores
    drift across the physical purge."""
    from pyspark.errors import AnalysisException

    from ..errors import is_missing_or_dataless

    if heal:
        recover_search_index(spark, index_dir, buckets=[])
    try:
        doclen = spark.read.parquet(_doclen_dir(index_dir))
        doclen.schema
    except AnalysisException as exc:
        # absent or dataless (an erase-everything purge): empty, typed
        # from the layout meta's advisory id_type
        if not is_missing_or_dataless(exc):
            raise
        idt = load_index_meta(spark, index_dir).get("id_type", "bigint")
        return spark.createDataFrame([], f"{id_col} {idt}, dl bigint")
    if tomb is _UNSET:
        tomb = _search_tombstones(spark, index_dir, id_col)
    if tomb is not None:
        doclen = doclen.join(F.broadcast(tomb), id_col, "left_anti")
    return doclen


def index_postings_full(
    spark, index_dir: str, id_col: str = "doc_id", tomb=_UNSET
) -> DataFrame:
    """The FULL postings frame (every bucket) minus tombstoned docs — for
    passes whose term set is data-derived rather than query-derived
    (Rocchio's candidate-vocabulary scoring), which cannot prune by term.
    Corpus-proportional by construction; the tombstone anti-join keeps
    even these passes purge-invariant."""
    recover_search_index(spark, index_dir)
    df = spark.read.parquet(_postings_dir(index_dir))
    if tomb is _UNSET:
        tomb = _search_tombstones(spark, index_dir, id_col)
    if tomb is not None:
        df = df.join(F.broadcast(tomb), id_col, "left_anti")
    return df


def bm25_over_index(
    spark,
    index_dir: str,
    terms: list[str],
    topn: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-``topn`` over the shared index layout (stream-maintained
    or batch-staged — one artifact since round 12): the query terms'
    buckets are computed from the persisted layout meta and pushed as a
    partition-pruning ``isin`` on ``tb`` — the scan touches ≤ |terms|
    bucket directories of the postings store, never the corpus.
    Tombstoned docs are excluded from hits, df, and corpus stats (the
    ranking a post-purge index produces, so purge timing never changes
    results). Scoring is the batch scorer (``operators/search.bm25_topk``),
    so stream-maintained and batch-staged indexes rank identically."""
    from ..operators.search import bm25_topk

    # one tombstone resolution + one heal for both reads (pruned_postings'
    # heal covers the query buckets AND doclen)
    tomb = _search_tombstones(spark, index_dir, id_col)
    postings = pruned_postings(
        spark, index_dir, terms, id_col=id_col, tomb=tomb
    )
    doclen = index_doclen(
        spark, index_dir, id_col=id_col, tomb=tomb, heal=False
    )
    return bm25_topk(postings, doclen, terms, id_col=id_col, topn=topn)
