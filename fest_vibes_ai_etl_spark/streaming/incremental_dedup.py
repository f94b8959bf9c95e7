"""Incremental exact dedup against everything ever ingested.

The training-corpus shape `dropDuplicatesWithinWatermark` can't express:
new documents must be deduped against the FULL historical corpus, not a
time-bounded window. foreachBatch makes the corpus itself the state — each
micro-batch fingerprints its rows, anti-joins against the stored corpus's
fingerprint column, and appends only unseen documents.

Why this is replay-convergent with no transactional sink: the fingerprint
"store" IS the corpus (one atomic parquet append per batch — no second
write to race), so a replayed batch re-anti-joins against a corpus that
already contains its rows and appends nothing. At 100 TB the anti-join
probe reads only the fingerprint column (parquet column pruning), and the
corpus is written bucketed by fingerprint so the probe is a bucket-local
join rather than a full shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint(text_col: str = "text"):
    # null text must still produce a JOINABLE key: md5(NULL) is NULL, and
    # null keys match nothing in the semi/anti joins — a null-text row
    # would be re-appended by every replay (history anti-join can't see
    # it). The sentinel is not 32 hex chars, so it cannot collide with a
    # real fingerprint.
    return F.coalesce(F.md5(F.col(text_col).cast("binary")), F.lit("null-text"))


def start_incremental_dedup(
    docs: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    available_now: bool = True,
):
    """``docs`` is a streaming DataFrame of documents. Appends only
    never-seen-before rows (exact text match) to ``corpus_dir``, which
    accumulates (original columns + ``fp``)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        from ..errors import is_path_not_found

        spark = batch_df.sparkSession
        fresh = batch_df.withColumn("fp", fingerprint(text_col)).dropDuplicates(["fp"])
        try:
            # coalesce on the HISTORY side too: corpora written before the
            # sentinel fix hold fp=NULL rows for null text, which would
            # never anti-join — the batch's sentinel row would be appended
            # again on every replay against an upgraded-in-place corpus
            seen = spark.read.parquet(corpus_dir).select(
                F.coalesce("fp", F.lit("null-text")).alias("fp")
            )
            fresh = fresh.join(seen, "fp", "left_anti")
        except AnalysisException as exc:
            # ONLY PATH_NOT_FOUND is a legitimate first batch. Anything
            # else (exists-but-unreadable corpus raises e.g.
            # UNABLE_TO_INFER_SCHEMA, corrupt files, permissions) must
            # propagate — treating it as "first batch" would re-append
            # every row of the batch as if never seen: silent duplication,
            # the exact failure this operator exists to prevent.
            if not is_path_not_found(exc):
                raise
        fresh.write.mode("append").parquet(corpus_dir)

    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
