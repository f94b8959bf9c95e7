"""The PATH_NOT_FOUND-only contract of the load-or-first-batch seams: an
existing-but-unreadable table must RAISE, never masquerade as a first
batch (the silent-duplication / partition-overwrite data-loss mode)."""

from __future__ import annotations

import pytest

from fest_vibes_ai_etl_spark.errors import is_path_not_found


class _FakeExc(Exception):
    def __init__(self, cond):
        super().__init__(cond or "boom")
        self._cond = cond

    def getCondition(self):
        return self._cond


def test_is_path_not_found_by_condition():
    assert is_path_not_found(_FakeExc("PATH_NOT_FOUND")) is True
    assert is_path_not_found(_FakeExc("UNABLE_TO_INFER_SCHEMA")) is False
    assert is_path_not_found(_FakeExc("INTERNAL_ERROR")) is False


def test_is_path_not_found_message_fallback():
    # exceptions without the condition accessor fall back to message text
    assert is_path_not_found(Exception("[PATH_NOT_FOUND] Path does not exist"))
    assert not is_path_not_found(Exception("Unable to infer schema for Parquet"))


def test_unreadable_existing_table_raises_not_first_batch(spark, tmp_path):
    # an EXISTING but unreadable (empty) directory raises
    # UNABLE_TO_INFER_SCHEMA — the sketch snapshot loader must propagate
    # it, not return the "no snapshot yet" None
    from pyspark.errors import AnalysisException

    from fest_vibes_ai_etl_spark.streaming.sketch_rollup import _latest_snapshot

    empty = tmp_path / "existing_but_empty"
    empty.mkdir()
    with pytest.raises(AnalysisException):
        _latest_snapshot(spark, str(empty))
    # genuinely missing path is the legitimate first-batch signal
    assert _latest_snapshot(spark, str(tmp_path / "missing")) is None


def test_incremental_dedup_raises_on_unreadable_history(spark, tmp_path):
    # same contract through the foreachBatch operator: empty-but-existing
    # corpus dir must FAIL the stream, not re-append the batch
    from fest_vibes_ai_etl_spark.streaming.incremental_dedup import (
        start_incremental_dedup,
    )

    src = tmp_path / "src"
    corpus = tmp_path / "corpus"
    corpus.mkdir()  # exists, unreadable as parquet
    spark.createDataFrame(
        [(1, "a document")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = start_incremental_dedup(stream, str(corpus), str(tmp_path / "ckpt"))
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        assert q.awaitTermination(120), "stream did not finish in 120s"
