"""Incremental corpus dedup: cross-batch uniqueness + replay convergence."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.sources import table
from fest_vibes_ai_etl_spark.streaming.incremental_dedup import start_incremental_dedup


def _run(spark, src, corpus, ckpt):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_incremental_dedup(stream, corpus, ckpt)
    q.awaitTermination(120)


def test_incremental_dedup_across_batches(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    src, corpus = str(tmp_path / "src"), str(tmp_path / "corpus")
    # three overlapping slices: 0-59, 40-99, 80-139 (overlaps must dedupe)
    docs.filter("doc_id < 60").coalesce(1).write.parquet(src)
    docs.filter("doc_id >= 40 AND doc_id < 100").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id >= 80 AND doc_id < 140").coalesce(1).write.mode("append").parquet(src)

    _run(spark, src, corpus, str(tmp_path / "ckpt1"))
    stored = spark.read.parquet(corpus)
    n_unique_texts = (
        docs.filter("doc_id < 140").select("text").distinct().count()
    )
    assert stored.select("fp").distinct().count() == stored.count()
    assert stored.count() == n_unique_texts

    # full replay under a fresh checkpoint appends nothing (convergent)
    _run(spark, src, corpus, str(tmp_path / "ckpt2"))
    assert spark.read.parquet(corpus).count() == n_unique_texts


def test_legacy_null_fp_history_converges(spark, tmp_path):
    # corpora written BEFORE the null-text sentinel hold fp=NULL rows;
    # the history side coalesces so an upgraded pipeline still converges
    # instead of re-appending the null-text row on every replay
    from pyspark.sql import functions as F

    corpus = str(tmp_path / "corpus")
    legacy = spark.createDataFrame(
        [(1, None, None), (2, "kept text", "k" * 32)],
        "doc_id long, text string, fp string",
    )
    legacy.write.parquet(corpus)

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(3, None), (4, "kept text")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from fest_vibes_ai_etl_spark.streaming.incremental_dedup import (
        start_incremental_dedup,
    )

    q = start_incremental_dedup(stream, corpus, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    stored = spark.read.parquet(corpus)
    # doc 3 (null text) matches legacy doc 1's NULL fp via the coalesce —
    # not re-appended; doc 4 has a different md5 than the legacy fake fp,
    # so it IS appended
    ids = {r.doc_id for r in stored.select("doc_id").collect()}
    assert ids == {1, 2, 4}
