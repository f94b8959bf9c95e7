"""Banded fingerprint index: partition-pruned probes, scan/bucketed
equivalence of the incremental dedup streams, and crash-gap healing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.streaming.banded_index import BandedFingerprintIndex
from fest_vibes_ai_etl_spark.streaming.incremental_near_dedup import (
    near_index_path,
    start_incremental_near_dedup,
)
from fest_vibes_ai_etl_spark.streaming.incremental_span_dedup import (
    span_index_path,
    start_incremental_span_dedup,
)

PASSAGE = "the quick brown fox jumps over the lazy dog near the river bank"
B1 = [(1, "alpha beta " + PASSAGE + " gamma delta epsilon"),
      (2, "unrelated first batch content about query engines and storage"),
      (3, "a third completely independent document mentioning nothing shared")]
B2 = [(10, "one two three " + PASSAGE + " four five six seven"),
      (11, "totally novel second batch document with fresh vocabulary"),
      (2000, "unrelated first batch content about query engines and storage")]


def _write_batches(spark, src):
    for i, rows in enumerate((B1, B2)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)


def _run_span(spark, src, corpus, ckpt, mode, n_bands=16):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_incremental_span_dedup(
        stream, corpus, ckpt, k=20, w=15, min_shared=3,
        n_bands=n_bands, history_probe=mode,
    )
    q.awaitTermination(180)


def _run_near(spark, src, corpus, ckpt, mode, n_buckets=16):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_incremental_near_dedup(
        stream, corpus, ckpt, k=3, num_hashes=32, bands=8, threshold=0.2,
        n_buckets=n_buckets, history_probe=mode,
    )
    q.awaitTermination(180)


def test_index_roundtrip_prunes_partitions(spark, tmp_path):
    pairs = spark.range(2000).select(F.col("id"), F.xxhash64("id").alias("fp"))
    idx = BandedFingerprintIndex(str(tmp_path / "idx"), "fp", n_bands=8)
    idx.build_from(pairs)
    # band directories on disk
    dirs = sorted(d for d in os.listdir(tmp_path / "idx") if d.startswith("pband="))
    assert dirs == [f"pband={i}" for i in range(8)]
    # pruned read returns exactly the rows of the requested bands, and the
    # plan prunes at the PARTITION level (not scan-then-filter)
    pruned = idx.read_bands(spark, [2, 5])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pband" in plan
    got = {(r.id, r.fp) for r in pruned.collect()}
    want = {
        (r.id, r.fp)
        for r in pairs.withColumn("b", F.pmod("fp", F.lit(8))).filter(
            F.col("b").isin([2, 5])
        ).collect()
    }
    assert got == want and got
    # append lands in the right bands and survives a re-read
    idx.append(spark.createDataFrame([(999999, 13)], "id long, fp long"))
    assert (999999, 13) in {
        (r.id, r.fp) for r in idx.read_bands(spark, [13 % 8]).collect()
    }


def test_index_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    idx = BandedFingerprintIndex(str(tmp_path / "idx"), "fp", n_bands=4)
    for batch in range(5):  # streaming shape: one small file per band per batch
        idx.append(
            spark.range(batch * 100, batch * 100 + 100).select(
                F.col("id"), F.xxhash64("id").alias("fp")
            )
        )
    before = {(r.id, r.fp) for r in spark.read.parquet(str(tmp_path / "idx")).select("id", "fp").collect()}

    def n_files():
        return sum(
            len([f for f in os.listdir(os.path.join(tmp_path / "idx", d)) if f.endswith(".parquet")])
            for d in os.listdir(tmp_path / "idx") if d.startswith("pband=")
        )

    files_before = n_files()
    assert files_before >= 20  # 5 appends x 4 bands
    idx.compact(spark)
    assert n_files() <= 4  # one file per band
    after = {(r.id, r.fp) for r in spark.read.parquet(str(tmp_path / "idx")).select("id", "fp").collect()}
    assert after == before
    # pruned reads still work post-compaction
    assert idx.read_bands(spark, [0]).count() > 0


def test_index_compaction_crash_recovery_and_refusal(spark, tmp_path):
    import shutil

    import pytest

    base = str(tmp_path / "idx")
    idx = BandedFingerprintIndex(base, "fp", n_bands=4)
    idx.append(spark.range(100).select(F.col("id"), F.xxhash64("id").alias("fp")))
    rows = {(r.id, r.fp) for r in spark.read.parquet(base).select("id", "fp").collect()}
    # crash between compact()'s two renames: live index only at _precompact
    os.rename(base, base + "_precompact")
    idx.compact(spark)  # must restore, then compact normally
    assert {(r.id, r.fp) for r in spark.read.parquet(base).select("id", "fp").collect()} == rows
    assert not os.path.exists(base + "_precompact")
    # both live and _precompact present: refuse rather than bury the live one
    shutil.copytree(base, base + "_precompact")
    with pytest.raises(RuntimeError, match="refusing to compact"):
        idx.compact(spark)
    assert os.path.exists(base) and os.path.exists(base + "_precompact")


def _stored_ids(spark, corpus):
    return {r.doc_id for r in spark.read.parquet(corpus).select("doc_id").collect()}


def test_span_bucketed_probe_equals_scan_probe(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    for mode in ("scan", "bucketed"):
        _run_span(spark, src, str(tmp_path / f"c_{mode}"), str(tmp_path / f"k_{mode}"), mode)
    scan_ids = _stored_ids(spark, str(tmp_path / "c_scan"))
    bucketed_ids = _stored_ids(spark, str(tmp_path / "c_bucketed"))
    assert scan_ids == bucketed_ids
    # the span rule fired cross-batch: 10 carries B1's passage, 2000 is an
    # exact dup of 2 — neither stored
    assert 10 not in scan_ids and 2000 not in scan_ids
    assert {1, 2, 3, 11} <= scan_ids


def test_near_bucketed_probe_equals_scan_probe(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    for mode in ("scan", "bucketed"):
        _run_near(spark, src, str(tmp_path / f"c_{mode}"), str(tmp_path / f"k_{mode}"), mode)
    scan_ids = _stored_ids(spark, str(tmp_path / "c_scan"))
    bucketed_ids = _stored_ids(spark, str(tmp_path / "c_bucketed"))
    assert scan_ids == bucketed_ids
    assert 2000 not in scan_ids  # exact dup dropped cross-batch
    assert {1, 2, 3} <= scan_ids


def _index_pairs(spark, idx_dir):
    return {
        (r.id, r.fp)
        for r in spark.read.parquet(idx_dir).select("id", "fp").collect()
    }


def _corpus_pairs(spark, corpus):
    return {
        (r.id, r.fp)
        for r in spark.read.parquet(corpus)
        .select(F.col("doc_id").alias("id"), F.explode("wfps").alias("fp"))
        .collect()
    }


def test_span_index_heals_after_crash_between_corpus_and_index(spark, tmp_path):
    """The crash model: a batch dies AFTER its corpus append but BEFORE
    its index append, leaving (a) corpus rows with no index pairs and (b)
    the in-flight marker. Checkpoint recovery replays exactly that batch;
    the replay must re-append the missing pairs (heal), append nothing to
    the corpus, and clear the marker. A clean run leaves no marker, so
    steady-state batches never pay the heal join."""
    from fest_vibes_ai_etl_spark.streaming.banded_index import (
        BandedFingerprintIndex,
    )

    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(B1, "doc_id long, text string").coalesce(1).write.parquet(src1)
    spark.createDataFrame(B2, "doc_id long, text string").coalesce(1).write.parquet(src2)
    _run_span(spark, src1, corpus, str(tmp_path / "k1"), "bucketed")
    _run_span(spark, src2, corpus, str(tmp_path / "k2"), "bucketed")
    idx_dir = span_index_path(corpus)
    full = _index_pairs(spark, idx_dir)
    assert full == _corpus_pairs(spark, corpus)
    n0 = spark.read.parquet(corpus).count()
    # clean runs leave no in-flight marker (heal stays zero-cost)
    assert not os.path.exists(idx_dir + ".inflight")
    # rewind the index to the pre-batch-2 state + plant the marker the
    # dying writer would have left: corpus row 11 now has no index pairs
    idx = BandedFingerprintIndex(idx_dir, "fp", n_bands=16)
    survivors = spark.read.parquet(idx_dir).select("id", "fp").filter("id != 11")
    idx.build_from(survivors)
    assert _index_pairs(spark, idx_dir) < full
    open(idx_dir + ".inflight", "w").close()
    # checkpoint recovery replays batch 2 (fresh checkpoint over src2)
    _run_span(spark, src2, corpus, str(tmp_path / "k3"), "bucketed")
    assert spark.read.parquet(corpus).count() == n0   # convergent
    assert _index_pairs(spark, idx_dir) == full       # healed
    assert not os.path.exists(idx_dir + ".inflight")  # marker cleared


def test_span_bucketed_migrates_scan_built_corpus(spark, tmp_path):
    """A corpus built with history_probe='scan' (or by an older round) has
    no index; the first bucketed batch must build it and still dedup."""
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(B1, "doc_id long, text string").coalesce(1).write.parquet(src1)
    _run_span(spark, src1, corpus, str(tmp_path / "k1"), "scan")
    assert not os.path.exists(span_index_path(corpus))
    spark.createDataFrame(B2, "doc_id long, text string").coalesce(1).write.parquet(src2)
    _run_span(spark, src2, corpus, str(tmp_path / "k2"), "bucketed")
    ids = _stored_ids(spark, corpus)
    assert 10 not in ids and 2000 not in ids and {1, 2, 3, 11} <= ids
    # migration built the index covering BOTH old and new rows
    assert _index_pairs(spark, span_index_path(corpus)) == _corpus_pairs(spark, corpus)
