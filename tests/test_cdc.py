"""CDC apply: last-wins-by-version convergence, tombstone persistence,
replay idempotence — batch core and the streaming wrapper."""

from __future__ import annotations

from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.streaming.cdc import (
    apply_cdc_batch,
    cdc_view,
    start_cdc_apply,
)

SCHEMA = "id long, part string, name string, value long, op string, version long"


def _changes(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, path):
    return {
        r.id: (r.name, r.value)
        for r in cdc_view(spark, path).collect()
    }


def test_cdc_batch_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    b1 = _changes(spark, [
        (1, "a", "one", 10, "u", 1),
        (2, "a", "two", 20, "u", 1),
        (3, "b", "three", 30, "u", 1),
    ])
    apply_cdc_batch(spark, path, b1, keys=["id"], partition_col="part")
    assert _state(spark, path) == {1: ("one", 10), 2: ("two", 20), 3: ("three", 30)}

    b2 = _changes(spark, [
        (2, "a", "two-v2", 22, "u", 2),   # update
        (3, "b", None, 0, "d", 2),        # delete
        (1, "a", "stale", 99, "u", 0),    # out-of-order: older than stored v1
        (4, "b", "four", 40, "u", 1),     # insert
    ])
    apply_cdc_batch(spark, path, b2, keys=["id"], partition_col="part")
    expect = {1: ("one", 10), 2: ("two-v2", 22), 4: ("four", 40)}
    assert _state(spark, path) == expect

    # at-least-once replay of the same batch is a no-op
    apply_cdc_batch(spark, path, b2, keys=["id"], partition_col="part")
    assert _state(spark, path) == expect

    # a late upsert with a version older than the tombstone cannot
    # resurrect the deleted key
    b3 = _changes(spark, [(3, "b", "zombie", 33, "u", 1)])
    apply_cdc_batch(spark, path, b3, keys=["id"], partition_col="part")
    assert _state(spark, path) == expect

    # untouched partition 'a' files were not rewritten by b3 (pruning)
    files_a = {f.name for f in (tmp_path / "t" / "part=a").iterdir()}
    b4 = _changes(spark, [(5, "b", "five", 50, "u", 1)])
    apply_cdc_batch(spark, path, b4, keys=["id"], partition_col="part")
    assert {f.name for f in (tmp_path / "t" / "part=a").iterdir()} == files_a


def test_cdc_stream_apply(spark, tmp_path):
    src = str(tmp_path / "src")
    _changes(spark, [
        (1, "a", "one", 10, "u", 1),
        (2, "a", "two", 20, "u", 1),
    ]).coalesce(1).write.parquet(src)
    _changes(spark, [
        (1, "a", "one-v2", 11, "u", 2),
        (2, "a", None, 0, "d", 2),
        (3, "b", "three", 30, "u", 1),
    ]).coalesce(1).write.mode("append").parquet(src)

    path = str(tmp_path / "t")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_cdc_apply(
        stream, path, str(tmp_path / "ckpt"), keys=["id"], partition_col="part"
    )
    assert q.awaitTermination(120), "stream did not finish in 120s"
    assert _state(spark, path) == {1: ("one-v2", 11), 3: ("three", 30)}


def test_cdc_on_reinsert_fires_only_for_real_resurrections(spark, tmp_path):
    """on_reinsert: a later-batch upsert of a previously-deleted key is a
    RESURRECTION (live in the table, still burned in derived indexes) and
    must be surfaced; routine updates, fresh inserts, and stale upserts
    outranked by the tombstone must not fire."""
    path = str(tmp_path / "t")
    seen: list[set] = []

    def hook(s, keys_df):
        seen.append({r.id for r in keys_df.collect()})

    def run_batch(rows, tag):
        src = str(tmp_path / f"src_{tag}")
        _changes(spark, rows).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = start_cdc_apply(
            stream, path, str(tmp_path / f"ckpt_{tag}"),
            keys=["id"], partition_col="part", on_reinsert=hook,
        )
        assert q.awaitTermination(120)

    run_batch([
        (1, "a", "one", 10, "u", 1),
        (2, "a", "two", 20, "u", 1),
    ], "b1")
    assert seen == []  # fresh inserts are not resurrections

    run_batch([
        (1, "a", None, 0, "d", 2),
        (2, "a", "two-v2", 22, "u", 2),
    ], "b2")
    assert seen == []  # a delete and a routine update

    # stale upsert (older than the tombstone) must NOT fire; the real
    # reinsert (newer version) must
    run_batch([(1, "a", "stale", 1, "u", 1)], "b3")
    assert seen == []
    assert _state(spark, path) == {2: ("two-v2", 22)}
    run_batch([(1, "a", "reborn", 30, "u", 3)], "b4")
    assert seen == [{1}]
    assert _state(spark, path)[1] == ("reborn", 30)


def test_on_reinsert_survives_crash_after_apply(spark, tmp_path):
    """The at-least-once window the journal exists for: the process dies
    AFTER apply_cdc_batch commits but BEFORE the hook fires. A replay
    recomputing candidates from pre-state would find nothing (the key is
    live, its tombstone row gone) and lose the reinsert signal forever;
    the durable journal re-fires it. Simulated by reproducing the exact
    on-disk state of that crash: table already applied, journal present,
    checkpoint about to re-deliver the batch."""
    path = str(tmp_path / "t")
    seen: list[set] = []

    def hook(s, keys_df):
        seen.append({r.id for r in keys_df.collect()})

    # table history: key 1 inserted, then deleted (tombstone in place)
    apply_cdc_batch(
        spark, path,
        _changes(spark, [(1, "a", "one", 10, "u", 1)]),
        keys=["id"], partition_col="part",
    )
    apply_cdc_batch(
        spark, path,
        _changes(spark, [(1, "a", None, 0, "d", 2)]),
        keys=["id"], partition_col="part",
    )

    # the reinsert batch — the crashed attempt journaled its candidate
    # AND committed the apply before dying (key now live, tombstone gone)
    reinsert = [(1, "a", "reborn", 30, "u", 3)]
    ckpt = str(tmp_path / "ckpt")
    journal = f"{ckpt}/_reinsert_journal/batch_0"
    spark.createDataFrame([(1,)], "id long").write.parquet(journal)
    apply_cdc_batch(
        spark, path, _changes(spark, reinsert),
        keys=["id"], partition_col="part",
    )
    assert _state(spark, path)[1] == ("reborn", 30)  # pre-state is GONE

    # replay: a fresh stream over the same batch with the journal present
    src = str(tmp_path / "src")
    _changes(spark, reinsert).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = start_cdc_apply(
        stream, path, ckpt, keys=["id"], partition_col="part",
        on_reinsert=hook,
    )
    assert q.awaitTermination(120)
    assert seen == [{1}], "journal replay must re-fire the lost reinsert"
    # journal is deleted only after the hook returned
    import os

    assert not os.path.exists(journal)


def test_on_reinsert_remedy_restores_searchability(spark, tmp_path):
    """The full live-but-unsearchable loop, closed end to end: a CDC
    delete burns the doc in a derived search index (on_delete), a
    later-batch reinsert fires on_reinsert, and the wired remedy
    (remove_tombstones before any maintenance fold + re-index the
    current table row) makes the doc retrievable again — no operator
    vigilance, no rebuild."""
    from fest_vibes_ai_etl_spark.operators.search import (
        load_or_build_postings_store,
    )
    from fest_vibes_ai_etl_spark.streaming.incremental_search import (
        bm25_over_index,
        delete_from_search_index,
        revise_search_document,
    )
    from fest_vibes_ai_etl_spark.streaming.tombstones import remove_tombstones

    # a search index over the table's initial state
    docs = spark.createDataFrame(
        [(1, "alpha words"), (2, "merge hash content")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "store")
    load_or_build_postings_store(spark, docs, str(tmp_path), store_path=store)

    table_path = str(tmp_path / "t")

    def on_delete(s, keys_df):
        delete_from_search_index(
            s, store, [r.id for r in keys_df.collect()]
        )

    def on_reinsert(s, keys_df):
        ids = [r.id for r in keys_df.collect()]
        # revoke the burn, then re-index the row's CURRENT content via
        # the UPDATE path (the stream's first-text-wins guard would
        # otherwise skip the id)
        remove_tombstones(s, store, ids, "doc_id")
        live = (
            s.read.parquet(table_path)
            .filter(F.col("id").isin(ids))
            .filter(~F.col("_deleted"))
            .collect()
        )
        for row in live:
            revise_search_document(s, store, row.id, row.name)

    def run_batch(rows, tag):
        src = str(tmp_path / f"src_{tag}")
        _changes(spark, rows).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = start_cdc_apply(
            stream, table_path, str(tmp_path / f"ckpt_{tag}"),
            keys=["id"], partition_col="part",
            on_delete=on_delete,
            on_reinsert=on_reinsert,
        )
        assert q.awaitTermination(120)

    run_batch([
        (1, "a", "alpha words", 10, "u", 1),
        (2, "a", "merge hash content", 20, "u", 1),
    ], "b1")
    assert {r[0] for r in bm25_over_index(spark, store, ["merge"], topn=5).collect()} == {2}

    # delete doc 2: burned everywhere
    run_batch([(2, "a", None, 0, "d", 2)], "b2")
    assert bm25_over_index(spark, store, ["merge"], topn=5).collect() == []

    # legitimate reinsert in a LATER batch with NEW content: the hook
    # revokes + re-indexes; the doc is live AND searchable again
    run_batch([(2, "a", "merge hash reborn content", 30, "u", 3)], "b3")
    hits = {r[0] for r in bm25_over_index(spark, store, ["reborn"], topn=5).collect()}
    assert hits == {2}
    hits = {r[0] for r in bm25_over_index(spark, store, ["merge"], topn=5).collect()}
    assert hits == {2}
