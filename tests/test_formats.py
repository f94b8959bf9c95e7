"""Roundtrip tests for the explicit-schema JSON/CSV interchange readers."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.sources import formats, table


@pytest.fixture()
def tmpdir():
    root = Path(tempfile.mkdtemp(prefix="fest_formats_"))
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_jsonl_roundtrip_documents(spark, tmpdir):
    docs = table(spark, SF_DIR, "documents")
    formats.write_jsonl(docs, str(tmpdir / "docs_json"), coalesce=2)
    back = formats.read_jsonl(
        spark,
        str(tmpdir / "docs_json"),
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    assert back.count() == docs.count()
    a = docs.agg(F.sum("n_chars"), F.count(F.lit(1))).collect()[0]
    b = back.agg(F.sum("n_chars"), F.count(F.lit(1))).collect()[0]
    assert tuple(a) == tuple(b)
    assert back.schema["doc_id"].dataType.simpleString() == "bigint"


def test_csv_roundtrip_and_corrupt_quarantine(spark, tmpdir):
    nation = table(spark, SF_DIR, "nation")
    formats.write_csv(nation, str(tmpdir / "nation_csv"), coalesce=1)
    back = formats.read_csv(
        spark,
        str(tmpdir / "nation_csv"),
        "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT",
    )
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )

    # malformed JSON lines are quarantined per-row, not fatal
    bad = tmpdir / "bad.jsonl"
    bad.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all}\n')
    got = formats.read_jsonl(
        spark, str(bad), "doc_id BIGINT, text STRING, _corrupt_record STRING"
    )
    rows = got.collect()
    assert len(rows) == 2
    good = [r for r in rows if r._corrupt_record is None]
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 1 and good[0].doc_id == 1
    assert len(corrupt) == 1


def test_orc_roundtrip_partitioned(spark, tmpdir):
    docs = table(spark, SF_DIR, "documents")
    formats.write_orc(docs, str(tmpdir / "docs_orc"), partition_by=["lang"])
    back = formats.read_orc(spark, str(tmpdir / "docs_orc"))
    assert back.count() == docs.count()
    a = {r.lang: r.s for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()}
    b = {r.lang: r.s for r in back.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()}
    assert a == b
    # partition pruning: a lang filter must not scan other partitions
    plan = back.filter(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "lang=en" in plan or "PartitionFilters" in plan


def test_text_docs_per_line_and_whole_file(spark, tmpdir):
    d = tmpdir / "raw"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("single doc body\nwith two lines\n")
    lines = formats.read_text_docs(spark, str(d))
    assert lines.count() == 4
    whole = formats.read_text_docs(spark, str(d), whole_file=True)
    rows = {r.source_file.rsplit("/", 1)[-1]: r.text for r in whole.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert rows["b.txt"].startswith("single doc body")


def test_binary_files_scan_feeds_multimodal_decode(spark, tmpdir):
    d = tmpdir / "media"
    d.mkdir()
    (d / "x.img").write_bytes(b"\x89IMG" + bytes(range(64)))
    (d / "y.img").write_bytes(b"\x89IMG" + bytes(range(32)))
    (d / "skip.dat").write_bytes(b"nope")
    scanned = formats.read_binary_files(spark, str(d), glob="*.img")
    rows = scanned.select("path", "length", "content").collect()
    assert len(rows) == 2
    assert {r.length for r in rows} == {68, 36}
    assert all(bytes(r.content)[:4] == b"\x89IMG" for r in rows)


def test_jdbc_read_options_stride_parallelism():
    from fest_vibes_ai_etl_spark.sources.jdbc import jdbc_read_options

    o = jdbc_read_options(
        "jdbc:postgresql://h/db", "events", partition_column="id",
        lower_bound=0, upper_bound=1_000_000, num_partitions=16,
    )
    assert o["partitionColumn"] == "id" and o["numPartitions"] == "16"
    assert o["lowerBound"] == "0" and o["upperBound"] == "1000000"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lower_bound"):
        jdbc_read_options("jdbc:postgresql://h/db", "t", partition_column="id")


def test_jdbc_upsert_sql_matches_reference_semantics():
    """Set-based ON CONFLICT with overwrite + coalesce columns — the
    reference's per-batch upsert statement family issued once over the
    staged set."""
    from fest_vibes_ai_etl_spark.sources.jdbc import upsert_sql

    sql = upsert_sql(
        "events",
        ["event_id", "name", "lat", "lon"],
        keys=["event_id"],
        staging_table="events_stage",
        coalesce_cols=["lat", "lon"],
    )
    assert sql == (
        'INSERT INTO events ("event_id", "name", "lat", "lon") '
        'SELECT "event_id", "name", "lat", "lon" FROM events_stage WHERE TRUE '
        'ON CONFLICT ("event_id") DO UPDATE SET "name" = EXCLUDED."name", '
        '"lat" = COALESCE(EXCLUDED."lat", events."lat"), '
        '"lon" = COALESCE(EXCLUDED."lon", events."lon")'
    )
    # key-only table degrades to DO NOTHING (pure insert-if-absent)
    assert upsert_sql("t", ["k"], ["k"], "t_stage").endswith("DO NOTHING")


def test_jdbc_upsert_degrades_loudly_without_driver(spark):
    import pytest as _pytest

    from fest_vibes_ai_etl_spark.sources.jdbc import write_jdbc_upsert

    df = spark.createDataFrame([(1, "x")], "k long, v string")
    with _pytest.raises(RuntimeError, match="STAGING WRITE.*Planned merge"):
        write_jdbc_upsert(df, "jdbc:postgresql://nohost/db", "t", keys=["k"])


def test_jdbc_upsert_semantics_execute_on_real_engine():
    """The staged ON CONFLICT upsert EXECUTED against a real SQL engine
    (sqlite3, which shares Postgres's ON CONFLICT (keys) DO UPDATE /
    EXCLUDED dialect): insert, overwrite-vs-COALESCE column semantics, and
    idempotence — the reference warehouse's per-batch contract
    (/root/reference/src/shared/db/database.py:131-218), verified against
    engine behavior rather than asserted as SQL strings."""
    import sqlite3

    from fest_vibes_ai_etl_spark.sources.jdbc import upsert_via_dbapi

    conn = sqlite3.connect(":memory:")
    conn.execute(
        'CREATE TABLE events ("event_id" INTEGER PRIMARY KEY, '
        '"name" TEXT, "lat" REAL, "lon" REAL)'
    )
    cols = ["event_id", "name", "lat", "lon"]

    def snapshot():
        return sorted(conn.execute('SELECT * FROM events').fetchall())

    # phase 1: pure insert
    upsert_via_dbapi(
        conn, "events", cols,
        [(1, "a", 1.0, 2.0), (2, "b", None, None)],
        keys=["event_id"], coalesce_cols=["lat", "lon"],
    )
    assert snapshot() == [(1, "a", 1.0, 2.0), (2, "b", None, None)]
    # phase 2: conflict — name overwrites (even with NULL? no: overwrite
    # means EXCLUDED wins verbatim), lat/lon COALESCE-keep when staged NULL
    upsert_via_dbapi(
        conn, "events", cols,
        [(1, "a2", None, 9.0), (3, "c", 5.0, 6.0)],
        keys=["event_id"], coalesce_cols=["lat", "lon"],
    )
    assert snapshot() == [
        (1, "a2", 1.0, 9.0),  # name overwritten, lat kept, lon updated
        (2, "b", None, None),
        (3, "c", 5.0, 6.0),
    ]
    # phase 3: idempotence — replaying the same batch changes nothing
    upsert_via_dbapi(
        conn, "events", cols,
        [(1, "a2", None, 9.0), (3, "c", 5.0, 6.0)],
        keys=["event_id"], coalesce_cols=["lat", "lon"],
    )
    assert snapshot() == [
        (1, "a2", 1.0, 9.0), (2, "b", None, None), (3, "c", 5.0, 6.0),
    ]
    conn.close()


def test_read_archive_docs_zip_gz_and_quarantine(spark, tmp_path):
    """ZIP members explode to rows, .gz yields one row, garbage
    quarantines with an error class — all through one binaryFile scan."""
    import gzip
    import zipfile

    from fest_vibes_ai_etl_spark.sources.formats import read_archive_docs

    with zipfile.ZipFile(tmp_path / "corpus.zip", "w") as zf:
        zf.writestr("a/doc1.txt", "alpha beta")
        zf.writestr("a/doc2.txt", "gamma")
        zf.writestr("dir/", "")  # directories are skipped
    with gzip.open(tmp_path / "dump.gz", "wb") as f:
        f.write("delta epsilon".encode())
    (tmp_path / "junk.bin").write_bytes(b"not an archive")
    # truncated zip: magic ok, central directory missing
    (tmp_path / "broken.zip").write_bytes(b"PK\x03\x04" + b"\x00" * 10)

    rows = read_archive_docs(spark, str(tmp_path)).collect()
    by_key = {(r.archive.split("/")[-1], r.member): r for r in rows}
    assert by_key[("corpus.zip", "a/doc1.txt")].text == "alpha beta"
    assert by_key[("corpus.zip", "a/doc2.txt")].text == "gamma"
    assert by_key[("dump.gz", None)].text == "delta epsilon"
    assert by_key[("junk.bin", None)].error == "UNKNOWN_FORMAT"
    broken = by_key[("broken.zip", None)]
    assert broken.text is None and broken.error == "BadZipFile"
    assert len(rows) == 5  # 2 zip members + gz + junk + broken


def test_split_warc_records_from_wet_gz(spark, tmp_path):
    """End-to-end Common-Crawl shape: a .wet.gz dump -> read_archive_docs
    -> split_warc_records -> per-page rows with type/uri provenance."""
    import gzip

    from fest_vibes_ai_etl_spark.sources.formats import (
        read_archive_docs,
        split_warc_records,
    )

    wet = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "\r\n"
        "software: test\r\n"
        "\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: https://example.com/a\r\n"
        "Content-Length: 11\r\n"
        "\r\n"
        "hello pageA"
        "\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: https://example.com/b\r\n"
        "\r\n"
        "pageB text here"
        "\r\n\r\n"
    )
    with gzip.open(tmp_path / "crawl.wet.gz", "wb") as f:
        f.write(wet.encode())

    docs = read_archive_docs(spark, str(tmp_path))
    recs = split_warc_records(docs).collect()
    by_uri = {r.target_uri: r for r in recs}
    assert by_uri["https://example.com/a"].content == "hello pageA"
    assert by_uri["https://example.com/b"].content == "pageB text here"
    assert by_uri[None].record_type == "warcinfo"
    conv = [r for r in recs if r.record_type == "conversion"]
    assert len(conv) == 2 and all(r.n_chars > 0 for r in conv)
