"""Custom Python DataSource: per-date partitions, determinism, parse chain."""

from __future__ import annotations

from fest_vibes_ai_etl_spark.operators import htmlparse
from fest_vibes_ai_etl_spark.sources.listing_source import ListingDataSource


def _read(spark, days=3):
    spark.dataSource.register(ListingDataSource)
    return (
        spark.read.format("festvibes_listing")
        .option("start_date", "2025-03-01")
        .option("days", days)
        .load()
    )


def test_one_partition_per_date(spark):
    df = _read(spark, days=4)
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert {r.fetch_date for r in rows} == {
        "2025-03-01", "2025-03-02", "2025-03-03", "2025-03-04"
    }
    assert all(r.status == 200 and "livewire-listing" in r.html for r in rows)


def test_deterministic_across_reads(spark):
    a = sorted((r.fetch_date, r.html) for r in _read(spark).collect())
    b = sorted((r.fetch_date, r.html) for r in _read(spark).collect())
    assert a == b


def test_feeds_the_parse_chain(spark):
    pages = _read(spark, days=2)
    events = htmlparse.parse_listing_html(pages, "html", "fetch_date")
    rows = events.collect()
    # 2 dates x 3 venues x 2 events, venue/artist/genre/time populated
    assert len(rows) == 12
    assert all(r.venue_name.startswith("Venue ") for r in rows)
    assert all(r.artist_name.startswith("Artist ") for r in rows)
    assert all(r.genres and r.time_text.endswith("pm") for r in rows)


def test_streaming_reader_one_date_per_batch(spark, tmp_path):
    spark.dataSource.register(ListingDataSource)
    stream = (
        spark.readStream.format("festvibes_listing")
        .option("start_date", "2025-03-01")
        .option("days", 3)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("listing_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT fetch_date, html FROM listing_stream").collect()
    finally:
        q.stop()
    assert {r.fetch_date for r in rows} == {"2025-03-01", "2025-03-02", "2025-03-03"}
    # streamed pages byte-identical to the batch read of the same dates
    batch = {(r.fetch_date, r.html) for r in _read(spark, days=3).collect()}
    assert {(r.fetch_date, r.html) for r in rows} == batch
