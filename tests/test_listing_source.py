"""Custom Python DataSource: per-date partitions, determinism, parse chain."""

from __future__ import annotations

import pyspark.sql.functions as F

from fest_vibes_ai_etl_spark.operators import htmlparse
from fest_vibes_ai_etl_spark.sources.listing_source import (
    ListingDataSource,
    register_listing_source,
)


def _read(spark, days=3):
    register_listing_source(spark)
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
    register_listing_source(spark)
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


def test_http_fetch_mode_against_local_httpd(spark):
    """Live-HTTP mode: reference fetch semantics (timeout/redirect-cap/error
    taxonomy — service.py:58-116) exercised against a local httpd. One row
    per date; failures degrade to (status, error_type) row values."""
    import http.server
    import threading

    page = (
        '<div class="livewire-listing"><div class="panel panel-default">'
        '<h3 class="panel-title"><a href="/venues/1">Venue 1</a></h3>'
        '<div class="panel-body"><div class="row"><div class="calendar-info">'
        '<a href="/events/11">Artist 11</a><p>Jazz</p><p>8:30pm</p>'
        "</div></div></div></div></div>"
    )

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if "2025-03-01" in self.path:
                body = page.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif "2025-03-02" in self.path:
                self.send_error(404)
            else:  # 2025-03-03: redirect loop
                self.send_response(302)
                self.send_header("Location", self.path)
                self.send_header("Content-Length", "0")
                self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        register_listing_source(spark)
        rows = {
            r.fetch_date: r
            for r in (
                spark.read.format("festvibes_listing")
                .option("start_date", "2025-03-01")
                .option("days", 3)
                .option("fetch", "http")
                .option("base_url", f"http://127.0.0.1:{srv.server_address[1]}")
                .option("timeout_sec", 10)
                .load()
                .collect()
            )
        }
        ok = rows["2025-03-01"]
        assert (ok.status, ok.error_type) == (200, None)
        assert "livewire-listing" in ok.html
        assert rows["2025-03-02"].status == 404
        assert rows["2025-03-02"].error_type == "HTTP_ERROR"
        # redirect loop: the reference RETURNS a degrade page, never raises
        loop = rows["2025-03-03"]
        assert loop.error_type is None and "Too many redirects" in loop.html
        # parse chain consumes the live page identically to synthetic mode
        good = (
            spark.read.format("festvibes_listing")
            .option("start_date", "2025-03-01")
            .option("days", 1)
            .option("fetch", "http")
            .option("base_url", f"http://127.0.0.1:{srv.server_address[1]}")
            .load()
        )
        ev = htmlparse.parse_listing_html(good, "html", "fetch_date").collect()
        assert len(ev) == 1 and ev[0].venue_name == "Venue 1"
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_fetch_unreachable_is_url_error(spark):
    """Connection-refused maps to the reference's URL_ERROR/503 class."""
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()  # nothing listens here now
    register_listing_source(spark)
    row = (
        spark.read.format("festvibes_listing")
        .option("start_date", "2025-03-01")
        .option("days", 1)
        .option("fetch", "http")
        .option("base_url", f"http://127.0.0.1:{port}")
        .option("timeout_sec", 5)
        .load()
        .collect()[0]
    )
    assert (row.status, row.error_type, row.html) == (503, "URL_ERROR", "")


def test_fetch_date_filter_pushdown_prunes_partitions(spark):
    """A fetch_date predicate must prune SOURCE partitions (and therefore
    fetches): 10 planned dates filtered to 3 -> 3 input partitions. String
    comparison on ISO dates is order-correct; Spark still re-applies the
    filter post-scan, so results stay exact for any predicate shape."""
    df = _read(spark, days=10).filter(
        (F.col("fetch_date") >= "2025-03-04") & (F.col("fetch_date") < "2025-03-07")
    )
    assert df.rdd.getNumPartitions() == 3
    assert {r.fetch_date for r in df.collect()} == {
        "2025-03-04", "2025-03-05", "2025-03-06"
    }
    # IN-list pushdown
    df2 = _read(spark, days=10).filter(
        F.col("fetch_date").isin("2025-03-02", "2025-03-09")
    )
    assert df2.rdd.getNumPartitions() == 2
    assert {r.fetch_date for r in df2.collect()} == {"2025-03-02", "2025-03-09"}
    # an empty match plans zero partitions and returns zero rows
    df3 = _read(spark, days=10).filter(F.col("fetch_date") == "1999-01-01")
    assert df3.count() == 0
