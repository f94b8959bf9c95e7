"""HTML listing parse (P1-P5/U5) — mirrors the reference's own parse test
(2 venues / 3 events, genre lists, time extraction, defaults)."""

from __future__ import annotations

import pytest

from fest_vibes_ai_etl_spark.operators import htmlparse
from fest_vibes_ai_etl_spark.pipeline import normalize

LISTING = """
<div class="livewire-listing">
  <div class="panel panel-default">
    <h3 class="panel-title"><a href="/venues/123">Snug Harbor</a></h3>
    <div class="panel-body">
      <div class="row">
        <div class="calendar-info">
          <a href="/events/456">Ellis Marsalis Quartet</a>
          <p>Jazz</p>
          <p>8:00pm</p>
        </div>
      </div>
      <div class="row">
        <div class="calendar-info">
          <a href="/events/789">Kermit Ruffins</a>
          <p>Jazz, Blues</p>
          <p>10:30pm</p>
        </div>
      </div>
    </div>
  </div>
  <div class="panel panel-default">
    <h3 class="panel-title"><a href="/venues/456">Preservation Hall</a></h3>
    <div class="panel-body">
      <div class="row">
        <div class="calendar-info">
          <a href="/events/101">Preservation Hall Jazz Band</a>
          <p>Traditional Jazz</p>
          <p>no time listed</p>
        </div>
      </div>
    </div>
  </div>
</div>
"""


@pytest.fixture(scope="module")
def parsed(spark):
    pages = spark.createDataFrame([(LISTING, "2025-03-01")], "html string, d string")
    return htmlparse.parse_listing_html(pages, "html", "d").collect()


def test_counts_and_venues(parsed):
    assert len(parsed) == 3  # 2 venues, 3 events (reference asserts the same)
    assert {r.venue_name for r in parsed} == {"Snug Harbor", "Preservation Hall"}
    assert {r.wwoz_venue_href for r in parsed} == {"/venues/123", "/venues/456"}


def test_event_fields(parsed):
    by_href = {r.wwoz_event_href: r for r in parsed}
    assert set(by_href) == {"/events/456", "/events/789", "/events/101"}
    assert by_href["/events/456"].artist_name == "Ellis Marsalis Quartet"
    assert by_href["/events/789"].genres == ["Jazz", "Blues"]  # comma split
    assert by_href["/events/101"].genres == ["Traditional Jazz"]
    assert by_href["/events/456"].time_text == "8:00pm"


def test_bronze_conversion_and_time_parse(spark):
    pages = spark.createDataFrame([(LISTING, "2025-03-01")], "html string, d string")
    bronze = htmlparse.parsed_to_bronze(htmlparse.parse_listing_html(pages, "html", "d"))
    rows = {r.event_data.wwoz_event_href: r for r in bronze.collect()}
    # F1/F2: 8:00pm → 20:00; 10:30pm → 22:30; junk → 12:00am default
    assert rows["/events/456"].performance_time.strftime("%H:%M") == "20:00"
    assert rows["/events/789"].performance_time.strftime("%H:%M") == "22:30"
    assert rows["/events/101"].performance_time.strftime("%H:%M") == "00:00"
    # parsed bronze flows straight into the normalize pipeline
    silver = normalize.normalize(bronze)
    assert silver["events"].count() == 3
    assert {r.name for r in silver["genres"].collect()} == {
        "Jazz", "Blues", "Traditional Jazz"
    }


def test_malformed_html_yields_no_rows(spark):
    pages = spark.createDataFrame(
        [("<html><body><p>nothing here</p></body></html>", "2025-03-01"), ("", "2025-03-01")],
        "html string, d string",
    )
    assert htmlparse.parse_listing_html(pages, "html", "d").count() == 0
