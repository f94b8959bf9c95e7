"""Custom Python DataSource for the extractor seam (S1/S2).

The reference's extractor fans out one HTTP fetch per calendar date
(/root/reference/src/extractor/service.py:60-118, driven by the per-date
Step Function Map). Spark 4's Python DataSource API expresses that same
contract engine-natively: the source plans ONE INPUT PARTITION PER DATE, so
a 31-date crawl is 31 parallel fetch tasks feeding the mapInPandas parser
(operators/htmlparse.py) with zero driver involvement — and a 10-year
backfill is 3650 partitions on the same code path.

The container has no network, so ``_fetch`` synthesizes a deterministic
listing page per date (seeded by the date — stable grammar from the
reference's own test fixtures). That is the ONLY stand-in line: schema,
option handling, partition planning, and the per-partition generator
protocol are exactly what a production deployment keeps when it swaps
``_fetch`` for the real HTTP GET + retry policy.

Usage::

    spark.dataSource.register(ListingDataSource)
    df = (spark.read.format("festvibes_listing")
          .option("start_date", "2025-03-01").option("days", 7).load())
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_GENRES = ["Jazz", "Blues", "Funk", "Brass Band", "Zydeco", "Traditional Jazz"]


def _fetch(date_str: str, n_venues: int, n_events: int) -> str:
    """Deterministic listing-HTML for one date (offline stand-in for the
    HTTP GET; same livewire-listing grammar the parser walks)."""
    seed = sum(ord(c) * (i + 1) for i, c in enumerate(date_str))
    panels = []
    for v in range(n_venues):
        vid = seed * 100 + v
        rows = []
        for e in range(n_events):
            eid = vid * 10 + e
            genres = ", ".join(
                _GENRES[(seed + v + e + g) % len(_GENRES)] for g in range(1 + (e % 2))
            )
            hour = 7 + (seed + e) % 5
            rows.append(
                f'<div class="row"><div class="calendar-info">'
                f'<a href="/events/{eid}">Artist {eid}</a>'
                f"<p>{genres}</p><p>{hour}:30pm</p></div></div>"
            )
        panels.append(
            f'<div class="panel panel-default">'
            f'<h3 class="panel-title"><a href="/venues/{vid}">Venue {vid}</a></h3>'
            f'<div class="panel-body">{"".join(rows)}</div></div>'
        )
    return f'<div class="livewire-listing">{"".join(panels)}</div>'


class _DatePartition(InputPartition):
    def __init__(self, date_str: str):
        self.date_str = date_str


class ListingReader(DataSourceReader):
    def __init__(self, options):
        self.start = options.get("start_date", "2025-03-01")
        self.days = int(options.get("days", 1))
        self.n_venues = int(options.get("venues_per_page", 3))
        self.n_events = int(options.get("events_per_venue", 2))

    def partitions(self):
        d0 = dt.date.fromisoformat(self.start)
        return [
            _DatePartition((d0 + dt.timedelta(days=i)).isoformat())
            for i in range(self.days)
        ]

    def read(self, partition):
        d = partition.date_str
        url = f"https://example.invalid/calendar?date={d}"
        html = _fetch(d, self.n_venues, self.n_events)
        yield (d, url, 200, html)


class ListingDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "festvibes_listing"

    def schema(self) -> str:
        return "fetch_date string, url string, status int, html string"

    def reader(self, schema) -> ListingReader:
        return ListingReader(self.options)
