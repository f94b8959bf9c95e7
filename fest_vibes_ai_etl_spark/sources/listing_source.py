"""Custom Python DataSource for the extractor seam (S1/S2).

The reference's extractor fans out one HTTP fetch per calendar date
(/root/reference/src/extractor/service.py:60-118, driven by the per-date
Step Function Map). Spark 4's Python DataSource API expresses that same
contract engine-natively, batch AND streaming:

- batch: ONE INPUT PARTITION PER DATE — a 31-date crawl is 31 parallel
  fetch tasks feeding the mapInPandas parser (operators/htmlparse.py), and
  a 10-year backfill is 3650 partitions on the same code path;
- streaming: a SimpleDataSourceStreamReader whose offset is days-consumed —
  the continuously-running crawl and the bounded backfill are one source,
  and ``readBetweenOffsets`` makes recovery replays deterministic.

The container has no network, so ``fetch`` synthesizes a deterministic
listing page per date (seeded by the date — stable grammar from the
reference's own test fixtures). That is the ONLY stand-in: schema, option
handling, partition planning, offsets, and the row-generator protocol are
exactly what a production deployment keeps when it swaps ``fetch`` for the
real HTTP GET + retry policy.

The whole source is defined inside a factory and exported as a by-VALUE
picklable class: Spark runs Python data sources in separate planner/worker
processes that do NOT see driver ``addPyFile`` modules, so a module-level
class (pickled by reference) dies with ModuleNotFoundError in the stream
planner. A factory-local class serializes its code and closure instead.

Usage::

    spark.dataSource.register(ListingDataSource)
    df = (spark.read.format("festvibes_listing")
          .option("start_date", "2025-03-01").option("days", 7).load())
    stream = spark.readStream.format("festvibes_listing").load()
"""

from __future__ import annotations


def make_listing_datasource():
    """Build the self-contained DataSource class (see module docstring for
    why the definitions live inside this factory)."""
    import datetime as dt

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    genres = ["Jazz", "Blues", "Funk", "Brass Band", "Zydeco", "Traditional Jazz"]

    def fetch(date_str: str, n_venues: int, n_events: int) -> str:
        """Deterministic listing-HTML for one date (offline stand-in for
        the HTTP GET; same livewire-listing grammar the parser walks)."""
        seed = sum(ord(c) * (i + 1) for i, c in enumerate(date_str))
        panels = []
        for v in range(n_venues):
            vid = seed * 100 + v
            rows = []
            for e in range(n_events):
                eid = vid * 10 + e
                gs = ", ".join(
                    genres[(seed + v + e + g) % len(genres)] for g in range(1 + (e % 2))
                )
                hour = 7 + (seed + e) % 5
                rows.append(
                    f'<div class="row"><div class="calendar-info">'
                    f'<a href="/events/{eid}">Artist {eid}</a>'
                    f"<p>{gs}</p><p>{hour}:30pm</p></div></div>"
                )
            panels.append(
                f'<div class="panel panel-default">'
                f'<h3 class="panel-title"><a href="/venues/{vid}">Venue {vid}</a></h3>'
                f'<div class="panel-body">{"".join(rows)}</div></div>'
            )
        return f'<div class="livewire-listing">{"".join(panels)}</div>'

    def opts(options):
        return (
            options.get("start_date", "2025-03-01"),
            int(options.get("days", 1)),
            int(options.get("venues_per_page", 3)),
            int(options.get("events_per_venue", 2)),
        )

    def rows_for(start: str, lo: int, hi: int, n_venues: int, n_events: int):
        d0 = dt.date.fromisoformat(start)
        for i in range(lo, hi):
            d = (d0 + dt.timedelta(days=i)).isoformat()
            url = f"https://example.invalid/calendar?date={d}"
            yield (d, url, 200, fetch(d, n_venues, n_events))

    class DatePartition(InputPartition):
        def __init__(self, index: int):
            self.index = index

    class ListingReader(DataSourceReader):
        def __init__(self, options):
            self.start, self.days, self.n_venues, self.n_events = opts(options)

        def partitions(self):
            return [DatePartition(i) for i in range(self.days)]

        def read(self, partition):
            return rows_for(
                self.start, partition.index, partition.index + 1,
                self.n_venues, self.n_events,
            )

    class ListingStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.start, self.days, self.n_venues, self.n_events = opts(options)

        def initialOffset(self) -> dict:
            return {"consumed": 0}

        def read(self, start: dict):
            lo = start["consumed"]
            if lo >= self.days:  # caught up: no rows, offset unchanged
                # must be an ITERATOR (the runner calls next() on it to
                # verify emptiness when the offset does not advance)
                return iter(()), start
            # advancing: a materialized LIST, not a generator — the prefetch
            # cache copy.copy()s it when the batch is served
            return (
                list(rows_for(self.start, lo, lo + 1, self.n_venues, self.n_events)),
                {"consumed": lo + 1},
            )

        def readBetweenOffsets(self, start: dict, end: dict):
            return rows_for(
                self.start, start["consumed"], end["consumed"],
                self.n_venues, self.n_events,
            )

    class ListingDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "festvibes_listing"

        def schema(self) -> str:
            return "fetch_date string, url string, status int, html string"

        def reader(self, schema) -> ListingReader:
            return ListingReader(self.options)

        def simpleStreamReader(self, schema) -> ListingStreamReader:
            return ListingStreamReader(self.options)

    return ListingDataSource


ListingDataSource = make_listing_datasource()
