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

Two fetch modes, selected by ``.option("fetch", ...)``:

- ``synthetic`` (default): deterministic listing page per date (seeded by
  the date — stable grammar from the reference's own test fixtures). The
  test/sandbox default; this container has no network.
- ``http``: live GET against ``base_url + endpoint + ?date=`` with the
  reference extractor's fetch semantics (30 s timeout, 10-redirect cap,
  error taxonomy — /root/reference/src/extractor/service.py:58-116) mapped
  into row values (status, error_type) so a bad date degrades to a
  quarantinable row instead of failing the whole backfill. Unit-tested
  against a local httpd fixture (tests/test_listing_source.py).

The whole source is defined inside a factory and exported as a by-VALUE
picklable class: Spark runs Python data sources in separate planner/worker
processes that do NOT see driver ``addPyFile`` modules, so a module-level
class (pickled by reference) dies with ModuleNotFoundError in the stream
planner. A factory-local class serializes its code and closure instead.

Usage::

    register_listing_source(spark)  # registers + enables filter pushdown
    df = (spark.read.format("festvibes_listing")
          .option("start_date", "2025-03-01").option("days", 7).load())
    stream = spark.readStream.format("festvibes_listing").load()

The batch reader implements ``pushFilters`` (fetch_date partition pruning
at the source), which Spark 4.1 only allows when the runtime conf
``spark.sql.python.filterPushdown.enabled`` is true — ``get_spark`` /
``session.configure`` set it; :func:`register_listing_source` sets it for
externally-built sessions.
"""

from __future__ import annotations


def register_listing_source(spark) -> None:
    """Register the source and enable the (runtime-settable) Python filter
    pushdown conf its reader requires."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ListingDataSource)


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

    def http_fetch(url: str, timeout: float, max_redirects: int, headers: dict):
        """Live HTTP GET with the reference extractor's fetch semantics
        (/root/reference/src/extractor/service.py:58-116): 30 s total
        timeout, redirect cap, and its error taxonomy — mapped into ROW
        VALUES (status, error_type, html) instead of raised exceptions, so
        one bad date degrades to a quarantinable row rather than failing a
        3650-partition backfill (the orchestrator's continue-past-date
        contract, pipeline/orchestrate.py):

        - 200            → (200, None, body)
        - HTTP status n  → (n,   'HTTP_ERROR',  '')
        - unreachable/DNS→ (503, 'URL_ERROR',   '')
        - too many redirects → (200, None, reference's literal degrade page
          — it RETURNS an error div instead of raising, and the parser then
          reports NO_EVENTS; service.py:101-116)
        - timeout/other  → (500, 'FETCH_ERROR', '')
        """
        import urllib.error
        import urllib.request

        class _CappedRedirect(urllib.request.HTTPRedirectHandler):
            max_repeats = max_redirects
            max_redirections = max_redirects

        opener = urllib.request.build_opener(_CappedRedirect)
        req = urllib.request.Request(url, headers=headers)
        try:
            with opener.open(req, timeout=timeout) as resp:
                if resp.status != 200:
                    return resp.status, "HTTP_ERROR", ""
                charset = resp.headers.get_content_charset() or "utf-8"
                return 200, None, resp.read().decode(charset, errors="replace")
        except urllib.error.HTTPError as e:
            if "redirect" in str(e.reason).lower():
                return (
                    200,
                    None,
                    "<html><body><div class='error'>Too many redirects"
                    "</div></body></html>",
                )
            return e.code, "HTTP_ERROR", ""
        except urllib.error.URLError as e:
            if isinstance(getattr(e, "reason", None), TimeoutError):
                return 500, "FETCH_ERROR", ""
            return 503, "URL_ERROR", ""
        except TimeoutError:
            return 500, "FETCH_ERROR", ""
        except Exception:
            return 500, "FETCH_ERROR", ""

    def opts(options):
        return (
            options.get("start_date", "2025-03-01"),
            int(options.get("days", 1)),
            int(options.get("venues_per_page", 3)),
            int(options.get("events_per_venue", 2)),
            options.get("fetch", "synthetic"),
            options.get("base_url", "https://example.invalid"),
            options.get("endpoint", "/calendar/livewire-music"),
            float(options.get("timeout_sec", 30)),
            int(options.get("max_redirects", 10)),
            float(options.get("min_interval_ms", 0)),
            options.get("user_agent", "Mozilla/5.0 (festvibes-spark)"),
        )

    def rows_for(o, lo: int, hi: int):
        """One (date, url, status, error_type, html) row per date in
        [lo, hi). ``min_interval_ms`` rate-limits consecutive fetches
        WITHIN this generator (multi-date partitions / offset replays);
        cross-partition concurrency is bounded by the scheduler — cap
        simultaneous fetch tasks with executor/core limits the way the
        reference caps its Step Function fan-out at MaxConcurrency=5."""
        import time

        (start, _days, n_venues, n_events, mode, base_url, endpoint,
         timeout, max_redirects, interval_ms, ua) = o
        d0 = dt.date.fromisoformat(start)
        for j, i in enumerate(range(lo, hi)):
            d = (d0 + dt.timedelta(days=i)).isoformat()
            url = f"{base_url}{endpoint}?date={d}"
            if mode == "http":
                if j and interval_ms > 0:
                    time.sleep(interval_ms / 1000.0)
                status, err, html = http_fetch(
                    url, timeout, max_redirects, {"User-Agent": ua}
                )
                yield (d, url, status, err, html)
            else:
                yield (d, url, 200, None, fetch(d, n_venues, n_events))

    class DatePartition(InputPartition):
        def __init__(self, index: int):
            self.index = index

    class ListingReader(DataSourceReader):
        def __init__(self, options):
            self.o = opts(options)
            self.days = self.o[1]
            self._pushed = []

        def pushFilters(self, filters):
            """Partition pruning at the SOURCE (Spark 4.1 Python DataSource
            filter pushdown): predicates on ``fetch_date`` are captured and
            applied in ``partitions()``, so a date-filtered read of a
            3650-day backfill plans (and FETCHES, in http mode) only the
            matching dates. Every filter is still returned — Spark
            re-applies them post-scan, so partial handling is always safe;
            the pushdown's win is skipped fetch work, not skipped
            evaluation."""
            from pyspark.sql.datasource import (
                EqualTo,
                GreaterThan,
                GreaterThanOrEqual,
                In,
                LessThan,
                LessThanOrEqual,
            )

            for f in filters:
                if getattr(f, "attribute", None) == ("fetch_date",) and isinstance(
                    f,
                    (
                        EqualTo,
                        GreaterThan,
                        GreaterThanOrEqual,
                        In,
                        LessThan,
                        LessThanOrEqual,
                    ),
                ):
                    self._pushed.append(f)
            return filters

        def _keep(self, date_str: str) -> bool:
            from pyspark.sql.datasource import (
                EqualTo,
                GreaterThan,
                GreaterThanOrEqual,
                In,
                LessThan,
                LessThanOrEqual,
            )

            for f in self._pushed:
                v = f.value
                if isinstance(f, EqualTo) and not date_str == v:
                    return False
                if isinstance(f, GreaterThan) and not date_str > v:
                    return False
                if isinstance(f, GreaterThanOrEqual) and not date_str >= v:
                    return False
                if isinstance(f, LessThan) and not date_str < v:
                    return False
                if isinstance(f, LessThanOrEqual) and not date_str <= v:
                    return False
                if isinstance(f, In) and date_str not in v:
                    return False
            return True

        def partitions(self):
            d0 = dt.date.fromisoformat(self.o[0])
            return [
                DatePartition(i)
                for i in range(self.days)
                if self._keep((d0 + dt.timedelta(days=i)).isoformat())
            ]

        def read(self, partition):
            if partition is None:  # fully pruned: Spark calls read(None)
                return iter(())
            return rows_for(self.o, partition.index, partition.index + 1)

    class ListingStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.o = opts(options)
            self.days = self.o[1]

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
                list(rows_for(self.o, lo, lo + 1)),
                {"consumed": lo + 1},
            )

        def readBetweenOffsets(self, start: dict, end: dict):
            return rows_for(self.o, start["consumed"], end["consumed"])

    class ListingDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "festvibes_listing"

        def schema(self) -> str:
            return (
                "fetch_date string, url string, status int, "
                "error_type string, html string"
            )

        def reader(self, schema) -> ListingReader:
            return ListingReader(self.options)

        def simpleStreamReader(self, schema) -> ListingStreamReader:
            return ListingStreamReader(self.options)

    return ListingDataSource


ListingDataSource = make_listing_datasource()
