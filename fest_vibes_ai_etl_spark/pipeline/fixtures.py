"""Deterministic EventDTO bronze fixtures (FIXTURES.md §A) for pipeline
tests and the rows-only pipeline queries. Mirrors the reference's own test
inputs (/root/reference/tests/simple_tests.py:300-462: 2 venues × 3 events,
invalid rows, duplicate hrefs, COALESCE collisions)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from ..schemas import EVENT_DTO

_D = "2025-03-01"
_TS = dt.datetime(2025, 2, 28, 12, 0, 0)
_TS2 = dt.datetime(2025, 2, 28, 18, 0, 0)  # later scrape


def _artist(name, genres=None, related=None, href=None, desc="lorum ipsum", website=None):
    return (name, desc, genres or [], related or [], href, website)


def _venue(name, street="626 Frenchmen St", city="New Orleans", state="LA", zip_="70116",
           addr=None, active=True, href=None):
    full = addr if addr is not None else f"{street}, {city}, {state} {zip_}"
    return (name, street, "504-555-0100", city, state, zip_, full, active, None, href, None)


def _event(date, href, artist, desc=None, related=None, genres=None):
    return (date, href, artist, None, desc, related or [], genres or [])


def bronze_rows() -> list[tuple]:
    perf = dt.datetime(2025, 3, 1, 20, 0, 0)
    perf2 = dt.datetime(2025, 3, 1, 21, 30, 0)
    perf3 = dt.datetime(2025, 3, 1, 19, 0, 0)
    return [
        # happy path: 2 venues, 3 events, 3 artists
        (
            _artist("Ellis Marsalis Quartet", ["Jazz", "Blues"], href="/artists/789"),
            _venue("Snug Harbor", href="/venues/123"),
            _event(_D, "/events/456", "Ellis Marsalis Quartet",
                   desc="evening set",
                   related=[("Kermit Ruffins", "/artists/101")],
                   genres=["Jazz"]),
            perf, _TS,
        ),
        (
            _artist("Kermit Ruffins", ["Jazz"], href="/artists/101"),
            _venue("Snug Harbor", href="/venues/123"),
            _event(_D, "/events/457", "Kermit Ruffins", desc=None, genres=[]),
            perf2, _TS,
        ),
        (
            _artist("Galactic", ["Funk"], href="/artists/202"),
            _venue("Tipitina's Outdoor Stage", street="501 Napoleon Ave", zip_="70115",
                   href="/venues/124"),
            _event(_D, "/events/458", "Galactic", desc="funk night", genres=["Funk"]),
            perf3, _TS,
        ),
        # duplicate event href, later scrape (first-wins = latest scrape_time)
        (
            _artist("Ellis Marsalis Quartet", ["Jazz", "Blues", "Soul"], href="/artists/789"),
            _venue("Snug Harbor", href="/venues/123"),
            _event(_D, "/events/456", "Ellis Marsalis Quartet",
                   desc="evening set (updated)", genres=["Jazz", "Soul"]),
            perf, _TS2,
        ),
        # invalid: missing artist name → quarantined
        (
            _artist("", []),
            _venue("Snug Harbor"),
            _event(_D, "/events/900", ""),
            perf, _TS,
        ),
        # invalid: missing event_date → quarantined
        (
            _artist("Trombone Shorty", ["Funk"]),
            _venue("Snug Harbor"),
            _event(None, "/events/901", "Trombone Shorty"),
            perf, _TS,
        ),
        # different date (partition behavior)
        (
            _artist("Rebirth Brass Band", ["Brass"], href="/artists/303"),
            _venue("Maple Leaf Bar", street="8316 Oak St", zip_="70118", href="/venues/125"),
            _event("2025-03-02", "/events/459", "Rebirth Brass Band", genres=["Brass"]),
            dt.datetime(2025, 3, 2, 22, 0, 0), _TS,
        ),
    ]


def bronze_fixture(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(bronze_rows(), EVENT_DTO)
