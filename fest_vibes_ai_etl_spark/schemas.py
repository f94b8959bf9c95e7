"""Declared schemas — the EventDTO document tree and the silver star schema.

EventDTO shape per /root/reference/src/shared/schemas/dto.py:10-139 (nested
dataclasses serialized as JSON). Read with an explicit schema — never
inferred — so a malformed producer cannot silently change column types
(reference enforces the same via dataclass **kwargs hydration,
/root/reference/src/loader/app.py:126-135).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RELATED_ARTIST = StructType(
    [
        StructField("name", StringType()),
        StructField("wwoz_artist_href", StringType()),
    ]
)

ARTIST_DATA = StructType(
    [
        StructField("name", StringType()),
        StructField("description", StringType()),
        StructField("genres", ArrayType(StringType())),
        StructField("related_artists", ArrayType(StringType())),
        StructField("wwoz_artist_href", StringType()),
        StructField("website", StringType()),
    ]
)

VENUE_DATA = StructType(
    [
        StructField("name", StringType()),
        StructField("thoroughfare", StringType()),
        StructField("phone_number", StringType()),
        StructField("locality", StringType()),
        StructField("state", StringType()),
        StructField("postal_code", StringType()),
        StructField("full_address", StringType()),
        StructField("is_active", BooleanType()),
        StructField("website", StringType()),
        StructField("wwoz_venue_href", StringType()),
        StructField("event_artist", StringType()),
    ]
)

EVENT_DATA = StructType(
    [
        StructField("event_date", StringType()),
        StructField("wwoz_event_href", StringType()),
        StructField("event_artist", StringType()),
        StructField("wwoz_artist_href", StringType()),
        StructField("description", StringType()),
        StructField("related_artists", ArrayType(RELATED_ARTIST)),
        StructField("genres", ArrayType(StringType())),
    ]
)

EVENT_DTO = StructType(
    [
        StructField("artist_data", ARTIST_DATA),
        StructField("venue_data", VENUE_DATA),
        StructField("event_data", EVENT_DATA),
        StructField("performance_time", TimestampType()),
        StructField("scrape_time", TimestampType()),
    ]
)

# Silver star schema (mirrors the reference's Postgres model,
# /root/reference/src/shared/db/models/models.py; surrogate keys are
# xxhash64 of the natural key — see operators/merge.py).

GENRES = StructType(
    [
        StructField("genre_id", LongType()),
        StructField("name", StringType()),
        StructField("description", StringType()),
    ]
)

ARTISTS = StructType(
    [
        StructField("artist_id", LongType()),
        StructField("name", StringType()),
        StructField("wwoz_artist_href", StringType()),
        StructField("description", StringType()),
        StructField("website", StringType()),
        StructField("scrape_time", TimestampType()),
    ]
)

VENUES = StructType(
    [
        StructField("venue_id", LongType()),
        StructField("name", StringType()),
        StructField("thoroughfare", StringType()),
        StructField("phone_number", StringType()),
        StructField("locality", StringType()),
        StructField("state", StringType()),
        StructField("postal_code", StringType()),
        StructField("full_address", StringType()),
        StructField("wwoz_venue_href", StringType()),
        StructField("website", StringType()),
        StructField("is_active", BooleanType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("is_indoors", BooleanType()),
        StructField("is_streaming", BooleanType()),
        StructField("last_geocoded", TimestampType()),
    ]
)

EVENTS_FACT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("wwoz_event_href", StringType()),
        StructField("description", StringType()),
        StructField("artist_id", LongType()),
        StructField("venue_id", LongType()),
        StructField("artist_name", StringType()),
        StructField("venue_name", StringType()),
        StructField("performance_time", TimestampType()),
        StructField("event_date", DateType()),
        StructField("scrape_time", TimestampType()),
        StructField("is_indoors", BooleanType()),
        StructField("is_streaming", BooleanType()),
    ]
)
