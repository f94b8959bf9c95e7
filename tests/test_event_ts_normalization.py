"""Event-time physical-type drift guard: the driver testdata's ``events.ts``
has already shipped as TIMESTAMP(NANOS) (round 1) and naive timestamp[us]
(round 2). normalize_event_ts must map EVERY physical form to canonical
TimestampType with identical microsecond values, so a future re-generation
cannot re-introduce the round-1 red round."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.functions.scalar import epoch_us
from fest_vibes_ai_etl_spark.sources.tables import normalize_event_ts

TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0),
    dt.datetime(2024, 1, 15, 12, 34, 56, 789012),
    dt.datetime(2024, 6, 30, 23, 59, 59, 999999),
]
EXPECT_US = [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in TS]


def _write(tmp_path, name, arrow_type):
    arr = pa.array(TS, type=arrow_type)
    table = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()), "ts": arr})
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(table, path)
    return path


@pytest.mark.parametrize(
    "name,arrow_type",
    [
        ("us_naive", pa.timestamp("us")),            # round 2: TIMESTAMP_NTZ
        ("us_utc", pa.timestamp("us", tz="UTC")),    # plain TIMESTAMP
        ("ns_naive", pa.timestamp("ns")),            # round 1: nanosAsLong bigint
    ],
)
def test_normalize_event_ts_all_physical_forms(spark, tmp_path, name, arrow_type):
    path = _write(tmp_path, name, arrow_type)
    df = normalize_event_ts(spark.read.parquet(path))
    assert dict(df.dtypes)["ts"] == "timestamp", dict(df.dtypes)
    got = {
        r.event_id: r.us
        for r in df.select("event_id", epoch_us("ts").alias("us")).collect()
    }
    assert got == {i + 1: EXPECT_US[i] for i in range(3)}, (name, got)


def test_epoch_us_accepts_ntz_and_ltz(spark, tmp_path):
    # epoch_us must not throw on TIMESTAMP_NTZ (raw unix_micros does)
    path = _write(tmp_path, "raw_ntz", pa.timestamp("us"))
    raw = spark.read.parquet(path)
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
    vals = [r.us for r in raw.select(epoch_us("ts").alias("us")).orderBy("event_id").collect()]
    assert vals == EXPECT_US
