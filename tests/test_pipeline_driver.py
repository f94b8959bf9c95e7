"""End-to-end pipeline driver + cache sink tests."""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

import pytest

from fest_vibes_ai_etl_spark.operators.enrich import EMBED_DIM
from fest_vibes_ai_etl_spark.pipeline import cache_sink, driver
from fest_vibes_ai_etl_spark.pipeline.fixtures import bronze_fixture


@pytest.fixture(scope="module")
def result(spark):
    return driver.run_pipeline(
        spark,
        bronze_fixture(spark),
        dates=["2025-03-01", "2025-03-02"],
        ref_date="2025-03-01",
    )


def test_layers_present(result):
    assert set(result) >= {
        "genres", "artists", "venues", "events", "artist_genres",
        "quarantine", "cache_payload",
    }
    assert result["quarantine"].count() == 2


def test_enrichment_applied(result):
    venues = result["venues"].collect()
    assert all(r.latitude is not None and r.longitude is not None for r in venues)
    artists = result["artists"].collect()
    assert all(
        r.description_embedding is not None and len(r.description_embedding) == EMBED_DIM
        for r in artists
    )
    events = result["events"].collect()
    assert all(e.event_text_embedding is not None for e in events)


def test_cache_payload_covers_both_dates(result):
    keys = {r.cache_key for r in result["cache_payload"].collect()}
    assert keys == {"events:2025-03-01", "events:2025-03-02"}


def test_export_to_cache_filesystem_client(spark, result):
    out = Path(tempfile.mkdtemp(prefix="fest_cache_"))

    class FileClient:
        """setex → one file per key (filesystem is the executor-visible
        shared store in tests; Redis pipeline in deployment)."""

        def setex(self, key, ttl, value):
            (out / key.replace(":", "_")).write_text(json.dumps({"ttl": ttl, "doc": value}))

    n = cache_sink.export_to_cache(result["cache_payload"], client_factory=FileClient)
    assert n == 2
    files = sorted(p.name for p in out.glob("events_*"))
    assert files == ["events_2025-03-01", "events_2025-03-02"]
    payload = json.loads((out / "events_2025-03-01").read_text())
    docs = json.loads(payload["doc"])
    assert isinstance(docs, list) and len(docs) == 3
    assert payload["ttl"] == 3600  # today tier
    names = [d["artist_data"]["name"] for d in docs]
    assert names == ["Galactic", "Ellis Marsalis Quartet", "Kermit Ruffins"]  # W1 order
