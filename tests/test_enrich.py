"""Enrichment operator semantics: geocode cache gating + staleness, embedding
only-if-null backfill, degrade-to-null on encoder failure."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators import enrich

NOW = dt.datetime.now()
OLD = NOW - dt.timedelta(days=90)

VENUES = [
    # (name, full_address, lat, lon, last_geocoded)
    ("Fresh", "1 Fresh St", 30.0, -90.0, NOW),          # geocoded recently → untouched
    ("Stale", "2 Stale St", 30.1, -90.1, OLD),          # stale → re-geocoded
    ("Never", "3 Never St", None, None, None),          # never → geocoded
    ("Cached", "4 Cached St", None, None, None),        # cache hit → no geocoder call
    ("NoAddr", "", None, None, None),                   # empty → default coords
]
SCHEMA = "name string, full_address string, latitude double, longitude double, last_geocoded timestamp"


@pytest.fixture()
def venues(spark):
    return spark.createDataFrame(VENUES, SCHEMA)


def test_geocode_cache_and_staleness(spark, venues):
    cache = spark.createDataFrame(
        [("4 Cached St", 29.5, -90.5)], "full_address string, latitude double, longitude double"
    )

    def guarded_geocoder(addresses: pd.Series) -> pd.DataFrame:
        # cache hits and fresh rows must never reach the geocoder
        # (executor-side raise propagates to the driver as a task failure)
        forbidden = {"1 Fresh St", "4 Cached St"}
        hit = forbidden & set(addresses)
        if hit:
            raise AssertionError(f"geocoder called on gated addresses: {hit}")
        return enrich.fake_geocode_batch(addresses)

    out = {r.name: r for r in enrich.geocode_with_cache(venues, cache, guarded_geocoder).collect()}
    assert (out["Fresh"].latitude, out["Fresh"].longitude) == (30.0, -90.0)
    assert (out["Cached"].latitude, out["Cached"].longitude) == (29.5, -90.5)
    assert out["Stale"].latitude != 30.1  # refreshed
    assert out["Never"].latitude is not None
    assert (out["NoAddr"].latitude, out["NoAddr"].longitude) == enrich.DEFAULT_COORDS
    # every refreshed row stamped
    assert out["Never"].last_geocoded is not None


def test_geocode_deterministic(spark, venues):
    a = enrich.geocode_with_cache(venues, None).select("name", "latitude", "longitude")
    b = enrich.geocode_with_cache(venues, None).select("name", "latitude", "longitude")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_embed_only_if_null(spark):
    df = spark.createDataFrame(
        [(1, "some text", [0.5] * enrich.EMBED_DIM), (2, "other text", None)],
        "id long, txt string, emb array<float>",
    )

    def guarded_encoder(texts: pd.Series) -> pd.Series:
        if "some text" in set(texts):  # already-embedded row must skip inference
            raise AssertionError("encoder called on row with existing embedding")
        return enrich.fake_embed_batch(texts)

    out = {r.id: r for r in enrich.embed_column(df, "txt", "emb", guarded_encoder).collect()}
    assert out[1].emb == [0.5] * enrich.EMBED_DIM  # untouched
    assert out[2].emb is not None and len(out[2].emb) == enrich.EMBED_DIM


def test_embed_degrades_to_null_on_failure(spark):
    df = spark.createDataFrame([(1, "boom")], "id long, txt string")

    def broken(texts: pd.Series) -> pd.Series:
        raise RuntimeError("model load failed")

    out = enrich.embed_column(df, "txt", "emb", broken).collect()
    assert len(out) == 1 and out[0].emb is None  # row survives, embedding null


def test_embed_empty_text_null(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "real")], "id long, txt string")
    out = {r.id: r.emb for r in enrich.embed_column(df, "txt", "emb").collect()}
    assert out[1] is None and out[2] is None and out[3] is not None


def test_embed_unit_norm(spark):
    df = spark.createDataFrame([(1, "normalize me")], "id long, txt string")
    emb = enrich.embed_column(df, "txt", "emb").first().emb
    norm = sum(v * v for v in emb) ** 0.5
    assert abs(norm - 1.0) < 1e-3


def test_default_encoder_falls_back_to_stub():
    """No sentence-transformers in this container → the seam resolves to the
    deterministic stub."""
    assert enrich.real_embed_batch_factory() is None
    assert enrich.default_encoder() is enrich.fake_embed_batch


def test_default_encoder_real_branch_via_injection(monkeypatch):
    """Inject a fake sentence_transformers module: the seam must pick the
    real branch, lazy-load the model exactly once, L2-normalize, and
    degrade null/empty text to null — the same contract as the stub."""
    import sys
    import types

    import numpy as np
    import pandas as pd

    loads = []

    class FakeModel:
        def __init__(self, name):
            loads.append(name)

        def encode(self, texts, normalize_embeddings=False):
            vecs = []
            for t in texts:
                v = np.arange(1, 5, dtype="float64") * (len(t) or 1)
                if normalize_embeddings:
                    v = v / np.linalg.norm(v)
                vecs.append(v)
            return np.vstack(vecs)

    fake = types.ModuleType("sentence_transformers")
    fake.SentenceTransformer = FakeModel
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake)

    enc = enrich.default_encoder()
    assert enc is not enrich.fake_embed_batch

    out = enc(pd.Series(["abc", None, "", "hello"]))
    assert out[1] is None and out[2] is None
    assert abs(sum(x * x for x in out[0]) - 1.0) < 1e-6
    assert len(out[3]) == 4
    enc(pd.Series(["again"]))
    assert loads == ["all-MiniLM-L6-v2"]  # one lazy load, reused across batches
