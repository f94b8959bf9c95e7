"""Cache-export DataSource writer: manifest-gated visibility, batch and
streaming commits, garbage invisibility."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.sources import cache_export_sink


def test_batch_write_manifest_and_readback(spark, tmp_path):
    cache_export_sink.register(spark)
    out = str(tmp_path / "cache")
    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("events:"), F.col("id").cast("string")).alias("key"),
        (F.col("id") % 7).alias("ttl_tier"),
    ).repartition(4)
    df.write.format("festvibes_cache").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 100
    assert len(manifest["files"]) == 4
    for d in manifest["files"]:
        assert os.path.exists(os.path.join(out, d["file"]))

    # a stray file from a failed attempt is invisible to the reader
    with open(os.path.join(out, "part-99999-deadbeef.json"), "w") as f:
        f.write('{"id": 424242, "key": "events:bogus", "ttl_tier": 0}\n')

    back = cache_export_sink.read_cache_export(spark, out)
    assert back.count() == 100
    assert back.filter(F.col("id") == 424242).count() == 0
    assert (
        back.agg(F.sum("id")).collect()[0][0] == sum(range(100))
    )


def test_stream_write_per_epoch_manifests(spark, tmp_path):
    cache_export_sink.register(spark)
    src = str(tmp_path / "src")
    spark.range(0, 10).coalesce(1).write.parquet(src)
    spark.range(10, 30).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "cache_stream")
    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.format("festvibes_cache")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in 120s"

    manifests = [n for n in os.listdir(out) if n.startswith("_MANIFEST-")]
    assert len(manifests) == 2  # one per micro-batch
    back = cache_export_sink.read_cache_export(spark, out)
    assert back.count() == 30
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(30))


def test_redis_client_factory_guard_and_pipeline(monkeypatch):
    """redis isn't installed here, so the factory must return None; with a
    fake redis module injected, the produced client must SETEX through a
    non-transactional pipeline, auto-flush at pipeline_size, and flush
    before reads (reference redis_cache.py:98-137 semantics)."""
    import sys
    import types

    from fest_vibes_ai_etl_spark.pipeline import cache_sink

    if "redis" not in sys.modules:
        assert cache_sink.redis_client_factory() is None

    calls = {"executed": 0, "store": {}}

    class FakePipe:
        def __init__(self):
            self.buf = []

        def setex(self, k, ttl, v):
            self.buf.append((k, ttl, v))

        def execute(self):
            calls["executed"] += 1
            for k, ttl, v in self.buf:
                calls["store"][k] = (ttl, v)
            self.buf.clear()

    class FakeRedis:
        @classmethod
        def from_url(cls, url):
            return cls()

        def pipeline(self, transaction):
            assert transaction is False
            return FakePipe()

        def get(self, k):
            v = calls["store"].get(k)
            return v[1].encode() if v else None

    fake = types.ModuleType("redis")
    fake.Redis = FakeRedis
    monkeypatch.setitem(sys.modules, "redis", fake)

    factory = cache_sink.redis_client_factory(pipeline_size=3)
    assert factory is not None
    client = factory()
    for i in range(7):
        client.setex(f"events:2025-03-0{i}", 3600, f"[{i}]")
    assert calls["executed"] == 2  # two full batches of 3 auto-flushed
    assert client.get("events:2025-03-06") == "[6]"  # get() flushes the tail
    assert calls["executed"] == 3
    assert calls["store"]["events:2025-03-01"] == (3600, "[1]")
