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
    q.awaitTermination(120)

    manifests = [n for n in os.listdir(out) if n.startswith("_MANIFEST-")]
    assert len(manifests) == 2  # one per micro-batch
    back = cache_export_sink.read_cache_export(spark, out)
    assert back.count() == 30
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(30))
