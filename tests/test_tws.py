"""transformWithStateInPandas running totals: stream ≡ batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.sources import table
from fest_vibes_ai_etl_spark.streaming.tws import running_user_totals


def test_tws_running_totals_match_batch(spark, tmp_path):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState speaks protobuf to the state worker",
    )
    ev = table(spark, SF_DIR, "events").select("ts", "user_id", "value")
    src = str(tmp_path / "src")
    half1 = ev.limit(400)
    half1.coalesce(1).write.parquet(src)
    ev.subtract(half1).coalesce(1).write.mode("append").parquet(src)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema("ts timestamp, user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            running_user_totals(stream)
            .writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    except Exception as ex:  # pragma: no cover - environment-dependent store
        if "RocksDB" in str(ex):
            pytest.skip(f"RocksDB state store unavailable: {ex}")
        raise
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    # LAST emission per user (update mode re-emits a key each batch it
    # appears in; memory sink appends, so take the max-count row)
    got = {}
    for r in spark.sql("SELECT * FROM tws_totals").collect():
        cur = got.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            got[r.user_id] = (r.n_events, r.total_value)
    want = {
        r.user_id: (r.n, r.t)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6
