"""Stateful streaming sessionization: sessions carried across micro-batches
and closed by the gap rule — compared against the batch sessionization."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from fest_vibes_ai_etl_spark.sources import table
from fest_vibes_ai_etl_spark.streaming.sessions import sessionize_stream


@pytest.fixture()
def tmpdirs():
    root = Path(tempfile.mkdtemp(prefix="fest_sess_"))
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_stream_sessions_match_batch_closed_sessions(spark, tmpdirs):
    # two micro-batches: days 1-10 then 11-30, so sessions span batch seams
    # (user subset keeps the stateful-stream test fast; semantics identical)
    ev = (
        table(spark, "/root/testdata/sf0.001", "events")
        .filter("user_id < 40")
        .select("user_id", "ts")
    )
    d1 = ev.filter("ts <  timestamp'2024-01-11 00:00:00'")
    d2 = ev.filter("ts >= timestamp'2024-01-11 00:00:00'")
    src = tmpdirs / "src"
    # sequential writes into one dir: the file stream source orders batches
    # by modification time, so batch 1 (earlier data) processes first
    d1.coalesce(1).write.mode("overwrite").parquet(str(src))
    import time

    time.sleep(1.1)
    d2.coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(d1.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmpdirs / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in 180s"
    streamed = {
        (r.user_id, r.session_no): (
            r.n_events,
            r.session_start.replace(microsecond=0),  # batch query truncates to s
            r.session_end.replace(microsecond=0),
        )
        for r in spark.table("sessions_out").collect()
    }

    # batch truth: closed sessions = all but each user's last session
    from fest_vibes_ai_etl_spark.plans.catalog import REGISTRY, queries

    queries()
    batch = [
        r
        for r in REGISTRY["events_sessionization"].fn(spark, "/root/testdata/sf0.001").collect()
        if r.user_id < 40
    ]
    batch_all = {
        (r.user_id, r.session_no): (r.n_events, r.session_start, r.session_end)
        for r in batch
    }
    n_users = len({u for (u, _) in batch_all})

    assert streamed, "stream emitted no closed sessions"
    # every streamed session matches the batch computation exactly (the
    # event-time timeout may close even each user's final session once the
    # watermark passes it)
    for k, v in streamed.items():
        assert k in batch_all, f"spurious session {k}"
        assert v == batch_all[k], f"mismatch for {k}: {v} != {batch_all[k]}"
    # the stream closes everything except sessions still inside the final
    # watermark gap — at most one per user
    missing = set(batch_all) - set(streamed)
    assert len(missing) <= n_users, f"too many unclosed: {len(missing)}"