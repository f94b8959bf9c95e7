"""Stateful streaming sessionization — ``applyInPandasWithState``.

The custom stateful operator the batch lag-cumsum plan can't express in a
stream: per-user session state (start, last-seen, count) carried across
micro-batches, emitted when the inactivity gap closes the session or the
event-time timeout fires. State is keyed by user_id, so it scales with
|active users|, not |events|; the timeout bounds state exactly like the
watermark bounds the windowed aggs (streaming/ingest.py).

The closure is self-contained (stdlib imports inside) — it runs on executors
without this package on their import path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_MIN = 30

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_no", IntegerType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_no", IntegerType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def sessionize_stream(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """events (user_id, ts, …) stream → closed sessions. Sessions close when
    a new event arrives past the gap, or the event-time timeout fires for an
    idle key once the watermark passes last_seen + gap.

    Event-time (not processing-time) timeouts matter twice: correctness
    (sessions close by data time, reprocessing history behaves identically)
    and termination (a processing-time timeout re-arms forever, so an
    availableNow run never finishes — observed, not hypothetical)."""
    events = events.withWatermark(ts_col, f"{GAP_MIN} minutes")

    def fn(key, pdfs, state: GroupState):
        import datetime as dt

        import pandas as pd

        gap_us = GAP_MIN * 60 * 1_000_000
        (user_id,) = key
        closed = []

        if state.hasTimedOut:
            if state.exists:
                sno, n, start_us, last_us = state.get
                closed.append((user_id, sno, n, start_us, last_us))
                state.remove()
        else:
            ts_us = []
            for pdf in pdfs:
                ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col]))
            ts_us.sort()
            if state.exists:
                sno, n, start_us, last_us = state.get
            else:
                sno, n, start_us, last_us = 1, 0, None, None
            for t in ts_us:
                if last_us is not None and t - last_us > gap_us:
                    closed.append((user_id, sno, n, start_us, last_us))
                    sno, n, start_us = sno + 1, 0, None
                n += 1
                start_us = t if start_us is None else start_us
                last_us = t
            state.update((sno, n, start_us, last_us))
            # fire once the watermark passes the gap after the last event
            # (must stay ahead of the current watermark or Spark rejects it)
            fire_ms = max(
                last_us // 1000 + GAP_MIN * 60 * 1000,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(fire_ms)

        if closed:
            yield pd.DataFrame(
                [
                    {
                        "user_id": u,
                        "session_no": s,
                        "n_events": n,
                        "session_start": dt.datetime.utcfromtimestamp(st / 1e6),
                        "session_end": dt.datetime.utcfromtimestamp(en / 1e6),
                    }
                    for (u, s, n, st, en) in closed
                ]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
