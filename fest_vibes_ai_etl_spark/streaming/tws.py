"""transformWithStateInPandas: the Spark 4 arbitrary-state API.

Successor to ``applyInPandasWithState`` (streaming/sessions.py keeps that
form for gap sessionization): typed state handles (ValueState/ListState/
MapState), explicit time modes, and per-key timer callbacks, backed by the
RocksDB state store. This module carries the canonical running-aggregate
processor: per-key cumulative count/sum emitted every micro-batch — the
"profile table that is always current" shape (the reference recomputes its
Redis cache wholesale; this maintains the equivalent incrementally).

State per key is one (count, total) tuple — constant bytes, no growth with
stream length; RocksDB keeps the working set off-heap and checkpointed.

The processor class is defined INSIDE the builder function: Spark runs the
transformWithState driver worker in a separate Python process that cannot
import this package (same constraint as the Python DataSource planner), so
the class must cloudpickle BY VALUE — a factory-local class with lazy
imports does exactly that.

ENVIRONMENT GATE: the transformWithState protocol speaks protobuf between
the JVM and the state worker (`pyspark...proto.StateMessage_pb2`), so this
API needs the ``protobuf`` package at runtime. The implementation here is
complete and the test exercises it when protobuf is importable; otherwise
it skips (this container ships no protobuf and installs are disallowed) —
gap sessionization on the applyInPandasWithState path
(streaming/sessions.py) remains the fully-tested stateful operator."""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """(ts, user_id, value) stream → per-user cumulative (n_events,
    total_value), re-emitted on every batch the user appears in (Update
    mode downstream)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("totals", "cnt long, total double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd  # self-contained: separate worker process

            cnt, total = (0, 0.0)
            if self._state.exists():
                cnt, total = self._state.get()
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((cnt, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [cnt], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_user_totals_apws(events: DataFrame) -> DataFrame:
    """The SAME running-totals semantics on the ``applyInPandasWithState``
    predecessor API, which speaks the plain Arrow protocol (no protobuf
    state worker). Twin purpose: (a) a drop-in for Spark < 4 deployments,
    (b) the executable semantic reference the tws test falls back to when
    protobuf is absent — both paths must emit identical cumulative rows on
    the same fixture. State per key is the same constant-size (cnt, total)
    tuple."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("cnt", LongType()), StructField("total", DoubleType())]
    )

    def fn(key, pdfs, state):
        import pandas as pd  # self-contained: executor worker process

        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
