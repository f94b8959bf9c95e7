"""Cogrouped applyInPandas as-of matching: semantics + empty-side guards."""

from __future__ import annotations

import datetime as dt

from fest_vibes_ai_etl_spark.operators.cogroup import cogrouped_asof_match


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_cogroup_asof_backward_match(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(30)), (3, 20, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(8)), (101, 10, _ts(25)), (102, 30, _ts(1))],
        "event_id long, user_id long, ts timestamp",
    )
    out = {r.event_id: r.matched_id for r in cogrouped_asof_match(left, right, "user_id").collect()}
    # 1 -> 100 (8<=10), 2 -> 101 (25<=30), 3 -> None (user 20 has no rights)
    assert out == {1: 100, 2: 101, 3: None}


def test_cogroup_right_only_keys_dropped(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 99, _ts(1))], "event_id long, user_id long, ts timestamp"
    )
    rows = cogrouped_asof_match(left, right, "user_id").collect()
    # left-join semantics: right-only key 99 contributes nothing
    assert len(rows) == 1 and rows[0].matched_id is None
