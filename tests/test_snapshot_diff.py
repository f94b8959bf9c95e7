"""Row-level semantics of the snapshot diff operator (the declared
summary query is value-checked by test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators.diff import snapshot_diff


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)],
        "id long, name string, v double",
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_respects_compare_cols(spark):
    old = spark.createDataFrame([(1, "a", 10.0)], "id long, name string, v double")
    new = spark.createDataFrame([(1, "ZZZ", 10.0)], "id long, name string, v double")
    # name excluded from tracking -> unchanged
    got = snapshot_diff(old, new, ["id"], compare_cols=["v"]).collect()
    assert [(r.id, r.status) for r in got] == [(1, "unchanged")]


def test_diff_summary_is_exhaustive(spark):
    # every key from either side appears exactly once
    old = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    new = spark.range(50, 150).select(F.col("id"), (F.col("id") * 2 + (F.col("id") % 3 == 0).cast("long")).alias("v"))
    out = snapshot_diff(old, new, ["id"])
    assert out.count() == 150
    assert out.select("id").distinct().count() == 150
