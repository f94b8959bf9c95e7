"""Physical-layout tests: partition pruning and shuffle-free bucketed joins —
the plans that must hold at 100 TB, asserted on the actual .explain output."""

from __future__ import annotations

import io
import contextlib
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.sources import lakehouse, table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def tmproot():
    root = Path(tempfile.mkdtemp(prefix="fest_lake_"))
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_partition_pruning(spark, tmproot):
    ev = table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmproot / "events_part")
    lakehouse.write_partitioned(ev, path, ["event_date"])

    q = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-15")
    plan = _plan(q)
    assert "PartitionFilters" in plan
    # pruned scan reads exactly one of ~30 date partitions
    n_days = ev.select("event_date").distinct().count()
    assert n_days > 20
    assert q.count() == ev.filter(F.col("event_date") == "2024-01-15").count()


def test_dynamic_partition_overwrite_is_idempotent(spark, tmproot):
    ev = table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmproot / "events_dyn")
    lakehouse.write_partitioned(ev, path, ["event_date"])
    before = spark.read.parquet(path).count()
    # re-write only one day (a daily re-run): other partitions untouched
    one_day = ev.filter(F.col("event_date") == "2024-01-15")
    lakehouse.write_partitioned(one_day, path, ["event_date"], mode="overwrite")
    after = spark.read.parquet(path).count()
    assert after == before


def test_bucketed_join_no_shuffle(spark, tmproot):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        orders = table(spark, "/root/testdata/sf0.001", "orders")
        cust = table(spark, "/root/testdata/sf0.001", "customer")
        lakehouse.write_bucketed(orders, "orders_b", "o_custkey", 8)
        lakehouse.write_bucketed(cust, "cust_b", "c_custkey", 8)
        ob, cb = spark.table("orders_b"), spark.table("cust_b")
        j = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # bucketed co-location: no shuffle exchange feeding the join
        assert "hashpartitioning" not in plan, plan
        # same join un-bucketed DOES shuffle (the thing bucketing removes)
        j2 = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert "hashpartitioning" in _plan(j2)
        assert j.count() == j2.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")
