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


def test_compact_partitions(spark, tmp_path):
    from fest_vibes_ai_etl_spark.sources.lakehouse import (
        compact_partitions,
        partition_file_census,
    )

    path = str(tmp_path / "frag")
    # partition p=0 gets 6 tiny appends (fragmented); p=1 gets one file
    for i in range(6):
        spark.range(i * 10, i * 10 + 10).withColumn("p", F.lit(0)).write.mode(
            "append"
        ).partitionBy("p").parquet(path)
    spark.range(100, 120).withColumn("p", F.lit(1)).coalesce(1).write.mode(
        "append"
    ).partitionBy("p").parquet(path)

    before = partition_file_census(spark, path)
    assert before["p=0"][0] >= 6  # appends fan out per task — many fragments
    files_p1 = {f.name for f in (tmp_path / "frag" / "p=1").iterdir()}
    total_before = spark.read.parquet(path).agg(
        F.count("*"), F.avg("id")
    ).collect()[0]

    victims = compact_partitions(spark, path, "p", target_file_bytes=1 << 30)
    assert victims == ["0"]

    after = partition_file_census(spark, path)
    assert after["p=0"][0] == 1  # 6 fragments -> ideal single file
    # data byte-identical, untouched partition's files untouched
    assert spark.read.parquet(path).agg(
        F.count("*"), F.avg("id")
    ).collect()[0] == total_before
    assert {f.name for f in (tmp_path / "frag" / "p=1").iterdir()} == files_p1


def test_ivf_probe_uses_dynamic_partition_pruning(spark):
    """The persisted IVF index probe must read only the probed cells' files:
    the cell-partitioned scan carries a dynamic-pruning subquery fed by the
    per-query nprobe cell selection, and the query path contains no
    toPandas/fit (load_or_build_index split)."""
    from fest_vibes_ai_etl_spark.plans.catalog import REGISTRY, queries

    queries()
    df = REGISTRY["ann_ivf_topk"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert "ivf_index" in plan  # scans the persisted artifact, not a re-fit
    # Zero quantizer re-derivation and zero Python boundary in the probe:
    # no pandas-UDF assign pass (ArrowEvalPython), no mapInPandas, no
    # row-at-a-time Python; ranking prunes via the JVM WindowGroupLimit.
    for node in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert node not in plan, node
    assert "WindowGroupLimit" in plan


def test_source_fingerprint_listing_and_loud_failure(tmp_path):
    """Store keys must track the actual parquet file listing (names+sizes):
    rewriting one part file inside a directory dataset changes the key even
    when the directory stat doesn't, and an unstattable source raises
    instead of silently producing a shared unstamped key (advisor round-3)."""
    import time

    import pytest as _pytest

    from fest_vibes_ai_etl_spark.fingerprint import source_fingerprint

    d = tmp_path / "emb.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"aaaa")
    (d / "_SUCCESS").write_bytes(b"")
    fp1 = source_fingerprint(str(d))
    (d / "part-0.parquet").write_bytes(b"bbbbbb")  # size change, dir stat same-ish
    fp2 = source_fingerprint(str(d))
    assert fp1 != fp2
    # same size, different mtime also re-keys (regenerated dataset)
    time.sleep(1.1)
    (d / "part-0.parquet").write_bytes(b"cccccc")
    assert source_fingerprint(str(d)) != fp2
    with _pytest.raises(OSError):
        source_fingerprint(str(tmp_path / "missing.parquet"))
    assert source_fingerprint(str(tmp_path / "missing.parquet"), missing_ok=True) == "missingsrc"
