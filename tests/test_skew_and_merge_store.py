"""Skew utilities + partitioned-parquet MERGE discipline."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators import skew
from fest_vibes_ai_etl_spark.sources.merge_store import merge_into_partitioned


@pytest.fixture()
def tmproot():
    root = Path(tempfile.mkdtemp(prefix="fest_ms_"))
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _skewed_fact(spark, n=20000):
    # 90% of rows hit key 7 (the hot key), rest spread over 100 keys
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.pmod(F.col("id"), F.lit(100)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_sum_matches_plain(spark):
    fact = _skewed_fact(spark)
    plain = {
        (r.k): (r.s, r.n)
        for r in fact.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r.k): (r.sum_v, r.n)
        for r in skew.salted_sum_count(fact, ["k"], "v", salt_from="row_id").collect()
    }
    assert salted == plain


def test_replicated_join_matches_plain(spark):
    fact = _skewed_fact(spark)
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("k_name")
    )
    hot = spark.createDataFrame([(7,)], "k long")
    plain = sorted(
        (r.row_id, r.k_name) for r in fact.join(dim, "k").select("row_id", "k_name").collect()
    )
    salted = sorted(
        (r.row_id, r.k_name)
        for r in skew.replicated_join(fact, dim, "k", hot, fact_salt_from="row_id")
        .select("row_id", "k_name")
        .collect()
    )
    assert salted == plain


def test_merge_into_partitioned(spark, tmproot):
    path = str(tmproot / "t")
    day1 = spark.createDataFrame(
        [("a", "2025-01-01", 1.0, None), ("b", "2025-01-01", 2.0, "x")],
        "k string, d string, v double, note string",
    )
    merge_into_partitioned(spark, path, day1, keys=["k"], partition_col="d")
    assert spark.read.parquet(path).count() == 2

    # second batch: update a (note filled, v kept via coalesce of null), new c, new day
    day2 = spark.createDataFrame(
        [("a", "2025-01-01", None, "filled"), ("c", "2025-01-02", 3.0, None)],
        "k string, d string, v double, note string",
    )
    merge_into_partitioned(spark, path, day2, keys=["k"], partition_col="d")
    rows = {r.k: r for r in spark.read.parquet(path).collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"].v == 1.0 and rows["a"].note == "filled"  # coalesce semantics
    assert rows["b"].note == "x"  # untouched key in touched partition preserved

    # idempotence: re-running the same batch changes nothing
    merge_into_partitioned(spark, path, day2, keys=["k"], partition_col="d")
    rows2 = {r.k: (r.v, r.note, r.d) for r in spark.read.parquet(path).collect()}
    assert rows2 == {k: (r.v, r.note, r.d) for k, r in rows.items()}
