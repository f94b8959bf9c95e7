"""Bloom-filter semi-join: no false negatives, exactness, pruning power."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.operators import bloomfilter as B
from fest_vibes_ai_etl_spark.sources import table


def test_bloom_no_false_negatives(spark):
    supp = table(spark, SF_DIR, "supplier")
    bitmap = B.build_bloom(supp, "s_suppkey")
    misses = supp.filter(~B.bloom_might_contain(bitmap, F.col("s_suppkey"))).count()
    assert misses == 0


def test_bloom_semi_join_exact(spark):
    li = table(spark, SF_DIR, "lineitem")
    watch = table(spark, SF_DIR, "supplier").filter(F.pmod("s_suppkey", F.lit(5)) == 0)
    got = {
        tuple(r)
        for r in B.bloom_semi_join(li, watch, "l_suppkey", "s_suppkey")
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    want = {
        tuple(r)
        for r in li.join(
            watch.select(F.col("s_suppkey").alias("l_suppkey")), "l_suppkey", "left_semi"
        )
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    assert got == want and len(got) > 0


def test_bloom_prefilter_prunes(spark):
    li = table(spark, SF_DIR, "lineitem")
    watch = table(spark, SF_DIR, "supplier").filter(F.pmod("s_suppkey", F.lit(5)) == 0)
    total = li.count()
    exact = B.bloom_semi_join(li, watch, "l_suppkey", "s_suppkey").count()
    pre = B.bloom_semi_join(
        li, watch, "l_suppkey", "s_suppkey", exact=False
    ).count()
    # superset of the true matches, but far below the full scan: the bitmap
    # (2^20 bits, 5 hashes, a handful of keys) has FP rate << 1%.
    assert exact <= pre <= exact + max(10, total // 100)
    assert pre < total / 2
