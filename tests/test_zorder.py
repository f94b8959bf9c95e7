"""Morton key properties: interleave round-trip and the bounded-rectangle
locality that makes Z-order layouts prune on both dimensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from fest_vibes_ai_etl_spark.functions.zorder import morton_key
from fest_vibes_ai_etl_spark.plans import catalog


def _ref_morton(x, y, bits=16):
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_reference_bit_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 40000) for y in (0, 3, 128, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.mk for r in df.select("x", "y", morton_key(F.col("x"), F.col("y")).alias("mk")).collect()}
    for (x, y), mk in got.items():
        assert mk == _ref_morton(x & 0xFFFF, y & 0xFFFF), (x, y)


def test_zorder_buckets_bound_both_dimensions(spark):
    out = catalog.queries()["zorder_bucket_bounds"](spark, SF_DIR).collect()
    assert len(out) > 10  # data spreads over many buckets
    for r in out:
        assert r.x_max - r.x_min <= 15, r
        assert r.y_max - r.y_min <= 15, r
