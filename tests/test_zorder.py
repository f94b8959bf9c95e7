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


def test_zorder_write_bounds_rowgroup_rectangles(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from fest_vibes_ai_etl_spark.sources import table
    from fest_vibes_ai_etl_spark.sources.lakehouse import write_zordered

    ev = table(spark, SF_DIR, "events").select(
        (F.col("user_id") % 256).alias("x"),
        ((F.col("event_id") * 37) % 256).alias("y"),
        "event_id",
    )
    path = str(tmp_path / "zordered")
    write_zordered(ev, path, "x", "y", bits=8, num_files=16)

    spans = {"x": [], "y": []}
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            st = {
                g.column(i).path_in_schema: g.column(i).statistics
                for i in range(g.num_columns)
            }
            for d in ("x", "y"):
                spans[d].append(st[d].max - st[d].min)
    # Each file owns ~1/16 of the z-range -> ideal 64x64 rectangles; only
    # files straddling high-bit curve boundaries are wider. Both dims must
    # be bounded on average AND mostly tight -- a single-column sort would
    # leave the other dim's spans at ~255 everywhere.
    for d in ("x", "y"):
        assert len(spans[d]) >= 16
        assert sum(spans[d]) / len(spans[d]) <= 128, (d, spans[d])
        tight = sum(1 for s in spans[d] if s <= 96)
        assert tight / len(spans[d]) >= 0.6, (d, sorted(spans[d]))
