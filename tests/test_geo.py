"""Grid-bucketed radius join: losslessness vs brute force, seam handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from fest_vibes_ai_etl_spark.operators import geo


def _brute(spark, build, probe, radius):
    b = build.select(
        F.col("b_id"), F.col("b_lat"), F.col("b_lon")
    )
    p = probe.select(F.col("p_id"), F.col("p_lat"), F.col("p_lon"))
    d = F.round(
        geo.haversine_km(F.col("b_lat"), F.col("b_lon"), F.col("p_lat"), F.col("p_lon"))
        + F.lit(1e-9),
        4,
    )
    return (
        b.crossJoin(p)
        .withColumn("dist_km", d)
        .filter(F.col("dist_km") <= radius)
        .select("b_id", "p_id", "dist_km")
    )


def test_radius_join_equals_brute_force(spark):
    """Random-ish deterministic points over the full lat/lon box, multiple
    radii: the grid join must reproduce the cross-join filter exactly."""
    from fest_vibes_ai_etl_spark.operators.trainprep import hash_fraction

    def pts(n, prefix, idc, latc, lonc):
        return spark.range(n).select(
            F.col("id").alias(idc),
            (F.lit(-60.0) + 120.0 * hash_fraction(F.col("id"), f"{prefix}lat:")).alias(latc),
            (F.lit(-180.0) + 360.0 * hash_fraction(F.col("id"), f"{prefix}lon:")).alias(lonc),
        )

    build = pts(60, "b", "b_id", "b_lat", "b_lon")
    probe = pts(400, "p", "p_id", "p_lat", "p_lon")
    for radius in (100.0, 700.0, 2500.0):
        got = sorted(
            map(tuple, geo.radius_join(build, probe, radius).collect())
        )
        want = sorted(map(tuple, _brute(spark, build, probe, radius).collect()))
        assert got == want and len(want) > 0, (radius, len(got), len(want))


def test_radius_join_antimeridian_pairs(spark):
    """Points straddling ±180° longitude are metrically adjacent; the
    seam-ghost expansion must find them (raw grid indexes would not)."""
    build = spark.createDataFrame(
        [(1, 10.0, 179.95), (2, -20.0, -179.9)], "b_id long, b_lat double, b_lon double"
    )
    probe = spark.createDataFrame(
        [(10, 10.0, -179.97), (20, -20.05, 179.93), (30, 0.0, 0.0)],
        "p_id long, p_lat double, p_lon double",
    )
    got = {(r.b_id, r.p_id) for r in geo.radius_join(build, probe, 50.0).collect()}
    assert got == {(1, 10), (2, 20)}
