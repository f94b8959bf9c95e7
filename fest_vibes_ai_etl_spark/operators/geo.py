"""Geospatial distance operators: haversine + grid-bucketed radius joins.

The reference's data model carries venue latitude/longitude with a
default-coordinates fallback (reference models.py venue lat/lon;
configs.py default_coords) — the "events near me" query is the natural
read path over it. Spark has no spatial index, and the naive distance
join is a cross join (|A|·|B| haversine evaluations — 10⁹×10⁶ at scale).
The scale-correct shape is the GRID BUCKET join, the equi-join reduction
every distributed spatial engine uses (GeoSpark/Sedona's uniform grid,
Uber's H3 at fixed resolution):

1. choose cell strides ≥ the radius in degrees (latitude stride is
   constant; longitude stride uses the worst-case ``cos(max |lat|)`` in
   the data so a cell is never narrower than the radius anywhere);
2. each probe row lands in ONE home cell; each build row expands to its
   3×3 cell neighborhood (factor 9 on the SMALLER side only);
3. equi-join on the cell id — candidates are only pairs in adjacent
   cells, so join traffic tracks data density, not |A|·|B|;
4. verify candidates with the exact haversine and keep ``d ≤ radius``.

Losslessness: two points within ``radius`` differ by ≤ radius/110.574°
latitude and ≤ radius/(111.320·cos(max|lat|))° longitude, i.e. by at
most one cell stride per axis — always within the 3×3 neighborhood.
Step 4 removes every false candidate, so the result is EXACTLY the
cross-join filter's (oracle-checkable in plain SQL).

All column expressions (JVM-side, codegen-eligible); the haversine uses
only sin/cos/asin/sqrt/radians, reproducible in DuckDB for the oracles.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean radius
KM_PER_DEG_LAT = 110.574
KM_PER_DEG_LON_EQ = 111.320


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (double; round for cross-engine compare)."""
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlmb) * F.sin(dlmb)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def _strides(radius_km: float, max_abs_lat: float) -> tuple[float, float]:
    lat_stride = radius_km / KM_PER_DEG_LAT
    lon_stride = radius_km / (KM_PER_DEG_LON_EQ * math.cos(math.radians(max_abs_lat)))
    return lat_stride, lon_stride


def radius_join(
    build: DataFrame,
    probe: DataFrame,
    radius_km: float,
    max_abs_lat: float = 60.0,
    build_cols: tuple[str, str, str] = ("b_id", "b_lat", "b_lon"),
    probe_cols: tuple[str, str, str] = ("p_id", "p_lat", "p_lon"),
    round_to: int = 4,
) -> DataFrame:
    """All (build, probe) pairs within ``radius_km``:
    (b_id, p_id, dist_km rounded). ``build`` is the SMALLER side — it pays
    the 9× neighborhood expansion; ``probe`` lands in one home cell and is
    scanned once. ``max_abs_lat`` must bound the data's |latitude| (the
    longitude stride uses its cosine; exceeding it would make far-north
    cells narrower than the radius and break losslessness — asserted by
    the caller's data contract, tested against brute force)."""
    b_id, b_lat, b_lon = build_cols
    p_id, p_lat, p_lon = probe_cols
    lat_s, lon_s = _strides(radius_km, max_abs_lat)

    probe_cells = probe.select(
        p_id, p_lat, p_lon,
        F.floor(F.col(p_lat) / lat_s).cast("long").alias("cy"),
        F.floor(F.col(p_lon) / lon_s).cast("long").alias("cx"),
    )
    # Antimeridian: the haversine treats lon −179.9° and +179.9° as 0.2°
    # apart but raw grid indexes put them ~360/stride cells apart, silently
    # dropping cross-seam pairs (caught by the oracle at sf0.01). Build rows
    # within one stride of the seam get a GHOST copy shifted ±360° so every
    # within-radius pair is within one stride of some copy; a pair can only
    # match one copy (the other sits half a world away), and dropDuplicates
    # guards the degenerate huge-radius case.
    ghosted = (
        build.select(b_id, b_lat, b_lon)
        .withColumn(
            "lon_shift",
            F.explode(
                F.when(
                    F.col(b_lon) >= 180.0 - lon_s, F.array(F.lit(0.0), F.lit(-360.0))
                )
                .when(
                    F.col(b_lon) < -180.0 + lon_s, F.array(F.lit(0.0), F.lit(360.0))
                )
                .otherwise(F.array(F.lit(0.0)))
            ),
        )
        .withColumn("b_lon_cell", F.col(b_lon) + F.col("lon_shift"))
    )
    build_cells = (
        ghosted
        .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            b_id, b_lat, b_lon,
            (F.floor(F.col(b_lat) / lat_s).cast("long") + F.col("dy")).alias("cy"),
            (F.floor(F.col("b_lon_cell") / lon_s).cast("long") + F.col("dx")).alias("cx"),
        )
    )
    d = F.round(
        haversine_km(F.col(b_lat), F.col(b_lon), F.col(p_lat), F.col(p_lon))
        + F.lit(1e-9),
        round_to,
    )
    return (
        build_cells.join(probe_cells, ["cy", "cx"])
        .withColumn("dist_km", d)
        .filter(F.col("dist_km") <= radius_km)
        .select(b_id, p_id, "dist_km")
        .dropDuplicates([b_id, p_id])
    )
