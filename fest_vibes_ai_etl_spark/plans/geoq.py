"""Geospatial queries: grid-bucketed radius join + nearest-neighbor.

The reference stores venue coordinates (models.py lat/lon columns,
configs.py default_coords New Orleans fallback) — distance search is the
natural read path. The driver tables carry no coordinates, so both sides
synthesize DETERMINISTIC, ENGINE-PORTABLE coords from entity keys via the
md5 fraction (operators/trainprep.hash_fraction): lat ∈ [−60, 60),
lon ∈ [−180, 180). The scale factors are exact in float64 (k/2²⁴ times
120/360 stays dyadic), so Spark and DuckDB derive bit-identical
coordinates and the haversine is oracle-comparable after the repo's
standard +1e-9 / round-4 treatment.

Spark side: ``operators/geo.radius_join`` — 3×3 grid-cell candidate join
(equi-join on cell ids, 9× expansion on the SMALL side only), exact
haversine verify. Oracle side: the plain cross-join filter, feasible at
oracle SFs and exactly what the grid join must reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import geo
from ..operators.trainprep import hash_fraction
from ..sources import table
from .catalog import register

RADIUS_KM = 250.0
NN_RADIUS_KM = 500.0
MAX_ABS_LAT = 60.0


def _coords(df: DataFrame, key: str, id_alias: str, lat: str, lon: str) -> DataFrame:
    return df.select(
        F.col(key).alias(id_alias),
        (F.lit(-60.0) + 120.0 * hash_fraction(F.col(key), "geolat:")).alias(lat),
        (F.lit(-180.0) + 360.0 * hash_fraction(F.col(key), "geolon:")).alias(lon),
    )


def _coords_sql(table_name: str, key: str) -> str:
    frac = (
        "(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 6))::BIGINT"
        " / 16777216.0)"
    )
    lat = "-60.0 + 120.0 * " + frac.format(salt="geolat:", key=key)
    lon = "-180.0 + 360.0 * " + frac.format(salt="geolon:", key=key)
    return f"SELECT {key}, {lat} AS lat, {lon} AS lon FROM {table_name}"


_HAV = (
    "ROUND(2 * 6371.0088 * ASIN(SQRT("
    "SIN(RADIANS(c.lat - s.lat) / 2) * SIN(RADIANS(c.lat - s.lat) / 2)"
    " + COS(RADIANS(s.lat)) * COS(RADIANS(c.lat))"
    " * SIN(RADIANS(c.lon - s.lon) / 2) * SIN(RADIANS(c.lon - s.lon) / 2)"
    ")) + 0.000000001, 4)"
)


@register(
    "geo_radius_pairs",
    oracle=f"""
    WITH s AS ({_coords_sql("supplier", "s_suppkey")}),
         c AS ({_coords_sql("customer", "c_custkey")})
    SELECT s_suppkey, c_custkey, dist_km FROM (
      SELECT s.s_suppkey, c.c_custkey, {_HAV} AS dist_km
      FROM s CROSS JOIN c
    ) WHERE dist_km <= {RADIUS_KM}
    ORDER BY s_suppkey, c_custkey
    """,
    tags=("geo", "join", "grid", "radius"),
    bench=True,
    doc="All (supplier, customer) pairs within 250 km via the grid-bucket "
    "radius join: suppliers (small side) expand to their 3x3 cell "
    "neighborhood, customers land in one home cell, the equi-join on cell "
    "ids replaces the cross join, exact haversine verifies. The oracle IS "
    "the cross-join filter - the grid join must reproduce it exactly "
    "(losslessness: within-radius pairs differ by at most one cell stride "
    "per axis by construction of the strides).",
)
def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _coords(table(spark, sf_dir, "supplier"), "s_suppkey", "s_suppkey", "b_lat", "b_lon")
    cust = _coords(table(spark, sf_dir, "customer"), "c_custkey", "c_custkey", "p_lat", "p_lon")
    return geo.radius_join(
        supp, cust, RADIUS_KM, MAX_ABS_LAT,
        build_cols=("s_suppkey", "b_lat", "b_lon"),
        probe_cols=("c_custkey", "p_lat", "p_lon"),
    ).orderBy("s_suppkey", "c_custkey")


@register(
    "geo_nearest_supplier",
    oracle=f"""
    WITH s AS ({_coords_sql("supplier", "s_suppkey")}),
         c AS ({_coords_sql("customer", "c_custkey")}),
    d AS (
      SELECT c.c_custkey, s.s_suppkey, {_HAV} AS dist_km
      FROM c CROSS JOIN s
    ),
    r AS (
      SELECT c_custkey, s_suppkey, dist_km,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY dist_km, s_suppkey) AS rk
      FROM d WHERE dist_km <= {NN_RADIUS_KM}
    )
    SELECT c_custkey, s_suppkey, dist_km FROM r WHERE rk = 1
    ORDER BY c_custkey
    """,
    tags=("geo", "join", "nearest", "topk"),
    doc="Nearest supplier per customer within 500 km (customers with no "
    "supplier in range are excluded - the radius bound is what keeps the "
    "candidate set grid-prunable; an unbounded nearest-neighbor needs "
    "expanding-ring search). Ranking is the JVM WindowGroupLimit path; "
    "ties break on supplier key identically in the oracle.",
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _coords(table(spark, sf_dir, "supplier"), "s_suppkey", "s_suppkey", "b_lat", "b_lon")
    cust = _coords(table(spark, sf_dir, "customer"), "c_custkey", "c_custkey", "p_lat", "p_lon")
    pairs = geo.radius_join(
        supp, cust, NN_RADIUS_KM, MAX_ABS_LAT,
        build_cols=("s_suppkey", "b_lat", "b_lon"),
        probe_cols=("c_custkey", "p_lat", "p_lon"),
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("c_custkey", "s_suppkey", "dist_km")
        .orderBy("c_custkey")
    )
