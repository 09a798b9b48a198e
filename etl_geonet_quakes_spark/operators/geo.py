"""Geo operator kit: great-circle distance, proximity ranking and
grid-cell bucketing in pure column algebra.

The reference's whole domain is geospatial (GeoNet earthquake
features, lon/lat/depth coordinates — /root/reference/task.ts:228-233
rewrites the 3-D geometry), yet it computes nothing FROM the
coordinates. This module supplies the geo analytics a quake consumer
actually runs: how far is each event from a point of interest, which
events are nearest, and which coarse grid cell (the spatial
partitioning key) each falls in.

Determinism: haversine is sin/cos/atan2 over doubles — libm vs JVM
Math can drift by ~1 ulp, so distances are rounded to 4 decimal km
(0.1 m) for cross-engine display parity and ranking ties are broken
by the event id. All math is column algebra (whole-stage codegen);
no UDF.

At scale: distance + cell derivation are narrow per-row projections
(scan-stage, embarrassingly parallel); grid bucketing IS the spatial
shuffle key — a geo join at 100 TB equi-joins on the cell (plus
neighbor cells for radius queries) exactly like LSH bands bucket the
similarity join.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Wellington, NZ — the reference feed's home audience.
POI_LAT = -41.2889
POI_LON = 174.7772
EARTH_RADIUS_KM = 6371.0

_FIXTURE_JSON = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "geonet_quakes.json",
)


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine form — numerically stable
    for small angles, unlike the spherical law of cosines)."""
    rlat1 = F.radians(lat1)
    rlat2 = F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * EARTH_RADIUS_KM * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def grid_cell(lat: Column, lon: Column, cell_deg: float = 1.0) -> Column:
    """Integer grid-cell id from a (lat, lon) pair: floor-bucketed
    degrees packed as cell_lat * 360/cell + cell_lon — THE spatial
    partitioning/join key (radius queries probe the 3×3 neighbor
    block, the geo analog of LSH band buckets)."""
    n_lon = int(round(360 / cell_deg))
    cy = F.floor((lat + 90.0) / cell_deg).cast("long")
    cx = F.floor((lon + 180.0) / cell_deg).cast("long")
    return cy * n_lon + cx


def quake_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-quake geo analytics over the GeoNet fixture: haversine
    distance from Wellington, proximity rank (nearest first, publicID
    tie-break), and the 1° grid cell — the columns a 'quakes near me'
    consumer derives from the reference's raw geometry
    (task.ts:228-233 ships lon/lat untouched; this computes with it).

    ``sf_dir`` is unused (the fixture is the geo source, as in
    q02/q03) but kept for the registry signature."""
    from etl_geonet_quakes_spark.io import read_geojson
    from etl_geonet_quakes_spark.quakes import GEONET_RESPONSE_SCHEMA
    from pyspark.sql import Window

    raw = read_geojson(spark, _FIXTURE_JSON, GEONET_RESPONSE_SCHEMA)
    f = raw.select(F.explode("features").alias("f")).select(
        F.col("f.properties.publicID").alias("public_id"),
        F.col("f.geometry.coordinates").getItem(0).alias("lon"),
        F.col("f.geometry.coordinates").getItem(1).alias("lat"),
        F.col("f.properties.magnitude").alias("magnitude"),
    )
    dist = haversine_km(
        F.col("lat"), F.col("lon"), F.lit(POI_LAT), F.lit(POI_LON)
    )
    w = Window.orderBy("dist_km", "public_id")
    return (
        f.select(
            "public_id",
            "magnitude",
            F.round(dist, 4).alias("dist_km"),
            grid_cell(F.col("lat"), F.col("lon")).alias("cell_id"),
        )
        .withColumn("proximity_rank", F.row_number().over(w))
        .orderBy("proximity_rank")
    )


def haversine_km_py(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Reference implementation for tests (same formula, python math)."""
    rlat1, rlat2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(rlat1) * math.cos(rlat2) * math.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * math.atan2(math.sqrt(a), math.sqrt(1 - a))
