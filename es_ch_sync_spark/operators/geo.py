"""Geospatial operators: grid bucketing, radius join, trajectory stats.

The reference's status documents carry a geo ``location`` plus
latitude/longitude telemetry signals (`/root/reference/internal/sync/test/
status_mapping.json` — ``data.latitude``/``data.longitude`` float fields;
SURVEY.md §1.1), but the Go job only forwards them as plain numeric
signals.  An analytics engine over the same data needs the spatial
primitives: where are the vehicles (density grids), which are near a
point of interest (radius search), and how far did each travel
(trajectories).

Scale design (100 TB of pings):

- **Grid bucketing** is pure integer arithmetic (``floor(deg / cell)``),
  fully codegen'd, and gives data-skipping-friendly cell ids (pair with
  layout.zorder_write for locality).
- **Radius join** never considers all pairs: each query point expands to
  the 3x3 block of grid cells that COVERS its radius (cell size chosen ≥
  radius in degrees), candidates come from a broadcast hash join on the
  cell id, and the exact haversine predicate verifies candidates only —
  the standard grid-file spatial join, same candidate/verify discipline
  as the MinHash-LSH dedup path.
- **Trajectory stats** are per-key window lags (one shuffle on the key),
  never a self-join.

Haversine distances are double-precision; both engines evaluate the same
IEEE expression tree, with ULP-level libm differences absorbed by the
DECIMAL step-sum + round(4) surface discipline the rest of the registry
uses.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EARTH_RADIUS_KM = 6371.0


def cell_id(lat: Column, lon: Column, cell_deg: float) -> tuple[Column, Column]:
    """Integer grid cell of a point (floor-division on degrees)."""
    return (
        F.floor(lat / F.lit(cell_deg)).cast("long"),
        F.floor(lon / F.lit(cell_deg)).cast("long"),
    )


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine formula, built-in trig only
    — stays inside whole-stage codegen, no UDF)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(
        dlon
    ) * F.sin(dlon)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_aggregate(
    points: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 0.01,
) -> DataFrame:
    """Density grid: count + mean position per cell.  One partial-agg
    shuffle on the integer cell key; mean positions stay DECIMAL until
    the surface."""
    cy, cx = cell_id(F.col(lat_col), F.col(lon_col), cell_deg)
    dec = "decimal(18,9)"
    return (
        points.groupBy(cy.alias("cell_y"), cx.alias("cell_x"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col(lat_col).cast(dec)).alias("_slat"),
            F.sum(F.col(lon_col).cast(dec)).alias("_slon"),
        )
        .select(
            "cell_y",
            "cell_x",
            "n_points",
            F.round(F.col("_slat").cast("double") / F.col("n_points"), 6).alias(
                "mean_lat"
            ),
            F.round(F.col("_slon").cast("double") / F.col("n_points"), 6).alias(
                "mean_lon"
            ),
        )
    )


def radius_join(
    points: DataFrame,
    queries: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    qlat_col: str = "q_lat",
    qlon_col: str = "q_lon",
) -> DataFrame:
    """All (query, point) pairs within ``radius_km``, without a cross
    join: points bucket once into a grid whose cell edge covers the
    radius even at the corpus's worst-case latitude, each query point
    fans out to its 3x3 neighbor cells (a tiny broadcast), candidates
    come from the cell-id hash join, and exact haversine verifies.

    Correctness of the cover: with cell edge ≥ radius in degrees (lon
    scaled by the minimum cos(lat) over the data's band), any point
    within the radius of q lies in q's cell ± 1 in each axis."""
    max_abs_lat = (
        points.agg(F.max(F.abs(F.col(lat_col)))).first()[0] or 0.0
    )
    # degrees per km, at the tightest longitude circle in the data band
    lat_deg = radius_km / 111.0
    lon_deg = radius_km / max(111.0 * math.cos(math.radians(min(max_abs_lat + 1, 89.0))), 1e-6)
    cell = max(lat_deg, lon_deg)

    py, px = cell_id(F.col(lat_col), F.col(lon_col), cell)
    pts = points.withColumn("cell_y", py).withColumn("cell_x", px)

    qy, qx = cell_id(F.col(qlat_col), F.col(qlon_col), cell)
    off = F.explode(F.array([F.lit(i) for i in (-1, 0, 1)]))
    qs = (
        queries.withColumn("_qy", qy)
        .withColumn("_qx", qx)
        .withColumn("_dy", off)
        .withColumn("_dx", F.explode(F.array([F.lit(i) for i in (-1, 0, 1)])))
        .select(
            "*",
            (F.col("_qy") + F.col("_dy")).alias("cell_y"),
            (F.col("_qx") + F.col("_dx")).alias("cell_x"),
        )
        .drop("_qy", "_qx", "_dy", "_dx")
    )
    dist = haversine_km(
        F.col(lat_col), F.col(lon_col), F.col(qlat_col), F.col(qlon_col)
    )
    return (
        pts.join(F.broadcast(qs), ["cell_y", "cell_x"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") < radius_km)
        .drop("cell_y", "cell_x")
    )


def trajectory_stats(
    points: DataFrame,
    key_col: str,
    ts_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-key travel summary: hop count, total path length, max single
    hop.  One shuffle on the key; consecutive-ping distances come from
    window lags (never a self-join); the path sum goes through DECIMAL so
    it is association-free across engines."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    step = haversine_km(
        F.lag(lat_col).over(w),
        F.lag(lon_col).over(w),
        F.col(lat_col),
        F.col(lon_col),
    )
    dec = "decimal(18,9)"
    return (
        points.withColumn("_step", step)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.sum(F.col("_step").cast(dec)).alias("_path"),
            F.max("_step").alias("_maxhop"),
        )
        .select(
            key_col,
            "n_pings",
            F.round(F.col("_path").cast("double"), 4).alias("path_km"),
            F.round(F.col("_maxhop"), 4).alias("max_hop_km"),
        )
    )
