"""operators/geo.py: grid cover correctness and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from es_ch_sync_spark.operators.geo import (
    grid_aggregate,
    haversine_km,
    radius_join,
    trajectory_stats,
)


def _rand_points(spark, n, lat0, lon0, span):
    """Deterministic pseudo-random points in a band (md5-derived)."""
    return spark.range(n).select(
        F.col("id").alias("pid"),
        (
            F.lit(lat0)
            + F.conv(F.substring(F.md5(F.concat(F.lit("a"), F.col("id"))), 1, 8), 16, 10)
            .cast("double")
            / F.lit(float(1 << 32))
            * span
        ).alias("lat"),
        (
            F.lit(lon0)
            + F.conv(F.substring(F.md5(F.concat(F.lit("b"), F.col("id"))), 1, 8), 16, 10)
            .cast("double")
            / F.lit(float(1 << 32))
            * span
        ).alias("lon"),
    )


def test_radius_join_equals_brute_force(spark):
    """The 3x3 grid cover must lose NO pair vs the brute-force cross
    join, including at a high-latitude band where a degree of longitude
    shrinks (the cos(lat) scaling matters there)."""
    pts = _rand_points(spark, 500, 59.0, 10.0, 2.0)  # near 60°N
    qs = _rand_points(spark, 7, 59.3, 10.3, 1.2).selectExpr(
        "pid AS qid", "lat AS q_lat", "lon AS q_lon"
    )
    r = 15.0
    got = {
        (row["qid"], row["pid"])
        for row in radius_join(pts, qs, r).select("qid", "pid").collect()
    }
    brute = (
        pts.crossJoin(qs)
        .withColumn(
            "d", haversine_km(F.col("lat"), F.col("lon"), F.col("q_lat"), F.col("q_lon"))
        )
        .filter(F.col("d") < r)
    )
    want = {(row["qid"], row["pid"]) for row in brute.select("qid", "pid").collect()}
    assert got == want
    assert len(want) > 0


def test_radius_join_plan_no_cartesian(spark):
    pts = _rand_points(spark, 100, 40.0, -75.0, 1.0)
    qs = _rand_points(spark, 3, 40.2, -74.8, 0.5).selectExpr(
        "pid AS qid", "lat AS q_lat", "lon AS q_lon"
    )
    plan = (
        radius_join(pts, qs, 5.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grid_aggregate_counts(spark):
    pts = spark.createDataFrame(
        [(40.001, -74.999), (40.002, -74.998), (40.015, -74.999)],
        "lat double, lon double",
    )
    rows = {
        (r["cell_y"], r["cell_x"]): r["n_points"]
        for r in grid_aggregate(pts, cell_deg=0.01).collect()
    }
    assert rows[(4000, -7500)] == 2
    assert rows[(4001, -7500)] == 1


def test_trajectory_path_is_sum_of_hops(spark):
    # 3 pings in a line: hop lengths add up; single-ping key has NULL path
    pts = spark.createDataFrame(
        [
            ("a", 1, 40.0, -75.0),
            ("a", 2, 40.1, -75.0),
            ("a", 3, 40.3, -75.0),
            ("b", 1, 41.0, -74.0),
        ],
        "k string, t int, lat double, lon double",
    )
    out = {r["k"]: r for r in trajectory_stats(pts, "k", "t").collect()}
    assert out["a"]["n_pings"] == 3
    # 0.3° of latitude ≈ 33.4 km, split 1/3 + 2/3
    assert abs(out["a"]["path_km"] - 33.36) < 0.2
    assert abs(out["a"]["max_hop_km"] * 3 - out["a"]["path_km"] * 2) < 0.01
    assert out["b"]["n_pings"] == 1 and out["b"]["path_km"] is None
