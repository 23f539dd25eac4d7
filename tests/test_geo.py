"""Geo radius join: cell blocking must be lossless vs brute-force
haversine within the documented bounds (|lat| <= max_abs_lat, no
antimeridian straddle)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.geo import (
    geo_radius_join,
    haversine_km,
    radius_cell_deg,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "point_id long, lat double, lon double")


def test_matches_brute_force(spark):
    rng = random.Random(11)
    # clustered points so the radius actually bites, incl. high latitude
    rows = []
    for i in range(300):
        base_lat, base_lon = rng.choice([(51.5, -0.1), (-33.9, 151.2), (59.3, 18.1)])
        rows.append(
            (i, base_lat + rng.uniform(-1, 1), base_lon + rng.uniform(-1, 1))
        )
    pts = _pts(spark, rows)
    qs = pts.limit(20).withColumnRenamed("point_id", "query_id")
    got = {
        (r.query_id, r.point_id)
        for r in geo_radius_join(pts, qs, radius_km=30.0).collect()
    }
    q2 = qs.select(
        F.col("query_id"), F.col("lat").alias("qlat"), F.col("lon").alias("qlon")
    )
    brute = (
        q2.crossJoin(pts)
        .withColumn(
            "d",
            haversine_km(
                F.col("qlat"), F.col("qlon"), F.col("lat"), F.col("lon")
            ),
        )
        .filter(F.col("d") <= 30.0)
    )
    want = {(r.query_id, r.point_id) for r in brute.collect()}
    assert got == want and len(want) > 20  # non-trivial and lossless


def test_cell_resolution_covers_high_latitude(spark):
    # two points ~49 km apart east-west at 59.9N: a cell sized for the
    # equator would separate them by >1 cell; radius_cell_deg(50, 60)
    # must keep them adjacent
    assert radius_cell_deg(50, 60.0) > radius_cell_deg(50, 0.0)
    pts = _pts(spark, [(1, 59.9, 10.0), (2, 59.9, 10.875)])
    qs = pts.filter(F.col("point_id") == 1).withColumnRenamed(
        "point_id", "query_id"
    )
    got = {
        r.point_id
        for r in geo_radius_join(pts, qs, radius_km=50.0).collect()
    }
    assert got == {1, 2}


def test_haversine_known_distance(spark):
    # London -> Paris ~343-344 km
    d = (
        spark.range(1)
        .select(
            haversine_km(
                F.lit(51.5074), F.lit(-0.1278), F.lit(48.8566), F.lit(2.3522)
            ).alias("d")
        )
        .first()
        .d
    )
    assert 342 < d < 345
