"""Geo radius join: cell blocking must be lossless vs brute-force
haversine within the documented bound (|lat| <= max_abs_lat), INCLUDING
pairs straddling the antimeridian (the lon columns wrap mod the column
count)."""

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
        # fixture reaches |lat| ~60.3 (59.3 + 1), so the bound must say so
        for r in geo_radius_join(
            pts, qs, radius_km=30.0, max_abs_lat=61.0
        ).collect()
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


def test_matches_brute_force_across_antimeridian(spark):
    """Losslessness where it used to be a documented gap: a cluster
    straddling lon ±180 (Fiji-ish), with both lon spellings of the line
    itself (+180 and -180 must share a cell key)."""
    rng = random.Random(23)
    rows = [(900, -17.0, 180.0), (901, -17.0, -180.0)]
    for i in range(300):
        lon = 179.3 + rng.uniform(0, 1.4)  # [179.3, 180.7) -> straddles
        if lon >= 180.0:
            lon -= 360.0
        rows.append((i, -17.0 + rng.uniform(-0.7, 0.7), lon))
    pts = _pts(spark, rows)
    qs = pts.limit(25).withColumnRenamed("point_id", "query_id")
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
    # the fixture must actually exercise the wrap: some surviving pair has
    # its two ends on opposite lon signs
    lons = {r[0]: r[2] for r in rows}
    assert any(lons[q] * lons[p] < 0 for q, p in want)
    assert got == want and len(want) > 25


def test_colocation_across_antimeridian(spark):
    """Two tracks meeting AT the line within the time window pair up; a
    third track at the same spot a decade earlier does not."""
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.geo import (
        colocation_pairs,
    )

    t0 = dt.datetime(2024, 6, 1, 12, 0)
    df = spark.createDataFrame(
        [
            (1, 10, t0, -16.9, 179.95),
            (2, 20, t0 + dt.timedelta(minutes=10), -16.9, -179.95),
            (3, 30, t0 - dt.timedelta(days=3650), -16.9, -179.95),
        ],
        "user_id long, event_id long, ts timestamp, lat double, lon double",
    )
    got = {
        (r.user_id_a, r.user_id_b)
        for r in colocation_pairs(df, radius_km=20.0, max_dt_s=3600).collect()
    }
    assert got == {(1, 2)}


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


def test_colocation_matches_brute_force(spark):
    import datetime as dt
    import random

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.geo import (
        colocation_pairs,
        haversine_km,
    )

    rng = random.Random(5)
    t0 = dt.datetime(2024, 6, 1)
    rows = []
    fid = 0
    # 12 tracks wandering around two hubs over a day
    for trk in range(12):
        lat0, lon0 = rng.choice([(48.1, 11.5), (48.6, 12.0)])
        for step in range(25):
            rows.append(
                (
                    trk,
                    fid,
                    t0 + dt.timedelta(minutes=step * 30 + trk),
                    lat0 + rng.uniform(-0.3, 0.3),
                    lon0 + rng.uniform(-0.3, 0.3),
                )
            )
            fid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, lat double, lon double"
    )
    got = {
        (r.user_id_a, r.user_id_b): (r.n_encounters, r.first_ms)
        for r in colocation_pairs(df, radius_km=20.0, max_dt_s=1800).collect()
    }
    a = df.selectExpr(
        "user_id AS ua", "event_id AS fa", "unix_millis(ts) AS ma",
        "lat AS la", "lon AS loa",
    )
    b = df.selectExpr(
        "user_id AS ub", "event_id AS fb", "unix_millis(ts) AS mb",
        "lat AS lb", "lon AS lob",
    )
    brute = (
        a.crossJoin(b)
        .filter("ua < ub AND abs(ma - mb) <= 1800000")
        .filter(
            haversine_km(
                F.col("la"), F.col("loa"), F.col("lb"), F.col("lob")
            )
            <= 20.0
        )
        .groupBy("ua", "ub")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.least("ma", "mb")).alias("fm"),
        )
    )
    want = {(r.ua, r.ub): (r.n, r.fm) for r in brute.collect()}
    assert got == want and len(want) > 5

def test_radius_join_rejects_out_of_bound_latitude(spark):
    """A latitude beyond max_abs_lat breaks the one-cell-step guarantee,
    so the blocked join must fail loudly instead of returning a silent
    subset (regression); NULL latitudes are excluded, not errors."""
    import pytest
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        geo,
    )

    pts = spark.createDataFrame(
        [(1, 72.0, 10.0)], "point_id long, lat double, lon double"
    )
    qs = spark.createDataFrame(
        [(1, 71.99, 10.0)], "query_id long, lat double, lon double"
    )
    with pytest.raises(Exception, match="max_abs_lat"):
        geo.geo_radius_join(pts, qs, 1.0).collect()
    # raising the bound admits the same data and finds the pair
    ok = geo.geo_radius_join(pts, qs, 2.0, max_abs_lat=75.0).collect()
    assert len(ok) == 1

    null_pts = spark.createDataFrame(
        [(1, None, 10.0), (2, 45.0, 10.0)],
        "point_id long, lat double, lon double",
    )
    q2 = spark.createDataFrame(
        [(7, 45.0, 10.0)], "query_id long, lat double, lon double"
    )
    got = geo.geo_radius_join(null_pts, q2, 1.0).collect()
    assert [r.point_id for r in got] == [2]  # NULL row silently excluded
