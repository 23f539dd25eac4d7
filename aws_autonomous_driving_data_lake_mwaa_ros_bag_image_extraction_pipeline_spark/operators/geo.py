"""Geospatial operators for GPS-bearing topic streams.

An AV data lake's bags carry GPS/odometry topics (SURVEY §1.2's typed topic
tables); the queries a fleet team runs over them are spatial: "every frame
within 50 m of this intersection", "pairs of drives that passed the same
spot". The naive form is an all-pairs haversine filter — O(n·q) trig.

Scale shape — the same bucket-block-verify pattern as the dedup family:
points key into fixed-degree grid CELLS (pure arithmetic, no trig, no
geo library); each query probes its own cell plus the 8 neighbors at a
resolution chosen so the radius cannot span more than one cell step;
candidates come from an equi-join on the cell id and only THEY pay the
haversine. Everything is whole-stage codegen and DuckDB-replayable.

Longitude degrees shrink with latitude (cos(lat)), so the lossless cell
resolution must come from the WORST latitude the data can reach —
``max_abs_lat`` (default 60°, cos = 0.5). Polar data (|lat| beyond the
bound) would need a coarser grid.

The blocking keys wrap the antimeridian: longitude columns divide the
circle into ``floor(360/cell_deg)`` EQUAL columns (each >= cell_deg wide —
a ceil split would leave a narrower final column that two within-radius
points could straddle two column-steps apart, a silent subset), the column
index is taken mod that count (lon +180 == lon -180), and the probe ring
wraps per-axis instead of adding a scalar offset to the combined id (the
scalar form mis-keyed cx=0's west neighbor into the ADJACENT LATITUDE
BAND's easternmost cell). Pairs straddling lon ±180 now block correctly;
the brute-force oracle (haversine is periodic in Δlon, so it was always
wrap-correct) proves losslessness on a straddling fixture.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG_LAT = 111.19492664455873  # pi * R / 180


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (double trig — identical formula in the
    DuckDB oracle; both engines' libm agree far beyond the rounded
    output precision)."""
    rl1 = F.radians(lat1)
    rl2 = F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    return 2 * F.lit(EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Integer grid-cell id for a ``cell_deg``-degree lat/lon grid — one
    BIGINT join key (row-major over the 360/cell_deg-wide grid). Pure
    floor arithmetic: bit-identical across engines, no trig.

    This is the plain SNAP function (od_matrix buckets fixes with it and
    its oracle replays the exact formula); the radius/colocation joins key
    on the wrap-aware ``_cell_yx`` grid instead, whose lon columns are
    equal-width and taken mod the column count."""
    rows_per_band = int(math.ceil(360.0 / cell_deg))
    cy = F.floor((lat + F.lit(90.0)) / F.lit(cell_deg))
    cx = F.floor((lon + F.lit(180.0)) / F.lit(cell_deg))
    return (cy * F.lit(rows_per_band) + cx).cast("bigint")


def lon_cells(cell_deg: float) -> int:
    """Number of longitude columns for the wrap-correct blocking grid: the
    circle splits into ``floor(360/cell_deg)`` EQUAL columns, each
    ``360/n >= cell_deg`` wide, so the one-column-step guarantee holds on
    every column INCLUDING across ±180 (ceil would leave a narrower final
    column — see module docstring). >= 1 so a radius wider than the planet
    degenerates to a single all-candidates column instead of dividing by
    zero."""
    return max(1, int(math.floor(360.0 / cell_deg)))


def _cell_yx(
    lat: Column, lon: Column, cell_deg: float, n_lon: int
) -> tuple[Column, Column]:
    """(latitude band, wrapped longitude column) for the blocking grid.
    ``pmod`` folds lon = +180 (and any out-of-range input) onto the same
    column as -180 — the two names for one meridian must share a key."""
    cy = F.floor((lat + F.lit(90.0)) / F.lit(cell_deg))
    cx = F.pmod(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0 / n_lon)), F.lit(n_lon)
    )
    return cy, cx


def _ring_cells(cy: Column, cx: Column, n_lon: int) -> Column:
    """The 9-cell probe ring as an array of combined BIGINT cell ids, with
    the longitude step wrapped mod ``n_lon`` (never a scalar offset on the
    combined id). ``array_distinct`` because at n_lon <= 2 the wrapped
    east/west neighbors coincide and a duplicate key would duplicate
    candidate pairs."""
    return F.array_distinct(
        F.array(
            *[
                (
                    (cy + F.lit(dy)) * F.lit(n_lon)
                    + F.pmod(cx + F.lit(dx), F.lit(n_lon))
                ).cast("bigint")
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    )


def checked_lat(lat: Column, max_abs_lat: float) -> Column:
    """``lat``, with an IN-PLAN guard: a row whose |lat| exceeds the
    ``max_abs_lat`` the cell size was derived from fails the job loudly
    instead of silently vanishing from the candidate ring (beyond the
    bound the one-cell-step longitude guarantee breaks, so the blocked
    join would return a silent SUBSET — the worst failure mode). A plain
    codegen comparison per row, no extra scan. NULL latitudes pass
    through: their cell key is NULL and the equi-join excludes them, the
    same complete-cases convention as the rest of the engine."""
    return F.when(
        (F.abs(lat) <= F.lit(max_abs_lat)) | lat.isNull(),
        lat,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"latitude outside +/-{max_abs_lat} deg: the grid cell "
                    "size is only radius-covering up to max_abs_lat; rerun "
                    "with a larger max_abs_lat (coarser grid): lat="
                ),
                lat.cast("string"),
            )
        )
    )


def radius_cell_deg(radius_km: float, max_abs_lat: float = 60.0) -> float:
    """Smallest safe cell size (degrees) such that any two points within
    ``radius_km`` are in the same or an adjacent cell, for data with
    |lat| <= max_abs_lat."""
    deg_lat = radius_km / KM_PER_DEG_LAT
    deg_lon = radius_km / (
        KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat))
    )
    return max(deg_lat, deg_lon)


def geo_radius_join(
    points: DataFrame,
    queries: DataFrame,
    radius_km: float,
    point_id: str = "point_id",
    query_id: str = "query_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """All (query, point) pairs within ``radius_km`` →
    ``(query_id, point_id, dist_km)`` — cell-blocked, never all-pairs.

    Points emit ONE row each (their cell); queries emit 9 (their cell and
    its ring), so the candidate equi-join fans out on the SMALL side. The
    ring guarantee needs the cell to be at least the radius in both axes
    at the worst latitude — see ``radius_cell_deg``.
    """
    cell_deg = radius_cell_deg(radius_km, max_abs_lat)
    n_lon = lon_cells(cell_deg)
    pcy, pcx = _cell_yx(
        checked_lat(F.col(lat_col), max_abs_lat), F.col(lon_col), cell_deg,
        n_lon,
    )
    p = points.select(
        F.col(point_id).alias("__pid"),
        F.col(lat_col).alias("__plat"),
        F.col(lon_col).alias("__plon"),
        (pcy * F.lit(n_lon) + pcx).cast("bigint").alias("__cell"),
    )
    qcy, qcx = _cell_yx(
        checked_lat(F.col(lat_col), max_abs_lat), F.col(lon_col), cell_deg,
        n_lon,
    )
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(lat_col).alias("__qlat"),
        F.col(lon_col).alias("__qlon"),
        F.explode(_ring_cells(qcy, qcx, n_lon)).alias("__cell"),
    )
    dist = haversine_km(
        F.col("__qlat"), F.col("__qlon"), F.col("__plat"), F.col("__plon")
    )
    return (
        p.join(q, "__cell")
        .select(
            F.col("__qid").alias(query_id),
            F.col("__pid").alias(point_id),
            dist.alias("dist_km"),
        )
        .filter(F.col("dist_km") <= F.lit(radius_km))
    )


def colocation_pairs(
    fixes: DataFrame,
    radius_km: float,
    max_dt_s: int,
    track_col: str = "user_id",
    fix_id: str = "event_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """Spatiotemporal co-location: pairs of TRACKS that were within
    ``radius_km`` of each other within ``max_dt_s`` seconds →
    ``(track_a, track_b, n_encounters, first_ms)`` with ``track_a <
    track_b`` — the "which drives passed the same spot at the same time"
    query (encounter mining over fleet GPS).

    Blocking extends the radius join into TIME: one side keys each fix by
    (cell, time-bucket); the other probes its 9-cell ring x 3 adjacent
    buckets (27 keys per fix, constant fan-out), with cell size from the
    worst latitude and bucket width = ``max_dt_s`` — so any qualifying
    fix-pair shares a key. Candidates equi-join, haversine + |dt| verify,
    fix-pair dedup (a pair can collide under several keys), then one
    aggregation per track pair. The cell ring wraps the antimeridian the
    same way as ``geo_radius_join`` (per-axis mod, equal lon columns).
    """
    cell_deg = radius_cell_deg(radius_km, max_abs_lat)
    n_lon = lon_cells(cell_deg)
    ms = F.unix_millis(F.col(ts_col))
    bcy, bcx = _cell_yx(
        checked_lat(F.col(lat_col), max_abs_lat), F.col(lon_col), cell_deg,
        n_lon,
    )
    base = fixes.select(
        F.col(track_col).alias("__trk"),
        F.col(fix_id).alias("__fid"),
        ms.alias("__ms"),
        F.col(lat_col).alias("__lat"),
        F.col(lon_col).alias("__lon"),
        bcy.alias("__cy"),
        bcx.alias("__cx"),
        F.floor(ms / F.lit(max_dt_s * 1000)).alias("__b0"),
    )
    idx = base.select(
        F.col("__trk").alias("trk_a"),
        F.col("__fid").alias("fid_a"),
        F.col("__ms").alias("ms_a"),
        F.col("__lat").alias("lat_a"),
        F.col("__lon").alias("lon_a"),
        (F.col("__cy") * F.lit(n_lon) + F.col("__cx"))
        .cast("bigint")
        .alias("__cell"),
        F.col("__b0").alias("__bkt"),
    )
    probe = base.select(
        F.col("__trk").alias("trk_b"),
        F.col("__fid").alias("fid_b"),
        F.col("__ms").alias("ms_b"),
        F.col("__lat").alias("lat_b"),
        F.col("__lon").alias("lon_b"),
        F.explode(
            _ring_cells(F.col("__cy"), F.col("__cx"), n_lon)
        ).alias("__cell"),
        "__b0",
    ).select(
        "trk_b", "fid_b", "ms_b", "lat_b", "lon_b", "__cell",
        F.explode(
            F.array(
                F.col("__b0") - 1, F.col("__b0"), F.col("__b0") + 1
            )
        ).alias("__bkt"),
    )
    cands = (
        idx.join(probe, ["__cell", "__bkt"])
        .filter(F.col("trk_a") < F.col("trk_b"))
        .filter(
            F.abs(F.col("ms_a") - F.col("ms_b")) <= F.lit(max_dt_s * 1000)
        )
        .filter(
            haversine_km(
                F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
            )
            <= F.lit(radius_km)
        )
        .select("trk_a", "trk_b", "fid_a", "fid_b", "ms_a", "ms_b")
        .dropDuplicates(["trk_a", "trk_b", "fid_a", "fid_b"])
    )
    return cands.groupBy(
        F.col("trk_a").alias(f"{track_col}_a"),
        F.col("trk_b").alias(f"{track_col}_b"),
    ).agg(
        F.count(F.lit(1)).alias("n_encounters"),
        F.min(F.least("ms_a", "ms_b")).alias("first_ms"),
    )
