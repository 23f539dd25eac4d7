"""Time-series resample + forward-fill (gap fill) — sensor-grid primitive.

The reference derives a fixed-rate frame clock from an irregular source
(processing.py:192,218-221: frame_index × 67 ms) and its sensors drop
messages (check_pngs.py's gap audit exists because replay is lossy). The
general operator behind both is *resample*: project each key's irregular
event stream onto a fixed-step grid, carrying the last observation forward.

Plan shape (the 100 TB-honest formulation):

1. per-key bounds: one partial-aggregated ``groupBy(key)`` — tiny output;
2. grid: ``sequence(floor(min), max, step)`` + ``explode`` — generated
   executor-side from the bounds rows, never shuffled at event scale;
3. fill: union(grid, events) + ``last(ignorenulls)`` over a
   (key)-partitioned window — ONE sort-shuffle on the key, the same shape
   as asof.asof_join (a per-grid-point range probe would be O(grid×events)).

Ties: events sharing (key, ts) are ordered by a caller-named tiebreak
column so the filled value is deterministic; grid rows sort after events
at the same instant ("at or before" semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def align_series(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    series_col: str,
    value_col: str,
    step_seconds: int,
    series: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Multi-series alignment: project N interleaved series (sensor topics)
    onto ONE per-key grid, each output column carrying its series' last
    observation at or before the grid point.

    This is the reference's implicit sensor-fusion need made explicit: per
    bag, `/gps` and `/imu` and `/pose_*` messages arrive on their own
    clocks (SURVEY §1.2); analysis wants one wide row per (bag, tick). The
    plan is resample_ffill's union+window with one ``last(when(series=s))``
    per series over the SAME window — still exactly one sort-shuffle on the
    key, regardless of how many series are aligned (N separate resamples +
    an N-way join would shuffle N+1 times).

    Returns (key_col, grid_ts, <one column per series>). The grid spans
    floor(min(ts)) .. max(ts) over ALL the key's series combined.
    Events with a NULL timestamp are excluded — they have no position on
    the time axis, and under the window's NULLS-FIRST ordering they
    would forward-fill into the leading grid points the contract says
    are NULL.
    """
    df = df.filter(F.col(ts_col).isNotNull())
    step = int(step_seconds)
    bounds = df.groupBy(key_col).agg(
        F.timestamp_seconds(
            F.floor(F.unix_seconds(F.min(ts_col)) / step) * step
        ).alias("__g0"),
        F.max(ts_col).alias("__g1"),
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence("__g0", "__g1", F.expr(f"INTERVAL {step} SECONDS"))
        ).alias("__t"),
    )
    vtype = df.schema[value_col].dataType
    tie = (
        F.col(tie_col).cast("long")
        if tie_col is not None
        else F.lit(None).cast("long")
    )
    g_tag = grid.select(
        key_col,
        "__t",
        F.lit(1).alias("__is_grid"),
        F.lit(None).cast("string").alias("__s"),
        F.lit(None).cast(vtype).alias("__v"),
        F.lit(None).cast("long").alias("__tie"),
    )
    e_tag = df.select(
        F.col(key_col),
        F.col(ts_col).alias("__t"),
        F.lit(0).alias("__is_grid"),
        F.col(series_col).alias("__s"),
        F.col(value_col).alias("__v"),
        tie.alias("__tie"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            F.col("__t"),
            F.col("__is_grid"),
            F.col("__tie").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [
        F.last(
            F.when(F.col("__s") == s, F.col("__v")), ignorenulls=True
        )
        .over(w)
        .alias(s)
        for s in series
    ]
    return (
        g_tag.unionByName(e_tag)
        .select(key_col, "__t", "__is_grid", *filled)
        .filter(F.col("__is_grid") == 1)
        .select(F.col(key_col), F.col("__t").alias("grid_ts"), *[F.col(s) for s in series])
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tie_col: str | None = None,
) -> DataFrame:
    """Per key: a ``step_seconds``-spaced timestamp grid from
    ``floor(min(ts))`` (grid-aligned) to ``max(ts)``, each point carrying
    the value of the latest event at or before it (NULL before the first
    event — the floor-aligned leading point may precede all observations,
    as in pandas ``asfreq().ffill()``).

    Returns (key_col, grid_ts, value_col). NULL-timestamp events are
    excluded (no position on the time axis; NULLS-FIRST ordering would
    otherwise fill them into the leading grid points).
    """
    df = df.filter(F.col(ts_col).isNotNull())
    step = int(step_seconds)
    bounds = df.groupBy(key_col).agg(
        F.timestamp_seconds(
            F.floor(F.unix_seconds(F.min(ts_col)) / step) * step
        ).alias("__g0"),
        F.max(ts_col).alias("__g1"),
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence("__g0", "__g1", F.expr(f"INTERVAL {step} SECONDS"))
        ).alias("__t"),
    )
    vtype = df.schema[value_col].dataType
    tie = (
        F.col(tie_col).cast("long")
        if tie_col is not None
        else F.lit(None).cast("long")
    )
    g_tag = grid.select(
        key_col,
        "__t",
        F.lit(1).alias("__is_grid"),
        F.lit(None).cast(vtype).alias("__v"),
        F.lit(None).cast("long").alias("__tie"),
    )
    e_tag = df.select(
        F.col(key_col),
        F.col(ts_col).alias("__t"),
        F.lit(0).alias("__is_grid"),
        F.col(value_col).alias("__v"),
        tie.alias("__tie"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            F.col("__t"),
            F.col("__is_grid"),
            F.col("__tie").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        g_tag.unionByName(e_tag)
        .withColumn("__f", F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__is_grid") == 1)
        .select(
            F.col(key_col),
            F.col("__t").alias("grid_ts"),
            F.col("__f").alias(value_col),
        )
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tie_col: str | None = None,
) -> DataFrame:
    """Per key: the same grid as ``resample_ffill`` but with LINEAR
    interpolation between the surrounding observations — the standard
    sensor-fusion resampler when a zero-order hold (ffill) is too coarse
    (e.g. pose/velocity channels between frame timestamps).

    Grid points strictly between two observations get
    ``v0 + (v1-v0)·(t-t0)/(t1-t0)``; points at an exact observation time
    get that observation; points before the first or after the last
    observation get NULL (no extrapolation — same leading-NULL contract
    as ffill, symmetric at the tail).

    Same single sort-shuffle as ffill: grid and events union once, and
    BOTH neighbors come from the one sorted pass (last-non-null looking
    back, first-non-null looking forward) — not a join against the
    events per grid point. Returns (key_col, grid_ts, value_col).

    Events with a NULL timestamp OR a NULL value are excluded: the
    neighbor (value, time) pair comes from two independent ignorenulls
    windows, so a NULL-valued event would advance the neighbor TIME
    without its VALUE and silently desynchronize the interpolation
    (e.g. pairing v from t=0 with t of the NULL event). An observation
    with no value contributes nothing to interpolation, including to the
    grid bounds.
    """
    df = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    step = int(step_seconds)
    bounds = df.groupBy(key_col).agg(
        F.timestamp_seconds(
            F.floor(F.unix_seconds(F.min(ts_col)) / step) * step
        ).alias("__g0"),
        F.max(ts_col).alias("__g1"),
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence("__g0", "__g1", F.expr(f"INTERVAL {step} SECONDS"))
        ).alias("__t"),
    )
    vtype = df.schema[value_col].dataType
    tie = (
        F.col(tie_col).cast("long")
        if tie_col is not None
        else F.lit(None).cast("long")
    )
    g_tag = grid.select(
        key_col,
        "__t",
        F.lit(1).alias("__is_grid"),
        F.lit(None).cast(vtype).alias("__v"),
        F.lit(None).cast("long").alias("__tus"),
        F.lit(None).cast("long").alias("__tie"),
    )
    e_tag = df.select(
        F.col(key_col),
        F.col(ts_col).alias("__t"),
        F.lit(0).alias("__is_grid"),
        F.col(value_col).alias("__v"),
        F.unix_micros(F.col(ts_col)).alias("__tus"),
        tie.alias("__tie"),
    )
    order = [F.col("__t"), F.col("__is_grid"), F.col("__tie").asc_nulls_first()]
    wp = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = g_tag.unionByName(e_tag).select(
        key_col,
        "__t",
        "__is_grid",
        F.last("__v", ignorenulls=True).over(wp).alias("__v0"),
        F.last("__tus", ignorenulls=True).over(wp).alias("__t0"),
        F.first("__v", ignorenulls=True).over(wn).alias("__v1"),
        F.first("__tus", ignorenulls=True).over(wn).alias("__t1"),
    )
    t = F.unix_micros(F.col("__t"))
    interp = (
        F.when(F.col("__t0").isNull(), F.lit(None).cast("double"))
        .when(F.col("__t0") == t, F.col("__v0").cast("double"))
        .when(F.col("__t1").isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.col("__v0")
            + (F.col("__v1") - F.col("__v0"))
            * (t - F.col("__t0"))
            / (F.col("__t1") - F.col("__t0"))
        )
    )
    return (
        u.filter(F.col("__is_grid") == 1)
        .select(
            F.col(key_col),
            F.col("__t").alias("grid_ts"),
            interp.alias(value_col),
        )
    )
