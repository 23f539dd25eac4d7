"""Slowly-changing-dimension (SCD2) interval construction from an event log.

The warehouse counterpart of the reference's per-run manifest history
(`aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline`
tracks each drive's latest state via S3 tag upserts — see
operators/discovery.py for that ledger): here the FULL history is kept as
validity intervals, so "what was the attribute at time T" is an interval
lookup instead of a log replay.

Semantics: per key, consecutive events with the SAME attribute value
collapse into one run; each run becomes a row with

- ``valid_from``  — first event ts of the run,
- ``valid_to``    — first ts of the NEXT run (NULL for the current run),
- ``version``     — 1-based run ordinal per key,
- ``is_current``  — whether this is the key's latest run.

Plan shape: one shuffle on the key; run detection is a lag window, the run
id a conditional cumsum over the same window — the standard gaps-and-islands
form, all whole-stage-codegen'd. The second aggregation (run → interval)
groups by (key, run_id), partial-aggregating map-side; ``valid_to`` comes
from a lead window over the run-level table, which is |runs| rows — already
far smaller than the input. No step touches more than one shuffle width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_intervals(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """SCD2 validity intervals of ``attr_col`` per ``key_col``.

    ``tie_col`` breaks same-timestamp ordering deterministically (pass the
    event's unique id; required for a stable result when timestamps can
    collide).
    """
    order = [ts_col, tie_col] if tie_col else [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order)
    # null-safe change detection: with a bare !=, a value→NULL transition
    # yields NULL (not counted — the NULL period vanishes from history)
    # and NULL→NULL starts a spurious new run. The first event of a key
    # is detected by lag over a constant (NULL only on row 1), NOT by
    # lag(attr).isNull() — which can't tell "no previous row" from
    # "previous attr was NULL".
    changed = (
        F.lag(F.lit(1)).over(w).isNull()
        | ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w))
    ).cast("int")
    runs = events.withColumn(
        "__run",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = runs.groupBy(key_col, "__run").agg(
        F.first(attr_col).alias(attr_col),  # constant within the run
        F.min(ts_col).alias("valid_from"),
    )
    wi = Window.partitionBy(key_col).orderBy("__run")
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(wi))
        .withColumn("version", F.col("__run").cast("int"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )
