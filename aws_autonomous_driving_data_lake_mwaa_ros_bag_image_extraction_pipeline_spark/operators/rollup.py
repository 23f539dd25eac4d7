"""Incremental time-bucket rollup (hypertable-style continuous aggregate).

A rollup table holds per-(window, group) algebraic aggregates (count + sum —
anything re-mergeable). ``update_rollup`` folds a new batch of events in
WITHOUT recomputing history:

1. partial-aggregate the batch into its windows (map-side combine; the
   shuffle carries one row per touched (window, group));
2. read back ONLY the rollup partitions those windows live in (day-level
   Hive partitions → partition pruning does this);
3. merge old + new partials (sum the sums) and rewrite just the affected
   partitions (``partitionOverwriteMode=dynamic``).

Cost per tick scales with the batch's time span, not the table's history —
the same contract as a TimescaleDB continuous aggregate / materialized
rollup, expressed on plain parquet. On Delta/Iceberg, step 3 becomes a
keyed MERGE and step 2 its index lookup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partials(
    batch: DataFrame, ts_col: str, group_col: str, window: str
) -> DataFrame:
    return (
        batch.groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            group_col,
            "n_events",
            F.to_date(F.col("w.start")).alias("day"),
        )
    )


def update_rollup(
    spark: SparkSession,
    batch: DataFrame,
    rollup_path: str,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "1 hour",
) -> None:
    """Fold one batch into the rollup table (see module docstring).

    The merged slice is staged to a sibling dir first, then the dynamic
    partition overwrite reads FROM the staged copy — the job that deletes
    old partition files never also reads them, so the self-read-overwrite
    race (fatal on object-store committers, where overwrite deletion can
    outrun the lazy read) cannot lose prior partials.
    """
    import shutil

    new = _partials(batch, ts_col, group_col, window)
    days = [r.day for r in new.select("day").distinct().collect()]
    staging = None
    if os.path.exists(rollup_path):
        old = spark.read.parquet(rollup_path).filter(F.col("day").isin(days))
        merged = (
            new.unionByName(old)
            .groupBy("window_start", group_col, "day")
            .agg(F.sum("n_events").alias("n_events"))
            .select("window_start", group_col, "n_events", "day")
        )
        staging = rollup_path.rstrip("/") + "__staging"
        merged.write.mode("overwrite").parquet(staging)
        merged = spark.read.parquet(staging)
    else:
        merged = new
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(rollup_path)
    )
    if staging is not None:
        shutil.rmtree(staging, ignore_errors=True)


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return spark.read.parquet(rollup_path)
