"""Keyed MERGE (upsert / delete) on plain parquet.

The general form of the pattern the manifest ledger and the incremental
rollup already use: fold a source batch into a partitioned target by key,
rewriting ONLY the partitions the batch touches.

    merge_into(spark, source, path, keys=["id"], partition_col="day")

Semantics per key: source row replaces the matching target row (last-writer-
wins upsert); unmatched source rows insert; target rows in untouched
partitions are never read or written. With ``delete_col`` set, source rows
with that flag true remove the key instead.

Scale shape: one distinct over the source's partition values (tiny), a
partition-pruned read of only those target partitions, an anti-join sized
by the batch, and a dynamic partition overwrite of the touched partitions.
Cost per merge scales with the batch's partition span, not table history —
on Delta/Iceberg this whole module is ``MERGE INTO``; this is the
plain-parquet equivalent with the same staged-write safety as the rollup
(the overwrite job never reads the files it deletes).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_into(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    keys: list[str],
    partition_col: str,
    delete_col: str | None = None,
) -> None:
    """Upsert ``source`` into the parquet table at ``target_path``.

    Requirements: ``partition_col`` is one of the target's Hive partition
    columns and is present in ``source``; a key's partition value must be
    stable (a key that moves partitions would leave its old row behind —
    the same contract Hive-style MERGE implementations carry).
    """
    if delete_col is not None:
        # NULL flag = plain upsert (the common case of an unset flag
        # column): without the coalesce, ~NULL is NULL and the row would
        # satisfy NEITHER branch — silently dropped from the merge
        flag = F.coalesce(F.col(delete_col), F.lit(False))
        deletes = source.filter(flag).select(*keys, partition_col)
        source = source.filter(~flag).drop(delete_col)

    # a source with the same key twice is ambiguous (which row wins?) —
    # reject it like Hive/Delta MERGE do rather than silently keeping both
    dup = (
        source.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError("merge_into: source contains duplicate keys")

    if not os.path.exists(target_path):
        if delete_col is not None:
            pass  # deletes against an empty table are no-ops
        source.write.mode("overwrite").partitionBy(partition_col).parquet(
            target_path
        )
        return

    touched = [
        r[0]
        for r in (
            source.select(partition_col)
            .union(
                deletes.select(partition_col)
                if delete_col is not None
                else source.select(partition_col).limit(0)
            )
            .distinct()
            .collect()
        )
    ]
    # null-safe partition membership: isin() never matches NULL, so a
    # batch touching the NULL partition (__HIVE_DEFAULT_PARTITION__)
    # would read no survivors from it yet still dynamically overwrite
    # it — permanently deleting every pre-existing NULL-partition row
    non_null = [t for t in touched if t is not None]
    part_pred = (
        F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    )
    if any(t is None for t in touched):
        part_pred = part_pred | F.col(partition_col).isNull()
    old = spark.read.parquet(target_path).filter(part_pred)

    # keep old rows whose key is absent from the batch (and not deleted);
    # the anti-joins compare null-safely so a NULL-key source row REPLACES
    # a NULL-key target row (matching the groupBy dup-check, which also
    # treats NULL keys as equal) instead of duplicating it every merge
    import functools

    def _anti(left: DataFrame, right_keys: DataFrame) -> DataFrame:
        cond = functools.reduce(
            lambda a, b: a & b,
            [left[k].eqNullSafe(right_keys[k]) for k in keys],
        )
        return left.join(right_keys, cond, "left_anti")

    survivors = _anti(old, source.select(*keys))
    if delete_col is not None:
        survivors = _anti(survivors, deletes.select(*keys))
    merged = survivors.unionByName(source)

    staging = target_path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    (
        staged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
    # dynamic overwrite only replaces partitions PRESENT in the written
    # data: a touched partition whose every row was deleted emits nothing
    # and would silently keep its old files — remove those explicitly
    remaining = {r[0] for r in staged.select(partition_col).distinct().collect()}
    for val in touched:
        if val not in remaining:
            # NULL partitions live under Hive's default-partition dir name
            leaf = (
                "__HIVE_DEFAULT_PARTITION__" if val is None else str(val)
            )
            shutil.rmtree(
                os.path.join(target_path, f"{partition_col}={leaf}"),
                ignore_errors=True,
            )
    shutil.rmtree(staging, ignore_errors=True)
