"""Keyed parquet MERGE: upsert, insert, delete, untouched-partition safety."""

from __future__ import annotations

import pyspark.sql.functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    merge,
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, day string")


def test_merge_upsert_insert_untouched(spark, tmp_path):
    path = str(tmp_path / "t")
    base = _rows(spark, [
        (1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"), (4, "d", "d3"),
    ])
    merge.merge_into(spark, base, path, keys=["id"], partition_col="day")

    # capture d3's physical files: the merge below must not rewrite them
    import glob
    d3_before = sorted(glob.glob(f"{path}/day=d3/*.parquet"))

    batch = _rows(spark, [
        (2, "B", "d1"),   # update
        (5, "e", "d2"),   # insert into existing partition
        (6, "f", "d4"),   # insert into new partition
    ])
    merge.merge_into(spark, batch, path, keys=["id"], partition_col="day")

    got = {r.id: (r.val, r.day) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a", "d1"), 2: ("B", "d1"), 3: ("c", "d2"),
        4: ("d", "d3"), 5: ("e", "d2"), 6: ("f", "d4"),
    }
    assert sorted(glob.glob(f"{path}/day=d3/*.parquet")) == d3_before


def test_merge_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    base = _rows(spark, [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")])
    merge.merge_into(spark, base, path, keys=["id"], partition_col="day")

    batch = spark.createDataFrame(
        [(1, "ignored", "d1", True), (4, "new", "d1", False)],
        "id long, val string, day string, op_delete boolean",
    )
    merge.merge_into(
        spark, batch, path, keys=["id"], partition_col="day",
        delete_col="op_delete",
    )
    got = {r.id: r.val for r in spark.read.parquet(path).collect()}
    assert got == {2: "b", 3: "c", 4: "new"}


def test_merge_idempotent_replay(spark, tmp_path):
    """Replaying the same batch yields the same table (manifest contract)."""
    path = str(tmp_path / "t")
    batch = _rows(spark, [(1, "a", "d1"), (2, "b", "d2")])
    merge.merge_into(spark, batch, path, keys=["id"], partition_col="day")
    merge.merge_into(spark, batch, path, keys=["id"], partition_col="day")
    got = sorted((r.id, r.val) for r in spark.read.parquet(path).collect())
    assert got == [(1, "a"), (2, "b")]


def test_merge_null_flag_partition_and_keys(spark, tmp_path):
    """NULL delete flags are plain upserts (not silently dropped), the
    NULL partition's survivors are preserved, and NULL-key rows REPLACE
    null-safely instead of duplicating every merge (regression)."""
    path = str(tmp_path / "t")
    base = _rows(spark, [(1, "a", "d1"), (2, "b", None), (None, "x", None)])
    merge.merge_into(spark, base, path, keys=["id"], partition_col="day")

    batch = spark.createDataFrame(
        [(3, "c", None, None), (None, "X", None, None), (1, None, "d1", True)],
        "id long, val string, day string, del boolean",
    ).select("id", "val", "day", F.col("del"))
    merge.merge_into(
        spark, batch, path, keys=["id"], partition_col="day", delete_col="del"
    )

    got = {r.id: (r.val, r.day) for r in spark.read.parquet(path).collect()}
    # 1 deleted; 2 (NULL partition survivor) kept; 3 inserted despite
    # NULL flag; NULL key replaced once, not duplicated
    assert got == {2: ("b", None), 3: ("c", None), None: ("X", None)}
