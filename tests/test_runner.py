"""E1 integration: discover → decode → infer → aggregate → sinks → manifest."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark import (
    runner,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources import (
    fixtures,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (
    pipeline as sp,
)


def test_end_to_end_pipeline(spark, tmp_path):
    bags = str(tmp_path / "bags")
    out = str(tmp_path / "out")
    manifest = str(tmp_path / "manifest")
    sync = str(tmp_path / "sync")
    fixtures.write_bag_dir(bags, n_bags=2, tar_gz=(1,))
    cfg = runner.PipelineConfig(
        bags_dir=bags, output_dir=out, manifest_dir=manifest, sync_dir=sync
    )

    processed = runner.run_once(spark, cfg)
    assert len(processed) == 2

    # A3 observe() counters piggyback on the landing write
    metrics = cfg.extra["last_metrics"]
    assert metrics["n_topics"] == 8 and metrics["n_messages"] > 0

    # manifest: both bags complete (O2 success path)
    statuses = {r.key: r.status for r in sp.current_manifest(spark, manifest).collect()}
    assert sorted(statuses.values()) == ["complete", "complete"]

    # topic landing: partitioned by topic, counts match the fixture table
    msgs = spark.read.parquet(f"{out}/topic_messages")
    want = fixtures.topic_messages(spark, n_bags=2).count()
    assert msgs.count() == want

    # frame stats: one row per labeled frame, counter columns present
    stats = spark.read.parquet(f"{out}/frame_stats")
    frames_total = fixtures.frames(spark, n_bags=2, frames_per_camera=12).count()
    labels_tbl = spark.read.json(f"{out}/labels")
    labeled = labels_tbl.filter(F.size("labels") > 0).count()
    assert labels_tbl.count() == frames_total
    assert stats.count() == labeled > 0
    assert {"Ped_Count", "Bike_Count", "Motorbike_Count"} <= set(stats.columns)

    # annotated binary sink: real PNGs at the source frame dimensions
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
        png,
    )

    ann = spark.read.parquet(f"{out}/annotated")
    assert ann.count() == frames_total
    row = ann.first()
    assert png.decode(bytes(row.annotated)).shape == (
        fixtures.FRAME_H,
        fixtures.FRAME_W,
        3,
    )

    # K2 file-tree export: one .png per frame, under the bag's prefix dir
    png_files = [
        os.path.join(d, f)
        for d in os.listdir(sync)
        for f in os.listdir(os.path.join(sync, d))
        if f.endswith(".png")
    ]
    assert len(png_files) == frames_total  # no cross-bag collisions

    # idempotency (O1 no_work): second tick processes nothing, tables stable
    assert runner.run_once(spark, cfg) == {}
    assert spark.read.parquet(f"{out}/topic_messages").count() == want


def test_pipeline_failure_isolation(spark, tmp_path):
    """A corrupt bag marks failure; good bags still complete (O2)."""
    bags = str(tmp_path / "bags")
    out = str(tmp_path / "out")
    manifest = str(tmp_path / "manifest")
    fixtures.write_bag_dir(bags, n_bags=1, tar_gz=())
    with open(os.path.join(bags, "corrupt.bag"), "wb") as f:
        f.write(b"not a bag at all")
    cfg = runner.PipelineConfig(bags_dir=bags, output_dir=out, manifest_dir=manifest)
    processed = runner.run_once(spark, cfg)
    assert len(processed) == 2
    # programmatic per-key signal, no manifest scan needed
    assert {k.split("/")[-1]: v for k, v in processed.items()} == {
        "corrupt.bag": "failure",
        "bag0000.bag": "complete",
    }
    statuses = {
        r.key.split("/")[-1]: r.status
        for r in sp.current_manifest(spark, manifest).collect()
    }
    assert statuses["corrupt.bag"] == "failure"
    assert [v for k, v in statuses.items() if k != "corrupt.bag"] == ["complete"]
    # the good bag's data landed
    msgs = spark.read.parquet(f"{out}/topic_messages")
    assert msgs.select(F.col("bag_id")).distinct().count() == 1


def test_failure_isolation_is_one_job_per_tick(spark, tmp_path):
    """Quarantine pattern: the number of Spark jobs per tick is constant —
    it does NOT grow with the number of bags (no driver-side per-bag loop
    launching one filtered job per key)."""
    sc = spark.sparkContext

    def tick_jobs(group: str, n_bags: int, with_corrupt: bool) -> int:
        base = tmp_path / group
        bags = str(base / "bags")
        fixtures.write_bag_dir(bags, n_bags=n_bags, tar_gz=())
        if with_corrupt:
            with open(os.path.join(bags, "corrupt.bag"), "wb") as f:
                f.write(b"junk")
        cfg = runner.PipelineConfig(
            bags_dir=bags,
            output_dir=str(base / "out"),
            manifest_dir=str(base / "manifest"),
        )
        sc.setJobGroup(group, group)
        try:
            runner.run_once(spark, cfg)
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    small = tick_jobs("tick-small", 1, True)
    big = tick_jobs("tick-big", 4, True)
    assert small > 0
    assert big == small  # 4 bags: same job count as 1 (both with a corrupt bag)


def test_replay_is_idempotent_no_duplicate_rows(spark, tmp_path):
    """clear_status + re-run rewrites the bag's own partitions instead of
    appending duplicates — a bag whose telemetry landed but whose frames
    stage failed would otherwise double its topic_messages on replay
    (regression)."""
    bags = str(tmp_path / "bags")
    out = str(tmp_path / "out")
    manifest = str(tmp_path / "manifest")
    fixtures.write_bag_dir(bags, n_bags=2, tar_gz=())
    cfg = runner.PipelineConfig(
        bags_dir=bags, output_dir=out, manifest_dir=manifest
    )
    assert len(runner.run_once(spark, cfg)) == 2

    def counts():
        msgs = spark.read.parquet(f"{out}/topic_messages")
        stats = spark.read.parquet(f"{out}/frame_stats")
        return (
            msgs.count(),
            msgs.select("bag_id").distinct().count(),
            stats.count(),
        )

    before = counts()
    # replay ONE bag through the reference's clear-tag path
    key = sorted(
        r.key for r in sp.current_manifest(spark, manifest).collect()
    )[0]
    sp.clear_status(spark, manifest, [key])
    assert runner.run_once(spark, cfg) == {key: "complete"}
    assert counts() == before  # rewrote its partitions; zero duplicates
