"""P12/P13 mapInPandas plumbing: batch inference + annotate round-trip.

Pixel-level decode is a documented deterministic fake (no image libs in the
container); these tests pin the Spark-side contract — schemas, batching,
binary-column round-trip — which is the part that must survive at scale.
"""

from __future__ import annotations

import hashlib

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    annotate,
    frame_stats,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources import (
    fixtures,
)


def test_infer_labels_schema_and_determinism(spark):
    frames_df = fixtures.frames(spark, n_bags=1, frames_per_camera=6)
    labels = annotate.infer_labels(frames_df)
    rows = labels.collect()
    assert len(rows) == frames_df.count()
    # deterministic: same input → same labels
    again = {(r.bag_id, r.camera, r.frame_index): r.labels for r in labels.collect()}
    for r in rows:
        assert again[(r.bag_id, r.camera, r.frame_index)] == r.labels
    # downstream aggregation consumes the inferred schema directly
    stats = frame_stats.instance_counts(labels)
    assert {"Ped_Count", "Bike_Count", "Motorbike_Count"} <= set(stats.columns)


def test_grouped_inference_matches_mapinpandas(spark):
    """applyInPandas per-camera grouping == mapInPandas for a
    camera-agnostic model (same deterministic fake)."""
    frames_df = fixtures.frames(spark, n_bags=1, frames_per_camera=5)
    a = {
        (r.bag_id, r.camera, r.frame_index): r.labels
        for r in annotate.infer_labels(frames_df).collect()
    }
    b = {
        (r.bag_id, r.camera, r.frame_index): r.labels
        for r in annotate.infer_labels_by_camera(frames_df).collect()
    }
    assert a == b


def test_annotate_frames_digest_roundtrip(spark):
    frames_df = fixtures.frames(spark, n_bags=1, frames_per_camera=4)
    labels_df = fixtures.labels(spark, frames_df)
    joined = frames_df.join(labels_df, ["bag_id", "camera", "frame_index"])
    out = {
        (r.bag_id, r.camera, r.frame_index): r.annotated
        for r in annotate.annotate_frames(joined).collect()
    }
    src = {
        (r.bag_id, r.camera, r.frame_index): (r.content, r.labels)
        for r in joined.collect()
    }
    assert set(out) == set(src)
    for key, (content, labels) in src.items():
        n_boxes = sum(len(lab.Instances or []) for lab in labels)
        want = content + hashlib.md5(bytes([n_boxes % 256]) + content).digest()
        assert out[key] == want, key
