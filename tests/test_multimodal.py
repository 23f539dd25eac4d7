"""Multimodal operators: sampling, feature extraction, decode/resize plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    dedup,
    multimodal,
    similarity,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources import (
    fixtures,
)


@pytest.fixture(scope="module")
def frames_df(spark):
    return fixtures.frames(spark, n_bags=1, frames_per_camera=30, drop_pct=0.0)


def test_frame_sample_every_n(spark, frames_df):
    got = multimodal.frame_sample(frames_df, every_n=5)
    idxs = {r.frame_index for r in got.select("frame_index").distinct().collect()}
    assert idxs == {0, 5, 10, 15, 20, 25}


def test_frame_sample_per_interval(spark, frames_df):
    # 67ms/frame → 1s buckets hold ~15 frames; keep the first of each
    got = multimodal.frame_sample(frames_df, per_interval_ms=1000)
    per_cam = got.groupBy("camera").count().collect()
    for r in per_cam:
        assert r["count"] == 2  # 30 frames * 67ms ≈ 2s of footage
    firsts = {r.frame_index for r in got.collect()}
    assert 0 in firsts


def test_extract_features_unit_norm_and_determinism(spark, frames_df):
    emb = multimodal.extract_features(frames_df, dim=8)
    rows = emb.collect()
    assert len(rows) == frames_df.count()
    for r in rows[:5]:
        assert len(r.embedding) == 8
        norm = sum(v * v for v in r.embedding) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-9)
    again = {(r.bag_id, r.camera, r.frame_index): r.embedding for r in emb.collect()}
    for r in rows:
        assert again[(r.bag_id, r.camera, r.frame_index)] == r.embedding


def test_features_feed_similarity_and_dedup(spark, frames_df):
    """The frames → features → ANN/dedup loop composes end-to-end."""
    emb = multimodal.extract_features(frames_df, dim=8).withColumn(
        "vec_id",
        F.xxhash64("bag_id", "camera", "frame_index"),
    )
    pairs = dedup.embedding_dup_pairs(
        emb, dim=8, threshold=0.999, id_col="vec_id", vec_col="embedding"
    )
    assert pairs.count() == 0  # distinct digests → no near-identical vectors
    topk = similarity.lsh_topk(
        emb, dim=8, k=2, n_tables=2, n_bits=2, id_col="vec_id", vec_col="embedding"
    )
    assert topk.count() > 0


def test_decode_default_png_codec(spark, frames_df):
    got = multimodal.decode_image(frames_df)
    row = got.first()
    assert (row.width, row.height) == (fixtures.FRAME_W, fixtures.FRAME_H)
    assert len(row.rgb) == fixtures.FRAME_W * fixtures.FRAME_H * 3


def test_decode_with_plugged_codec(spark, frames_df):
    def codec(png_bytes: bytes):
        return 1, 1, png_bytes[-8:]  # stand-in "decode": fixed dims + tail

    got = multimodal.decode_image(frames_df, codec=codec)
    row = got.first()
    assert (row.width, row.height) == (1, 1) and len(row.rgb) == 8


def test_resize_real_pixels(spark, frames_df):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
        png,
    )

    got = multimodal.resize_frames(frames_df, 16, 12)
    rows = got.collect()
    assert all((r.width, r.height) == (16, 12) for r in rows)
    src = {(r.camera, r.frame_index): r.content for r in frames_df.collect()}
    for r in rows[:5]:
        arr = png.decode(bytes(r.content))
        assert arr.shape == (12, 16, 3)
        # nearest-neighbor: every resized pixel exists in the source image
        src_arr = png.decode(bytes(src[(r.camera, r.frame_index)]))
        assert (arr == src_arr[::2, ::2]).all()  # 32x24 → 16x12 is stride-2
