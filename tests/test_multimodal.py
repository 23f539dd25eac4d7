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


def _pcm_clip(sr, segments):
    """PCM16-LE bytes: list of (duration_s, freq_or_None) segments."""
    import math
    import struct

    samples = []
    for dur, freq in segments:
        n = int(sr * dur)
        for i in range(n):
            v = 0 if freq is None else int(
                20000 * math.sin(2 * math.pi * freq * i / sr)
            )
            samples.append(v)
    return struct.pack(f"<{len(samples)}h", *samples)


def test_audio_windows_and_features(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.multimodal import (
        audio_features,
        audio_windows,
    )

    sr = 8000
    # 100ms of 400 Hz tone, 100ms silence, 100ms tone
    blob = _pcm_clip(sr, [(0.1, 400), (0.1, None), (0.1, 400)])
    clips = spark.createDataFrame([(1, bytearray(blob))], "clip_id long, content binary")
    wins = audio_windows(clips, sample_rate=sr, win_ms=25, hop_ms=25)
    rows = wins.collect()
    assert len(rows) == 12  # 300ms / 25ms hop (no partial tail)
    assert all(r.n_samples == sr * 25 // 1000 for r in rows)

    feats = {r.win_idx: r for r in audio_features(wins).collect()}
    # tone windows: loud, ZCR ~ 2*f/sr = 0.1; silence: zero energy
    assert feats[0].rms > 0.3 and feats[0].zcr > 0.05
    assert feats[5].rms == 0.0 and feats[5].peak == 0.0
    assert feats[9].rms > 0.3


def test_active_segments_vad(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.multimodal import (
        active_segments,
        audio_features,
        audio_windows,
    )

    sr = 8000
    blob = _pcm_clip(sr, [(0.1, 300), (0.1, None), (0.15, 500)])
    clips = spark.createDataFrame([(7, bytearray(blob))], "clip_id long, content binary")
    feats = audio_features(audio_windows(clips, sr, win_ms=25, hop_ms=25))
    segs = sorted(
        active_segments(feats, rms_threshold=0.02).collect(),
        key=lambda r: r.seg_idx,
    )
    # two tone bursts -> two segments split by the silence
    assert len(segs) == 2
    assert segs[0].start_ms == 0 and segs[0].n_windows == 4
    assert segs[1].start_ms == 200 and segs[1].n_windows == 6


def test_dhash_near_dup_images(spark):
    import numpy as np

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
        png,
    )
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.dedup import (
        hash_near_pairs,
    )
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.multimodal import (
        dhash_frames,
    )

    rng = np.random.RandomState(9)
    base = rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
    near = base.copy()
    near[10:13, 20:23] = 255  # tiny edit: a 3x3 blob
    other = rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
    frames = spark.createDataFrame(
        [
            (1, bytearray(png.encode(base))),
            (2, bytearray(png.encode(near))),
            (3, bytearray(png.encode(other))),
        ],
        "key long, content binary",
    )
    hashes = {r.key: r.dhash for r in dhash_frames(frames, "key").collect()}
    assert hashes[1] == hashes[2] or bin(
        (hashes[1] ^ hashes[2]) & ((1 << 64) - 1)
    ).count("1") <= 3  # tiny edit barely moves the hash
    assert bin((hashes[1] ^ hashes[3]) & ((1 << 64) - 1)).count("1") > 10

    hdf = spark.createDataFrame(
        [(k, v) for k, v in hashes.items()], "doc_id long, dhash long"
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in hash_near_pairs(hdf, "dhash", bits=64, bands=4).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_null_blobs_do_not_crash_codec_paths(spark):
    """NULL content blobs (failed upstream extraction) yield NULL/absent
    rows instead of bytes(None)/np.frombuffer(None) TypeErrors killing
    the task (regression); odd-length PCM drops the truncated tail byte."""
    import numpy as np

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
        png,
    )
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        multimodal,
    )

    img = png.encode(np.zeros((4, 4, 3), dtype="uint8"))
    frames = spark.createDataFrame(
        [("b1", "cam0", 0, bytearray(img)), ("b1", "cam0", 1, None)],
        "bag_id string, camera string, frame_index int, content binary",
    )
    dec = {r.frame_index: r.width for r in multimodal.decode_image(frames).collect()}
    assert dec[0] == 4 and dec[1] is None

    dh = multimodal.dhash_frames(
        frames.withColumn(
            "fid", F.concat("bag_id", F.col("frame_index").cast("string"))
        ),
        id_col="fid",
    ).collect()
    assert len(dh) == 2  # no crash
    assert sorted(r.dhash is None for r in dh) == [False, True]  # NULL row hashless

    pcm = (np.arange(300, dtype="<i2")).tobytes()
    clips = spark.createDataFrame(
        [("c1", bytearray(pcm)), ("c2", None), ("c3", bytearray(pcm + b"\x01"))],
        "clip_id string, content binary",
    )
    wins = multimodal.audio_windows(
        clips, sample_rate=100, win_ms=1000, hop_ms=1000
    ).collect()
    ids = {r.clip_id for r in wins}
    assert "c1" in ids and "c2" not in ids and "c3" in ids
