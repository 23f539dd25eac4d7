"""P12/P13: batch inference + the real annotate kernel.

The annotate path is pixel-real (pure-numpy PNG codec + PIL-parity box
rasterizer), and the default detection model is a genuine numpy color-blob
detector over the decoded pixels — content in, boxes out.
Includes a golden test: drawing the reference's own label JSON onto its
original PNG reproduces its labeled PNG byte-for-byte.
"""

from __future__ import annotations

import json
import os

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
    png,
)
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
    camera-agnostic model (same deterministic detector)."""
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


def test_annotate_frames_draws_real_boxes(spark):
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
    checked_with_boxes = 0
    for key, (content, labels) in src.items():
        boxes = [
            (i.BoundingBox.Left, i.BoundingBox.Top, i.BoundingBox.Width,
             i.BoundingBox.Height)
            for lab in labels
            for i in (lab.Instances or [])
        ]
        want = png.draw_boxes(png.decode(bytes(content)), boxes)
        got = png.decode(bytes(out[key]))
        assert (got == want).all(), key
        if boxes:
            checked_with_boxes += 1
            assert (
                (got[:, :, 0] == 0) & (got[:, :, 1] == 212) & (got[:, :, 2] == 0)
            ).any(), key
    assert checked_with_boxes > 0  # fixture must exercise the draw path


def test_annotate_golden_parity_with_reference_output(spark):
    """Reference golden: its label JSON drawn on its original PNG must equal
    its labeled PNG pixel-for-pixel (processing.py:352-390 semantics)."""
    ref = "/root/reference/outputs"
    if not os.path.exists(f"{ref}/left0193_original.png"):
        import pytest

        pytest.skip("reference outputs not present")
    labels = json.load(open(f"{ref}/left0193_labels.json"))
    boxes = [
        (b["Left"], b["Top"], b["Width"], b["Height"])
        for item in labels
        for inst in item.get("Instances", [])
        for b in [inst["BoundingBox"]]
    ]
    orig = png.decode(open(f"{ref}/left0193_original.png", "rb").read())
    gold = png.decode(open(f"{ref}/left0193_labeled.png", "rb").read())
    assert (png.draw_boxes(orig, boxes) == gold).all()


def test_detect_color_blobs_is_content_derived():
    """The default model reads pixels: a painted region produces a box AT
    that region, and moving the region moves the box."""
    import numpy as np

    base = np.full((40, 60, 3), 128, dtype=np.uint8)  # low-sat grey
    img_a = base.copy()
    img_a[10:20, 30:48] = (220, 30, 30)  # red blob → "Traffic Light"
    img_b = base.copy()
    img_b[25:35, 6:24] = (220, 30, 30)  # same blob, elsewhere

    la = annotate.detect_color_blobs([png.encode(img_a)])[0]
    lb = annotate.detect_color_blobs([png.encode(img_b)])[0]
    box_a = next(l for l in la if l["Name"] == "Traffic Light")["Instances"][0][
        "BoundingBox"
    ]
    box_b = next(l for l in lb if l["Name"] == "Traffic Light")["Instances"][0][
        "BoundingBox"
    ]
    assert box_a == {
        "Width": round(18 / 60, 6),
        "Height": round(10 / 40, 6),
        "Left": round(30 / 60, 6),
        "Top": round(10 / 40, 6),
    }
    assert box_b["Left"] == round(6 / 60, 6) and box_b["Top"] == round(25 / 40, 6)
    assert box_a != box_b
    # the untouched grey background is one low-saturation component
    assert any(l["Name"] == "Person" for l in la)
    # an all-grey frame has no color-class labels at all
    lg = annotate.detect_color_blobs([png.encode(base)])[0]
    assert [l["Name"] for l in lg] == ["Person"]


def test_detect_color_blobs_components():
    """Two disjoint same-color blobs → two Instances; diagonal contact does
    not merge (4-connectivity); sub-threshold specks are dropped."""
    import numpy as np

    img = np.full((40, 60, 3), 128, dtype=np.uint8)
    img[2:10, 2:14] = (30, 200, 30)
    img[20:30, 40:56] = (30, 200, 30)
    img[0, 59] = (30, 200, 30)  # 1-px speck: below min_area_frac
    road = next(
        l
        for l in annotate.detect_color_blobs([png.encode(img)])[0]
        if l["Name"] == "Road"
    )
    assert len(road["Instances"]) == 2
    areas = sorted(
        round(i["BoundingBox"]["Width"] * 60) * round(i["BoundingBox"]["Height"] * 40)
        for i in road["Instances"]
    )
    assert areas == [96, 160]


def test_draw_boxes_rgba_and_null_content(spark):
    """draw_boxes on a 4-channel image pads the color with opaque alpha
    (previously a numpy broadcast crash on any RGBA PNG the codec itself
    decodes), and annotate_frames passes NULL content through as a NULL
    annotated cell instead of bytes(None) (regression)."""
    import numpy as np

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
        png,
    )
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        annotate,
    )

    rgba = np.zeros((10, 10, 4), dtype="uint8")
    rgba[:, :, 3] = 255
    out = png.draw_boxes(rgba, [(0.1, 0.1, 0.5, 0.5)])
    assert out.shape == (10, 10, 4)
    assert out[1, 3, 1] == png.GREEN[1]  # green channel written
    assert out[1, 3, 3] == 255  # alpha stays opaque

    grey = np.zeros((10, 10), dtype="uint8")
    out2 = png.draw_boxes(grey, [(0.1, 0.1, 0.5, 0.5)])
    assert out2[1, 3].max() > 0  # visible luma box, not black-on-black

    img = png.encode(np.zeros((6, 6, 3), dtype="uint8"))
    rows = [
        (
            "b", "left", 1, bytearray(img),
            [([((0.1, 0.1, 0.3, 0.3),)],), ([(None,)],)],
        ),
        ("b", "left", 2, None, None),
    ]
    schema = (
        "bag_id string, camera string, frame_index int, content binary, "
        "labels array<struct<Instances array<struct<BoundingBox "
        "struct<Left double, Top double, Width double, Height double>>>>>"
    )
    frames = spark.createDataFrame(rows, schema)
    got = {r.frame_index: r.annotated for r in annotate.annotate_frames(frames).collect()}
    assert got[1] is not None
    assert got[2] is None
