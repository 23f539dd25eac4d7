"""Multimodal-column transforms: decode / annotate / batch-inference
(operators P11, P12, P13, K7).

Reference: bounding boxes are relative coords scaled by image size at draw
time (processing.py:366-384); annotation draws green boxes per instance
(processing.py:352-390); enrichment calls Rekognition one image per request
(processing.py:320-327).

Spark-first: images ride as opaque ``binary`` columns; the transforms are
Arrow-batched pandas UDFs over ``mapInPandas`` so a 1000-executor cluster
processes frames in vectorized batches instead of one network call per frame.
The annotate kernel is real — functions/png decodes, rasterizes the green
outlines pixel-identically to the reference's PIL draw (verified against
``outputs/left0193_labeled.png``), and re-encodes, all numpy+zlib. Only the
detection *model* remains pluggable (``infer_labels(model_fn=...)``; the
default is a deterministic fake keyed on the image digest — no vision model
ships in this container).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import png
from ..schemas import LABELS_ARRAY_SCHEMA

ANNOTATED_SCHEMA = (
    "bag_id string, camera string, frame_index int, annotated binary"
)


def scale_box(box: Column, width: Column, height: Column) -> Column:
    """P11: relative box × image dims → pixel corner points
    (processing.py:366-375). Pure column arithmetic."""
    return F.struct(
        (box["Left"] * width).alias("x0"),
        (box["Top"] * height).alias("y0"),
        ((box["Left"] + box["Width"]) * width).alias("x1"),
        ((box["Top"] + box["Height"]) * height).alias("y1"),
    )


def annotate_frames(frames_with_labels: DataFrame) -> DataFrame:
    """P12/K7: frames + labels → annotated image column.

    Input needs (bag_id, camera, frame_index, content, labels). The per-box
    extraction (flatten all Instances' BoundingBoxes) is a narrow JVM
    expression; only the pixel work crosses into Python, Arrow-batched via
    ``mapInPandas``. The draw is the real kernel: PNG decode → green
    2-px outlines at relative-coords × image-dims (pixel-identical to
    processing.py:366-384's PIL draw) → PNG encode.
    """
    boxes = F.flatten(
        F.transform(
            F.coalesce(F.col("labels"), F.array()),
            lambda l: F.transform(
                F.coalesce(l["Instances"], F.array()), lambda i: i["BoundingBox"]
            ),
        )
    )
    slim = frames_with_labels.select(
        "bag_id", "camera", "frame_index", "content", boxes.alias("boxes")
    )

    def _annotate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["bag_id", "camera", "frame_index"]].copy()
            annotated = []
            for content, bxs in zip(pdf["content"], pdf["boxes"]):
                arr = png.decode(bytes(content))
                rel = [
                    (b["Left"], b["Top"], b["Width"], b["Height"]) for b in bxs
                ]
                annotated.append(png.encode(png.draw_boxes(arr, rel)))
            out["annotated"] = annotated
            yield out

    return slim.mapInPandas(_annotate, schema=ANNOTATED_SCHEMA)


def infer_labels(frames: DataFrame, model_fn=None) -> DataFrame:
    """P13: pluggable batch object-detection enrich — ``frames → labels``.

    The operator contract matches the Rekognition call site
    (processing.py:320-327) but batches: each Arrow batch is one model
    invocation. ``model_fn(list[bytes]) -> list[list[dict]]`` plugs in a real
    model (ONNX/YOLO-class); the default is a deterministic fake keyed on the
    image digest so the downstream aggregation pipeline is testable.
    """
    if model_fn is None:
        model_fn = _fake_model

    out_schema = (
        "bag_id string, camera string, frame_index int, "
        f"labels array<struct<Name:string,Confidence:double,"
        f"Instances:array<struct<BoundingBox:struct<Width:double,Height:double,"
        f"`Left`:double,Top:double>,Confidence:double>>,"
        f"Parents:array<struct<Name:string>>>>"
    )

    def _infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["bag_id", "camera", "frame_index"]].copy()
            out["labels"] = model_fn(list(pdf["content"]))
            yield out

    return frames.select("bag_id", "camera", "frame_index", "content").mapInPandas(
        _infer, schema=out_schema
    )


def infer_labels_by_camera(frames: DataFrame, model_fn=None) -> DataFrame:
    """P13 variant: per-camera grouped inference (``applyInPandas``).

    Use when the model is camera-specific (per-sensor calibration /
    resolution) or when batches must be homogeneous: each group arrives as
    ONE pandas frame per camera instead of arbitrary partition slices. Same
    output contract as ``infer_labels`` (tested equivalent for a
    camera-agnostic model). Grouping shuffles on camera — prefer
    ``infer_labels`` when the model doesn't care."""
    if model_fn is None:
        model_fn = _fake_model

    out_schema = (
        "bag_id string, camera string, frame_index int, "
        f"labels array<struct<Name:string,Confidence:double,"
        f"Instances:array<struct<BoundingBox:struct<Width:double,Height:double,"
        f"`Left`:double,Top:double>,Confidence:double>>,"
        f"Parents:array<struct<Name:string>>>>"
    )

    def _infer_group(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["bag_id", "camera", "frame_index"]].copy()
        out["labels"] = model_fn(list(pdf["content"]))
        return out

    return (
        frames.select("bag_id", "camera", "frame_index", "content")
        .groupBy("camera")
        .applyInPandas(_infer_group, schema=out_schema)
    )


_VOCAB = ["Car", "Person", "Bicycle", "Road", "Traffic Light"]


def _fake_model(images: list[bytes]) -> list[list[dict]]:
    out = []
    for img in images:
        h = hashlib.md5(img or b"").digest()
        labels = []
        for i, name in enumerate(_VOCAB):
            if h[i] % 3 == 0:
                k = h[i + 5] % 3
                labels.append(
                    {
                        "Name": name,
                        "Confidence": 50.0 + h[i + 10] / 255.0 * 50.0,
                        "Instances": [
                            {
                                "BoundingBox": {
                                    "Width": 0.1,
                                    "Height": 0.1,
                                    "Left": j * 0.2,
                                    "Top": j * 0.1,
                                },
                                "Confidence": 60.0 + j,
                            }
                            for j in range(k)
                        ],
                        "Parents": [{"Name": "Vehicle"}] if name == "Car" else [],
                    }
                )
        out.append(labels)
    return out
