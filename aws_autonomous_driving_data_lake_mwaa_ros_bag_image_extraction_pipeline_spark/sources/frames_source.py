"""Binary sources: camera frames + bag files (operators S1, S4-S6, S10, S11).

``read_frames`` is the production path: ``binaryFile`` scan (splittable
listing, pushes the path glob down) + identity derivation — replaces the
reference's "replay bag through ROS at 0.5× and save PNGs" (engine.py:96-99)
with a deterministic one-pass scan.

``read_bag_messages`` is the bag-decode contract (S4): binary bag blobs →
long ``topic_messages``. The default decoder is the real pure-Python ROS
bag 2.0 codec (sources/rosbag_format.py — record parser + definition-driven
message deserializer, the format the reference reads via ``rosbag.Bag`` /
``importRosbag``); the decoder stays pluggable for other container formats.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.frames import with_frame_identity
from ..schemas import TOPIC_MESSAGES_SCHEMA
from .rosbag_format import rosbag_decoder, rosbag_frame_decoder

TOPIC_MESSAGES_DDL = (
    "bag_id string, topic string, rosbagTimestamp long, seq int, "
    "payload map<string,string>"
)


def read_frames(spark: SparkSession, path: str) -> DataFrame:
    """PNG frames as a multimodal table (S10 + P5-P8).

    ``binaryFile`` gives (path, modificationTime, length, content); identity
    columns derive from the path. At 100 TB: content stays in executor-side
    Arrow batches; never collect it.
    """
    df = spark.read.format("binaryFile").option("pathGlobFilter", "*.png").load(path)
    return with_frame_identity(df, "path")


GZIP_MAGIC = b"\x1f\x8b"


def untar_bag(content: bytes) -> bytes:
    """S6: unwrap a ``.tar.gz``-packed bag; asserts exactly one ``.bag``
    member (engine.py:35-51 semantics — a tarball is one bag, never more)."""
    import io
    import tarfile

    with tarfile.open(fileobj=io.BytesIO(content), mode="r:gz") as tf:
        members = [m for m in tf.getmembers() if m.name.endswith(".bag")]
        if len(members) != 1:
            raise ValueError(
                f"expected exactly one .bag in archive, found {len(members)}"
            )
        f = tf.extractfile(members[0])
        assert f is not None
        return f.read()


FRAMES_DDL = (
    "bag_id string, camera string, frame_index int, filename string, "
    "frame_time timestamp, width int, height int, content binary"
)


def decode_bag_frames(
    blobs: DataFrame,
    decoder: Callable[[str, bytes], pd.DataFrame] = rosbag_frame_decoder,
) -> DataFrame:
    """Binary bag rows → frames table (S10 via bag decode; multimodal
    column). Default: sensor_msgs/Image messages from real .bag bytes,
    PNG-encoded. Same batching contract as ``decode_bag_blobs``."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield decoder(row["path"], row["content"])

    return blobs.select("path", "content").mapInPandas(_decode, schema=FRAMES_DDL)


def decode_bag_blobs(
    blobs: DataFrame,
    topics: list[str] | None = None,
    decoder: Callable[[str, bytes, list[str] | None], pd.DataFrame] = rosbag_decoder,
) -> DataFrame:
    """Binary bag rows (path, content) → long topic_messages (S4/S6).

    One bag = one input split = one Arrow batch through the decoder; the
    topic predicate is pushed into the decoder (messages on unrequested
    connections are skipped before deserialization) rather than filtered
    after. Accepts any DataFrame with (path, content) — a batch scan, a
    streaming micro-batch, or a test frame.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield decoder(row["path"], row["content"], topics)

    return blobs.select("path", "content").mapInPandas(
        _decode, schema=TOPIC_MESSAGES_DDL
    )


def read_bag_messages(
    spark: SparkSession,
    path: str,
    topics: list[str] | None = None,
    decoder: Callable[[str, bytes, list[str] | None], pd.DataFrame] = rosbag_decoder,
) -> DataFrame:
    """Bag files under ``path`` → long topic_messages (S4/S6).

    The glob accepts both bare ``.bag`` and ``.bag.tar.gz`` objects — the
    decoder sniffs the gzip magic and unwraps (S6).
    """
    blobs = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.bag*"
    ).load(path)
    return decode_bag_blobs(blobs, topics, decoder)


def bag_info(messages: DataFrame) -> DataFrame:
    """S11: `rosbag info` equivalent — per (bag, topic) message counts and
    time range; an aggregation over the long table instead of a second scan."""
    return messages.groupBy("bag_id", "topic").agg(
        F.count("*").alias("msg_count"),
        F.min("rosbagTimestamp").alias("start_ns"),
        F.max("rosbagTimestamp").alias("end_ns"),
    )
