"""Binary sources: camera frames + bag files (operators S1, S4-S6, S10, S11).

``read_frames`` is the production path: ``binaryFile`` scan (splittable
listing, pushes the path glob down) + identity derivation — replaces the
reference's "replay bag through ROS at 0.5× and save PNGs" (engine.py:96-99)
with a deterministic one-pass scan.

``read_bag_messages`` is the bag-decode contract (S4): binary bag blobs →
long ``topic_messages``. Real rosbag codec libraries aren't in this
container; the decoder is pluggable and the default raises — the Spark-side
plumbing (mapInPandas batching, topic/time pushdown options, output schema)
is real and tested via the fixture decoder.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.frames import with_frame_identity
from ..schemas import TOPIC_MESSAGES_SCHEMA

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


def default_bag_decoder(content: bytes, topics: list[str] | None) -> pd.DataFrame:
    raise NotImplementedError(
        "rosbag codec not available in this environment; plug a pure-Python "
        "bag parser (importRosbag-style, cf. reference test.py:22-25) with "
        "signature (bytes, topics) -> DataFrame[bag_id, topic, "
        "rosbagTimestamp, seq, payload]"
    )


def read_bag_messages(
    spark: SparkSession,
    path: str,
    topics: list[str] | None = None,
    decoder: Callable[[bytes, list[str] | None], pd.DataFrame] = default_bag_decoder,
) -> DataFrame:
    """Bag blobs → long topic_messages (S4/S6). One bag = one input split =
    one Arrow batch through the decoder; topic predicate is pushed into the
    decoder (reads only requested connections) rather than filtered after.
    """
    blobs = spark.read.format("binaryFile").option("pathGlobFilter", "*.bag").load(path)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield decoder(row["content"], topics)

    return blobs.select("path", "content").mapInPandas(
        _decode, schema=TOPIC_MESSAGES_DDL
    )


def bag_info(messages: DataFrame) -> DataFrame:
    """S11: `rosbag info` equivalent — per (bag, topic) message counts and
    time range; an aggregation over the long table instead of a second scan."""
    return messages.groupBy("bag_id", "topic").agg(
        F.count("*").alias("msg_count"),
        F.min("rosbagTimestamp").alias("start_ns"),
        F.max("rosbagTimestamp").alias("end_ns"),
    )
