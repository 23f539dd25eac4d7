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


def fixture_bag_decoder(
    path: str, content: bytes, topics: list[str] | None
) -> pd.DataFrame:
    """Default S4/S5 decoder: parses the deterministic fixture bag format
    (sources/fixtures.bag_bytes — magic + json-lines) with S6 tar.gz unwrap.

    The contract — ``(path, bytes, topics) -> DataFrame[bag_id, topic,
    rosbagTimestamp, seq, payload]`` with the topic predicate applied during
    the parse, not after — is exactly what a real rosbag 2.0 parser
    (importRosbag-style, cf. reference test.py:22-25) plugs into; only this
    function changes, never the Spark plumbing.
    """
    import json

    from .fixtures import BAG_MAGIC

    if content[:2] == GZIP_MAGIC:
        content = untar_bag(content)
    if not content.startswith(BAG_MAGIC):
        raise ValueError(f"not a fixture bag (bad magic) at {path}")
    want = set(topics) if topics else None
    rows = []
    for line in content.decode().splitlines()[1:]:
        if not line:
            continue
        m = json.loads(line)
        if "topic" not in m:  # frame record — decode_bag_frames' concern
            continue
        if want is not None and m["topic"] not in want:
            continue
        rows.append(
            (m["bag_id"], m["topic"], m["t"], m["seq"], m["payload"])
        )
    return pd.DataFrame(
        rows, columns=["bag_id", "topic", "rosbagTimestamp", "seq", "payload"]
    )


FRAMES_DDL = (
    "bag_id string, camera string, frame_index int, filename string, "
    "frame_time timestamp, width int, height int, content binary"
)


def fixture_frame_decoder(path: str, content: bytes) -> pd.DataFrame:
    """Frame records from a fixture bag (the E2 ``image_saver`` replacement:
    deterministic scan instead of a lossy realtime replay, engine.py:96-99)."""
    import base64
    import json

    from .fixtures import BAG_MAGIC

    if content[:2] == GZIP_MAGIC:
        content = untar_bag(content)
    if not content.startswith(BAG_MAGIC):
        raise ValueError(f"not a fixture bag (bad magic) at {path}")
    rows = []
    for line in content.decode().splitlines()[1:]:
        if not line:
            continue
        m = json.loads(line)
        if "camera" not in m:
            continue
        rows.append(
            (
                m["bag_id"],
                m["camera"],
                m["idx"],
                m["filename"],
                pd.Timestamp(m["t_us"], unit="us"),
                m["w"],
                m["h"],
                base64.b64decode(m["png"]),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "bag_id",
            "camera",
            "frame_index",
            "filename",
            "frame_time",
            "width",
            "height",
            "content",
        ],
    )


def decode_bag_frames(
    blobs: DataFrame,
    decoder: Callable[[str, bytes], pd.DataFrame] = fixture_frame_decoder,
) -> DataFrame:
    """Binary bag rows → frames table (S10 via bag decode; multimodal
    column). Same batching contract as ``decode_bag_blobs``."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield decoder(row["path"], row["content"])

    return blobs.select("path", "content").mapInPandas(_decode, schema=FRAMES_DDL)


def decode_bag_blobs(
    blobs: DataFrame,
    topics: list[str] | None = None,
    decoder: Callable[[str, bytes, list[str] | None], pd.DataFrame] = fixture_bag_decoder,
) -> DataFrame:
    """Binary bag rows (path, content) → long topic_messages (S4/S6).

    One bag = one input split = one Arrow batch through the decoder; the
    topic predicate is pushed into the decoder (reads only requested
    connections) rather than filtered after. Accepts any DataFrame with
    (path, content) — a batch scan, a streaming micro-batch, or a test frame.
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
    decoder: Callable[[str, bytes, list[str] | None], pd.DataFrame] = fixture_bag_decoder,
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
