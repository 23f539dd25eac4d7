"""Topic-message demux / flatten (operators P1-P4, K1, S8).

Reference: each topic's messages are flattened to ``name: value`` string pairs,
header defined by the first message (bag_to_csv.py:114-136), written Hive-style
``topic=<t>/<t>.csv`` (bag_to_csv.py:99-105) then parquet (engine.py:173-186).

Spark-first: the long table keeps ``payload MAP<STRING,STRING>``; a topic's
wide table is a declared-schema projection (``payload['field']`` + cast) —
a narrow, codegen'd transform with **no shuffle** — instead of the reference's
per-row Python string parsing. Schema comes from the registry
(schemas.TOPIC_FIELDS) with dynamic inference as fallback (same capability as
infer-from-first-message, but order-independent: we take the union of keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import TOPIC_FIELDS, TOPIC_WHITELIST


def validate_topics(topics: list[str]) -> None:
    """Whitelist assertion at plan time (engine.py:212-214 — P1)."""
    bad = [t for t in topics if t not in TOPIC_WHITELIST]
    if bad:
        raise ValueError(f"topics not in whitelist: {bad}")


def distinct_topics(messages: DataFrame) -> DataFrame:
    """Discovered topic list (bag_to_csv.py:92-94 — P3)."""
    return messages.select("topic").distinct()


def topic_filter(messages: DataFrame, topics: list[str]) -> DataFrame:
    """Keep messages on the requested topics (bag_to_csv.py:91-95 — P2).
    A plain filter: pushed down to the parquet scan when `topic` is a
    partition column (the K1 layout makes it one → partition pruning)."""
    validate_topics(topics)
    return messages.filter(F.col("topic").isin(topics))


def infer_payload_keys(messages: DataFrame, topic: str) -> list[str]:
    """Dynamic-schema fallback: union of payload keys for the topic.

    The reference uses the *first* message's keys (order-dependent,
    bag_to_csv.py:114-130); the union is deterministic under reordering.
    """
    row = (
        messages.filter(F.col("topic") == topic)
        .select(F.explode(F.map_keys("payload")).alias("k"))
        .distinct()
        .orderBy("k")
        .collect()
    )
    return [r.k for r in row]


def widen_topic(messages: DataFrame, topic: str, fields: dict[str, str] | None = None) -> DataFrame:
    """Long → wide typed table for one topic (P4).

    ``rosbagTimestamp`` stays the first column (bag_to_csv.py:126,132).
    Map lookups are narrow expressions — the whole flatten is one codegen
    stage, no shuffle, no Python.
    """
    if fields is None:
        fields = TOPIC_FIELDS.get(topic) or {
            k: "string" for k in infer_payload_keys(messages, topic)
        }
    cols = [F.col("bag_id"), F.col("rosbagTimestamp"), F.col("seq")]
    for name, typ in fields.items():
        safe = name.replace(".", "_")
        # try_cast: one malformed payload value (corrupt bag garbage)
        # yields NULL in that cell instead of an ANSI CAST_INVALID_INPUT
        # abort of the whole flatten — the per-file coercion tolerance
        # the reference's pandas path had (bag_to_csv.py)
        cols.append(
            F.col("payload").getItem(name).try_cast(typ).alias(safe)
        )
    return messages.filter(F.col("topic") == topic).select(*cols)


def write_partitioned(messages: DataFrame, dest: str, fmt: str = "parquet") -> None:
    """Hive ``topic=`` partitioned landing write (K1): reproduces the
    reference layout bit-for-bit and buys partition pruning on read."""
    messages.write.partitionBy("topic").mode("overwrite").format(fmt).option(
        "compression", "snappy"
    ).save(dest)
