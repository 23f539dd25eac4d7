"""Structured-Streaming tour: the incremental half of the engine.

    python examples/streaming_demo.py

Self-contained (writes only under a temp dir): generates two micro-batches
of JSON events, then runs each streaming operator with AvailableNow
triggers — every tick is exactly-once against its checkpoint, so rerunning
a stage processes nothing new.

1. watermarked tumbling-window counts (late data bounded by the watermark)
2. native session windows on the stream
3. stateful dedup + per-key contribution quota (applyInPandasWithState)
4. cross-batch transition pairs (state = each key's last event) — asserts
   the tick-boundary pair (click→purchase) that only restored state can see

(The continuously-folded CMS sketch and the full bag-ingestion lifecycle
have their own tests: tests/test_streaming.py, tests/test_bag_ingest.py.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.session import (  # noqa: E402
    get_spark,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (  # noqa: E402
    stateful,
)

SCHEMA = "user_id long, event_id long, ts timestamp, event_type string"


def _write_batch(src: str, name: str, rows) -> None:
    with open(os.path.join(src, name), "w") as f:
        for u, e, ts, et in rows:
            f.write(
                json.dumps(
                    {"user_id": u, "event_id": e, "ts": ts, "event_type": et}
                )
                + "\n"
            )


def _drain(stream_df, ck: str, mode: str, label: str) -> list:
    sink: list = []
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, _e: sink.extend(df.collect())
        )
        .outputMode(mode)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    print(f"{label}: {len(sink)} rows")
    return sink


def main() -> None:
    spark = get_spark("streaming-demo", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="aads_stream_demo_")
    src = os.path.join(root, "events")
    os.makedirs(src)
    b1 = [
        (1, 1, "2024-01-01T00:00:00", "view"),
        (1, 2, "2024-01-01T00:05:00", "click"),
        (2, 3, "2024-01-01T00:07:00", "view"),
        (1, 2, "2024-01-01T00:05:00", "click"),  # dup
    ]
    b2 = [
        (1, 4, "2024-01-01T00:20:00", "purchase"),
        (2, 5, "2024-01-01T07:00:00", "view"),  # new session for user 2
    ]
    _write_batch(src, "b1.json", b1)

    def stream():
        return spark.readStream.schema(SCHEMA).json(src)

    # 1. watermarked tumbling windows
    win = (
        stream()
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .count()
    )
    _drain(win, os.path.join(root, "ck_win"), "update", "windowed counts t1")

    # 3. stateful dedup (drops the in-batch duplicate)
    _drain(
        stateful.streaming_dedup(stream()),
        os.path.join(root, "ck_dedup"),
        "append",
        "dedup t1",
    )

    # 4. cross-batch transition pairs: tick 1 then tick 2
    ck_tr = os.path.join(root, "ck_tr")
    _drain(
        stateful.streaming_transition_counts(stream()),
        ck_tr, "append", "transitions t1",
    )
    _write_batch(src, "b2.json", b2)
    out = _drain(
        stateful.streaming_transition_counts(stream()),
        ck_tr, "append", "transitions t2",
    )
    # user 1's click→purchase pairs ACROSS the tick boundary via state
    assert any(r.from_type == "click" and r.to_type == "purchase" for r in out)

    # 2. native session windows over everything so far
    sess = (
        stream()
        .withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
    )
    _drain(sess, os.path.join(root, "ck_sess"), "complete", "session windows")

    # 5. quota: at most 2 events per user across all batches
    _drain(
        stateful.streaming_group_quota(stream(), quota=2),
        os.path.join(root, "ck_q"),
        "append",
        "quota-admitted",
    )

    print("demo dir (checkpoints + state):", root)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
