"""applyInPandasWithState: state persists across micro-batches and restarts."""

from __future__ import annotations

import json
import os

import pytest

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (
    stateful,
)


def _write(d: str, name: str, rows: list[tuple[int, int]]) -> None:
    with open(os.path.join(d, name), "w") as f:
        for uid, eid in rows:
            f.write(json.dumps({"user_id": uid, "event_id": eid}) + "\n")


def _tick(spark, src: str, ck: str, op, sink: list, mode: str) -> None:
    stream = spark.readStream.schema("user_id long, event_id long").json(src)
    out = op(stream)

    def _collect(df, _eid):
        sink.extend(df.collect())

    q = (
        out.writeStream.foreachBatch(_collect)
        .outputMode(mode)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_dedup_across_triggers(spark, tmp_path):
    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    _write(src, "b1.json", [(1, 10), (1, 11), (2, 10), (1, 10)])
    s1: list = []
    _tick(spark, src, ck, stateful.streaming_dedup, s1, "append")
    got1 = {(r.user_id, r.event_id) for r in s1}
    assert got1 == {(1, 10), (1, 11), (2, 10)}  # in-batch dup dropped

    # second trigger, separate query run, SAME checkpoint: previously seen
    # ids stay deduped (state restored), new ones emit
    _write(src, "b2.json", [(1, 10), (1, 12), (2, 10), (3, 1)])
    s2: list = []
    _tick(spark, src, ck, stateful.streaming_dedup, s2, "append")
    got2 = {(r.user_id, r.event_id) for r in s2}
    assert got2 == {(1, 12), (3, 1)}


def test_bloom_dedup_bounded_state(spark, tmp_path):
    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    _write(src, "b1.json", [(1, 10), (1, 11), (1, 10), (2, 10)])
    s1: list = []
    _tick(spark, src, ck, stateful.streaming_dedup_bloom, s1, "append")
    assert {(r.user_id, r.event_id) for r in s1} == {(1, 10), (1, 11), (2, 10)}

    # state restored from checkpoint; fixed-size filter still dedupes
    _write(src, "b2.json", [(1, 10), (1, 12)])
    s2: list = []
    _tick(spark, src, ck, stateful.streaming_dedup_bloom, s2, "append")
    assert {(r.user_id, r.event_id) for r in s2} == {(1, 12)}


def test_running_counters_accumulate(spark, tmp_path):
    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    _write(src, "b1.json", [(1, 1), (1, 2), (2, 1)])
    s1: list = []
    _tick(spark, src, ck, stateful.running_counters, s1, "update")
    assert {(r.user_id, r.n_events) for r in s1} == {(1, 2), (2, 1)}

    _write(src, "b2.json", [(1, 3)])
    s2: list = []
    _tick(spark, src, ck, stateful.running_counters, s2, "update")
    assert {(r.user_id, r.n_events) for r in s2} == {(1, 3)}  # 2 + 1, restored


def test_streaming_group_quota_across_triggers(spark, tmp_path):
    """Per-key admission cap holds across micro-batches via checkpointed
    state (classic impl; the tws impl needs protobuf — next test)."""
    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    sink: list = []
    op = lambda s: stateful.streaming_group_quota(s, quota=3)

    _write(src, "b1.json", [(1, 10), (1, 11), (2, 20)])
    _tick(spark, src, ck, op, sink, "append")
    assert sorted((r.user_id, r.event_id) for r in sink) == [
        (1, 10), (1, 11), (2, 20),
    ]

    # key 1 has 1 slot left -> smallest id of the new batch wins; key 2 has 2
    sink.clear()
    _write(src, "b2.json", [(1, 13), (1, 12), (2, 21), (3, 30)])
    _tick(spark, src, ck, op, sink, "append")
    assert sorted((r.user_id, r.event_id) for r in sink) == [
        (1, 12), (2, 21), (3, 30),
    ]

    # key 1 exhausted (3 admitted); key 2 takes its third and last slot
    sink.clear()
    _write(src, "b3.json", [(1, 14), (2, 22)])
    _tick(spark, src, ck, op, sink, "append")
    assert sorted((r.user_id, r.event_id) for r in sink) == [(2, 22)]

    # now every key is at quota -> nothing admitted
    sink.clear()
    _write(src, "b4.json", [(1, 15), (2, 23), (3, 31), (3, 32), (3, 33)])
    _tick(spark, src, ck, op, sink, "append")
    assert sorted((r.user_id, r.event_id) for r in sink) == [(3, 31), (3, 32)]


def test_streaming_group_quota_tws(spark, tmp_path):
    """Same cap on the Spark 4 transformWithStateInPandas StatefulProcessor
    path — runnable only where protobuf (its state-server protocol) exists."""
    pytest.importorskip("google.protobuf")
    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    sink: list = []
    op = lambda s: stateful.streaming_group_quota(s, quota=2, impl="tws")

    _write(src, "b1.json", [(1, 10), (1, 11), (1, 12)])
    _tick(spark, src, ck, op, sink, "append")
    assert sorted((r.user_id, r.event_id) for r in sink) == [(1, 10), (1, 11)]


def test_streaming_resample_ffill_incremental(spark, tmp_path):
    """Grid points emit exactly once across triggers, carrying the running
    value forward — matching the batch resample_ffill semantics up to the
    emitted frontier."""
    import datetime as dt

    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    t0 = dt.datetime(2022, 1, 1)

    def _write_ts(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for uid, sec, val in rows:
                ts = (t0 + dt.timedelta(seconds=sec)).strftime("%Y-%m-%dT%H:%M:%S")
                f.write(json.dumps({"user_id": uid, "ts": ts, "value": val}) + "\n")

    def _tick_rs(sink):
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).json(src)
        out = stateful.streaming_resample_ffill(stream, step_seconds=60)
        q = (
            out.writeStream.foreachBatch(lambda df, _e: sink.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_ts("b1.json", [(1, 5, 1.0), (1, 65, 2.0)])
    s1: list = []
    _tick_rs(s1)
    got1 = {((r.grid_ts - t0).total_seconds(), r.value) for r in s1}
    assert got1 == {(0.0, None), (60.0, 1.0)}  # 60s carries the t=5 reading

    _write_ts("b2.json", [(1, 185, 3.0)])
    s2: list = []
    _tick_rs(s2)
    got2 = {((r.grid_ts - t0).total_seconds(), r.value) for r in s2}
    # frontier resumes at 120 from checkpointed state; both points carry v=2
    assert got2 == {(120.0, 2.0), (180.0, 2.0)}


def test_streaming_resample_ffill_integral_dtype(spark, tmp_path):
    """A bigint value column stays bigint in the emitted grid (no silent
    double coercion), matching the batch resample_ffill's type contract."""
    import datetime as dt

    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    t0 = dt.datetime(2022, 1, 1)
    with open(os.path.join(src, "b1.json"), "w") as f:
        for sec, val in [(5, 7), (65, 9)]:
            ts = (t0 + dt.timedelta(seconds=sec)).strftime("%Y-%m-%dT%H:%M:%S")
            f.write(json.dumps({"user_id": 1, "ts": ts, "value": val}) + "\n")
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value bigint"
    ).json(src)
    out = stateful.streaming_resample_ffill(stream, step_seconds=60)
    assert dict(out.dtypes)["value"] == "bigint"
    sink: list = []
    q = (
        out.writeStream.foreachBatch(lambda df, _e: sink.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {((r.grid_ts - t0).total_seconds(), r.value) for r in sink}
    assert got == {(0.0, None), (60.0, 7)}
    assert all(r.value is None or isinstance(r.value, int) for r in sink)


def test_streaming_transition_counts_across_triggers(spark, tmp_path):
    """Cross-batch pairing: the first event of batch 2 pairs with the last
    event of batch 1 via restored state, matching the batch lead-window."""
    src = str(tmp_path / "tr_ev")
    ck = str(tmp_path / "tr_ck")
    os.makedirs(src)

    def _w(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for uid, eid, ts, et in rows:
                f.write(
                    json.dumps(
                        {
                            "user_id": uid,
                            "event_id": eid,
                            "ts": ts,
                            "event_type": et,
                        }
                    )
                    + "\n"
                )

    def _tick_tr(sink):
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, event_type string"
            ).json(src)
        )
        out = stateful.streaming_transition_counts(stream)

        def _collect(df, _eid):
            sink.extend(df.collect())

        q = (
            out.writeStream.foreachBatch(_collect)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _w("b1.json", [
        (1, 1, "2024-01-01T00:00:00", "a"),
        (1, 2, "2024-01-01T00:01:00", "b"),
        (2, 1, "2024-01-01T00:00:00", "a"),
    ])
    s1: list = []
    _tick_tr(s1)
    assert sorted((r.user_id, r.from_type, r.to_type) for r in s1) == [
        (1, "a", "b"),
    ]

    # batch 2: user 1's first event pairs with the restored 'b'; user 2's
    # with the restored 'a'
    _w("b2.json", [
        (1, 3, "2024-01-01T00:02:00", "c"),
        (2, 2, "2024-01-01T00:03:00", "b"),
        (2, 3, "2024-01-01T00:04:00", "a"),
    ])
    s2: list = []
    _tick_tr(s2)
    assert sorted((r.user_id, r.from_type, r.to_type) for r in s2) == [
        (1, "b", "c"),
        (2, "a", "b"),
        (2, "b", "a"),
    ]


def test_streaming_transition_counts_match_batch_twin(spark, tmp_path):
    """Two streamed ticks aggregate to exactly the batch transition_matrix
    counts on the same (in-order) data."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sessionize,
    )

    rows = [
        (1, 1, "2024-01-01T00:00:00", "a"),
        (1, 2, "2024-01-01T00:01:00", "b"),
        (1, 3, "2024-01-01T00:02:00", "a"),
        (2, 1, "2024-01-01T00:00:30", "c"),
        (2, 2, "2024-01-01T00:01:30", "c"),
    ]
    src = str(tmp_path / "tw_ev")
    ck = str(tmp_path / "tw_ck")
    os.makedirs(src)

    def _w(name, batch):
        with open(os.path.join(src, name), "w") as f:
            for uid, eid, ts, et in batch:
                f.write(json.dumps({
                    "user_id": uid, "event_id": eid, "ts": ts,
                    "event_type": et,
                }) + "\n")

    sink: list = []

    def _tick_tr():
        stream = spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, event_type string"
        ).json(src)
        out = stateful.streaming_transition_counts(stream)

        def _collect(df, _eid):
            sink.extend(df.collect())

        q = (
            out.writeStream.foreachBatch(_collect)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _w("b1.json", rows[:3])
    _tick_tr()
    _w("b2.json", rows[3:])
    _tick_tr()

    from collections import Counter

    streamed = Counter((r.from_type, r.to_type) for r in sink)

    batch_df = spark.createDataFrame(
        [(u, e, __import__("datetime").datetime.fromisoformat(t), et)
         for u, e, t, et in rows],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    batch = {
        (r.from_type, r.to_type): r.n
        for r in sessionize.transition_matrix(batch_df).collect()
    }
    assert dict(streamed) == batch


def test_streaming_transition_counts_drops_cross_batch_late_rows(spark, tmp_path):
    """A batch-2 event EARLIER than the stored frontier is a late arrival:
    it must neither pair nor rewind the frontier (drop-late contract)."""
    src = str(tmp_path / "late_ev")
    ck = str(tmp_path / "late_ck")
    os.makedirs(src)

    def _w(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for uid, eid, ts, et in rows:
                f.write(json.dumps({
                    "user_id": uid, "event_id": eid, "ts": ts,
                    "event_type": et,
                }) + "\n")

    sink: list = []

    def _tick():
        stream = spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, event_type string"
        ).json(src)
        out = stateful.streaming_transition_counts(stream)
        q = (
            out.writeStream.foreachBatch(lambda df, _e: sink.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _w("b1.json", [
        (1, 1, "2024-01-01T00:01:00", "a"),
        (1, 2, "2024-01-01T00:02:00", "b"),
    ])
    _tick()
    assert [(r.from_type, r.to_type) for r in sink] == [("a", "b")]

    # batch 2: one late row (00:00:30 < frontier 00:02:00) and one fresh row
    sink.clear()
    _w("b2.json", [
        (1, 3, "2024-01-01T00:00:30", "z"),   # late: dropped
        (1, 4, "2024-01-01T00:03:00", "c"),   # fresh: pairs with stored 'b'
    ])
    _tick()
    assert sorted((r.from_type, r.to_type) for r in sink) == [("b", "c")]

    # batch 3 (late-only): frontier must still be 'c' afterwards
    sink.clear()
    _w("b3.json", [(1, 5, "2024-01-01T00:02:30", "y")])
    _tick()
    assert sink == []
    sink.clear()
    _w("b4.json", [(1, 6, "2024-01-01T00:04:00", "d")])
    _tick()
    assert sorted((r.from_type, r.to_type) for r in sink) == [("c", "d")]


def test_streaming_resample_drops_cross_batch_late_events(spark, tmp_path):
    """A late event arriving in a LATER micro-batch must not overwrite
    the ffill state: the emitted chain already passed it (regression —
    the intra-batch guard reset per invocation)."""
    import glob
    import json as _json
    import os

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    def tick(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for ts_s, v in rows:
                f.write(_json.dumps({"key": "k", "ts_s": ts_s, "v": v}) + "\n")
        events = (
            spark.readStream.schema("key string, ts_s long, v long")
            .json(src)
            .withColumn("ts", F.timestamp_seconds(F.col("ts_s")))
            .drop("ts_s")
        )
        q = (
            stateful.streaming_resample_ffill(
                events, key_col="key", ts_col="ts", value_col="v",
                step_seconds=60, tie_col=None,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    from pyspark.sql import functions as F

    tick("b1.json", [(65, 1)])
    tick("b2.json", [(30, 9)])  # late: before the consumed frontier (65)
    tick("b3.json", [(130, 7)])

    got = {
        int(r.grid_ts.timestamp()): r.v
        for r in spark.read.parquet(out).collect()
        if glob.glob(out + "/*.parquet")
    }
    # grid point 120 must carry 1 (the value in force), not the late 9
    assert got.get(120) == 1
