"""Watermarked streaming aggregation: late-data discard, session windows."""

from __future__ import annotations

import datetime as dt
import json
import os

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    sessionize,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (
    pipeline as sp,
)

T0 = dt.datetime(2021, 6, 1, 10, 0, 0)


def _write_events(d: str, name: str, events: list[tuple[str, int]]) -> None:
    with open(os.path.join(d, name), "w") as f:
        for etype, minutes in events:
            ts = (T0 + dt.timedelta(minutes=minutes)).strftime("%Y-%m-%dT%H:%M:%S")
            f.write(json.dumps({"event_type": etype, "ts": ts}) + "\n")


def _run_trigger(spark, src: str, ck: str, sink: list) -> None:
    """One AvailableNow tick; emitted (append-mode) rows land in ``sink``.
    foreachBatch, not the memory sink — memory cannot resume a checkpoint."""
    stream = spark.readStream.schema("event_type string, ts timestamp").json(src)
    agg = sp.windowed_event_counts(stream)

    def _collect(df, _eid):
        sink.extend(df.collect())

    q = (
        agg.writeStream.foreachBatch(_collect)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_watermark_discards_late_events(spark, tmp_path):
    src = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    # trigger 1: events at 10:00, 10:30, 11:30 → watermark 11:00 after batch;
    # the [10:00, 11:00) window closes and emits (count 2)
    _write_events(src, "b1.json", [("click", 0), ("click", 30), ("click", 90)])
    sink1: list = []
    _run_trigger(spark, src, ck, sink1)
    t1 = {(r.window_start, r.event_type): r.n_events for r in sink1}
    assert t1 == {(T0, "click"): 2}

    # trigger 2: a LATE event at 10:15 (behind the 11:00 watermark — must be
    # dropped, its window already emitted) + a fresh one at 12:30 that
    # advances the watermark to 12:00, closing [11:00, 12:00) with count 1
    _write_events(src, "b2.json", [("click", 15), ("click", 150)])
    sink2: list = []
    _run_trigger(spark, src, ck, sink2)
    t2 = {(r.window_start, r.event_type): r.n_events for r in sink2}
    assert t2 == {(T0 + dt.timedelta(hours=1), "click"): 1}


def test_session_window_batch_matches_gap_and_island(spark):
    rows = [
        (1, T0),
        (1, T0 + dt.timedelta(minutes=10)),
        (1, T0 + dt.timedelta(minutes=70)),  # > 30 min gap → new session
        (2, T0),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp")
    native = {
        (r.user_id, r.session_start): r.n_events
        for r in sp.session_window_stats(events).collect()
    }
    classic = {
        (r.user_id, r.session_start): r.n_events
        for r in sessionize.session_stats(events).collect()
    }
    assert native == classic == {
        (1, T0): 2,
        (1, T0 + dt.timedelta(minutes=70)): 1,
        (2, T0): 1,
    }


def test_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: retry duplicates arriving within the
    delay are dropped across micro-batches; state stays bounded."""
    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    sink: list = []

    def _write(name: str, rows: list[tuple[int, int]]) -> None:
        with open(os.path.join(src, name), "w") as f:
            for eid, minutes in rows:
                ts = (T0 + dt.timedelta(minutes=minutes)).strftime(
                    "%Y-%m-%dT%H:%M:%S"
                )
                f.write(json.dumps({"event_id": eid, "ts": ts}) + "\n")

    def _tick() -> None:
        stream = spark.readStream.schema("event_id long, ts timestamp").json(src)
        out = sp.dedup_within_watermark(stream, delay="10 minutes")

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

    _write("b1.json", [(1, 0), (2, 1), (1, 2)])  # in-batch dup of id 1
    _tick()
    assert sorted(r.event_id for r in sink) == [1, 2]

    # id 1 retries 3 minutes later (inside the horizon) -> dropped; id 3 new
    sink.clear()
    _write("b2.json", [(1, 3), (3, 4)])
    _tick()
    assert sorted(r.event_id for r in sink) == [3]


def test_stream_static_join(spark, tmp_path):
    """Stream-static join: each micro-batch enriches against a static dim
    table (re-planned per batch, broadcast under AQE) — the streaming form
    of the discovery/enrichment joins."""
    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    sink: list = []
    dim = spark.createDataFrame(
        [("click", "web"), ("buy", "commerce")], "event_type string, domain string"
    )

    _write_events(src, "b1.json", [("click", 0), ("buy", 1), ("view", 2)])
    stream = spark.readStream.schema("event_type string, ts timestamp").json(src)
    out = stream.join(dim, "event_type", "left")

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
    got = {(r.event_type, r.domain) for r in sink}
    assert got == {("click", "web"), ("buy", "commerce"), ("view", None)}


def _write_ts_rows(d: str, name: str, rows: list[tuple[int, int]], ts_field: str) -> None:
    with open(os.path.join(d, name), "w") as f:
        for uid, minutes in rows:
            ts = (T0 + dt.timedelta(minutes=minutes)).strftime("%Y-%m-%dT%H:%M:%S")
            f.write(json.dumps({"user_id": uid, ts_field: ts}) + "\n")


def test_stream_stream_attribution_join(spark, tmp_path):
    """Purchases join clicks from the same user within the 10-minute
    horizon; older clicks and other users' clicks never match."""
    p_src, c_src = str(tmp_path / "p"), str(tmp_path / "c")
    os.makedirs(p_src), os.makedirs(c_src)
    # user 1: clicks at 0 and 25 min, purchase at 30 → only the 25-min
    # click attributes. user 2's click is within 10 min of user 1's
    # purchase but must not match (key mismatch).
    _write_ts_rows(c_src, "c1.json", [(1, 0), (1, 25), (2, 28)], "click_ts")
    _write_ts_rows(p_src, "p1.json", [(1, 30)], "purchase_ts")

    purchases = spark.readStream.schema("user_id long, purchase_ts timestamp").json(p_src)
    clicks = spark.readStream.schema("user_id long, click_ts timestamp").json(c_src)
    joined = sp.attribution_join_streams(purchases, clicks)

    sink: list = []
    q = (
        joined.writeStream.foreachBatch(lambda df, _e: sink.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.user_id, r.purchase_ts, r.click_ts) for r in sink}
    assert got == {(1, T0 + dt.timedelta(minutes=30), T0 + dt.timedelta(minutes=25))}


def test_stream_static_dim_enrichment(spark, tmp_path):
    """A static dim table broadcast-joins into every micro-batch — the
    streaming form of the reference's per-frame metadata attach."""
    src = str(tmp_path / "ev")
    os.makedirs(src)
    _write_events(src, "b1.json", [("click", 0), ("view", 1), ("error", 2)])
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("error", "ops")],
        "event_type string, category string",
    )
    stream = spark.readStream.schema("event_type string, ts timestamp").json(src)
    joined = stream.join(dim.hint("broadcast"), "event_type")
    sink: list = []
    q = (
        joined.writeStream.foreachBatch(lambda df, _e: sink.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {(r.event_type, r.category) for r in sink} == {
        ("click", "engagement"),
        ("view", "engagement"),
        ("error", "ops"),
    }


def test_stream_stream_left_outer_flushes_unattributed(spark, tmp_path):
    """leftOuter attribution: matched purchases emit with their click;
    unattributed purchases emit ONCE with NULL click_ts after the
    watermark passes their horizon (driven by a second tick whose newer
    events advance both sides' watermarks through one checkpoint)."""
    p_src, c_src = str(tmp_path / "p"), str(tmp_path / "c")
    os.makedirs(p_src), os.makedirs(c_src)
    ck = str(tmp_path / "ck")

    def _run_tick():
        purchases = spark.readStream.schema(
            "user_id long, purchase_ts timestamp"
        ).json(p_src)
        clicks = spark.readStream.schema(
            "user_id long, click_ts timestamp"
        ).json(c_src)
        joined = sp.attribution_join_streams(purchases, clicks, how="leftOuter")
        sink: list = []
        q = (
            joined.writeStream.foreachBatch(
                lambda df, _e: sink.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sink

    # tick 1: user 1 attributes (click @25, purchase @30); user 3's
    # purchase @32 has no click — held in state, not emitted yet
    _write_ts_rows(c_src, "c1.json", [(1, 25)], "click_ts")
    _write_ts_rows(p_src, "p1.json", [(1, 30), (3, 32)], "purchase_ts")
    got1 = {(r.user_id, r.click_ts is None) for r in _run_tick()}
    assert (1, False) in got1
    assert not any(u == 3 for u, _ in got1)

    # tick 2: late traffic at minute ~120 pushes both watermarks past
    # user 3's horizon → its unattributed row flushes with NULL click_ts
    _write_ts_rows(c_src, "c2.json", [(9, 119)], "click_ts")
    _write_ts_rows(p_src, "p2.json", [(9, 120)], "purchase_ts")
    got2 = {(r.user_id, r.click_ts is None) for r in _run_tick()}
    assert (3, True) in got2


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Spark 3.5+ dropDuplicatesWithinWatermark: duplicate event ids within
    the watermark window collapse even when their timestamps differ (the
    at-least-once-sensor dedup the exact-key form can't express)."""
    import json
    import os

    src = str(tmp_path / "ddw_src")
    ck = str(tmp_path / "ddw_ck")
    os.makedirs(src)
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00"},
        {"event_id": 1, "ts": "2024-01-01T00:00:05"},  # dup, ts differs
        {"event_id": 2, "ts": "2024-01-01T00:00:10"},
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("event_id long, ts timestamp").json(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    sink: list = []
    q = (
        stream.writeStream.foreachBatch(lambda df, _e: sink.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r.event_id for r in sink) == [1, 2]


def test_watermark_drops_late_rows_in_append_windows(spark, tmp_path):
    """Append-mode windowed aggregation: a row arriving AFTER the watermark
    has passed its window never appears; an on-time row in a later batch
    lands in its own window. (The semantics the resample/rollup pipeline
    relies on for bounded state.)"""
    import json
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "wm_src")
    ck = str(tmp_path / "wm_ck")
    os.makedirs(src)

    def _w(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for e, ts in rows:
                f.write(json.dumps({"event_id": e, "ts": ts}) + "\n")

    def _tick(sink):
        stream = (
            spark.readStream.schema("event_id long, ts timestamp").json(src)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .count()
            .select(F.col("w.start").alias("ws"), "count")
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _e: sink.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: two rows at 00:00-00:10, max event time 01:00 → watermark
    # advances to 00:50, closing (and emitting) the 00:00 window
    _w("b1.json", [(1, "2024-01-01T00:01:00"), (2, "2024-01-01T00:05:00"),
                   (3, "2024-01-01T01:00:00")])
    s1: list = []
    _tick(s1)
    emitted1 = {(r.ws.minute, r["count"]) for r in s1}
    assert (0, 2) in emitted1  # the closed 00:00 window, with both rows

    # batch 2: one LATE row into the already-closed 00:00 window (dropped),
    # one on-time row at 01:20 advancing things further
    _w("b2.json", [(4, "2024-01-01T00:02:00"), (5, "2024-01-01T01:20:00")])
    s2: list = []
    _tick(s2)
    # the late row must NOT re-emit or amend the 00:00 window
    assert all(r.ws.minute != 0 or r.ws.hour != 0 for r in s2)
