"""Incremental rollup == full recompute, touching only affected partitions."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    rollup,
    sessionize,
)

T0 = dt.datetime(2021, 5, 1, 0, 30, 0)


def _events(spark, specs):
    rows = [(et, T0 + dt.timedelta(minutes=m)) for et, m in specs]
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_incremental_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    b1 = [("click", 0), ("click", 10), ("buy", 70), ("click", 60 * 24)]  # two days
    b2 = [("click", 5), ("buy", 75), ("click", 60 * 48)]  # overlaps day 1 + new day
    rollup.update_rollup(spark, _events(spark, b1), path)
    rollup.update_rollup(spark, _events(spark, b2), path)

    got = {
        (r.window_start, r.event_type): r.n_events
        for r in rollup.read_rollup(spark, path).collect()
    }
    full = {
        (r.window_start, r.event_type): r.n_events
        for r in sessionize.tumbling_window_agg(_events(spark, b1 + b2)).collect()
    }
    assert got == full

    # day partitions exist (pruned merge reads only affected days)
    days = {d for d in os.listdir(path) if d.startswith("day=")}
    assert len(days) == 3


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "rollup")
    rollup.update_rollup(spark, _events(spark, [("click", 0)]), path)
    day1 = os.path.join(path, "day=2021-05-01")
    mtime_before = max(
        os.path.getmtime(os.path.join(day1, f)) for f in os.listdir(day1)
    )
    # second batch lands entirely on a different day
    rollup.update_rollup(spark, _events(spark, [("click", 60 * 24 * 3)]), path)
    mtime_after = max(
        os.path.getmtime(os.path.join(day1, f)) for f in os.listdir(day1)
    )
    assert mtime_after == mtime_before  # dynamic overwrite left day 1 alone

def test_streaming_rollup_matches_batch(spark, tmp_path):
    """Two streamed ticks fold into the same rollup a one-shot batch
    aggregation produces; history is never recomputed."""
    import datetime as dt
    import json
    import os

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (
        pipeline as sp,
    )

    src = str(tmp_path / "ev")
    rp = str(tmp_path / "rollup")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    t0 = dt.datetime(2021, 6, 1, 10, 0, 0)

    def _write(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for etype, minutes in rows:
                ts = (t0 + dt.timedelta(minutes=minutes)).strftime(
                    "%Y-%m-%dT%H:%M:%S"
                )
                f.write(json.dumps({"event_type": etype, "ts": ts}) + "\n")

    def _tick():
        stream = spark.readStream.schema("event_type string, ts timestamp").json(src)
        q = sp.streaming_rollup(stream, rp, ck).start()
        q.awaitTermination(120)

    all_rows = []
    _write("b1.json", [("a", 0), ("a", 30), ("b", 70)])
    all_rows += [("a", 0), ("a", 30), ("b", 70)]
    _tick()
    _write("b2.json", [("a", 90), ("b", 75), ("b", 1500)])  # +1 day spill
    all_rows += [("a", 90), ("b", 75), ("b", 1500)]
    _tick()

    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.read.parquet(rp).collect()
    }
    want = {}
    for etype, minutes in all_rows:
        w = t0 + dt.timedelta(hours=(minutes // 60))
        want[(w, etype)] = want.get((w, etype), 0) + 1
    assert got == want
