"""As-of join and sessionization on hand-constructed timelines."""

from __future__ import annotations

import datetime as dt

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    sessionize,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.asof import (
    asof_join,
)

T0 = dt.datetime(2021, 1, 1, 12, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(20)), (1, _ts(5)), (2, _ts(10))],
        "user_id long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), "a"), (1, _ts(15), "b"), (2, _ts(30), "c")],
        "user_id long, rts timestamp, val string",
    )
    got = {
        (r.user_id, r.lts): r.val
        for r in asof_join(left, right, "user_id", "lts", "rts", ["val"]).collect()
    }
    assert got[(1, _ts(10))] == "a"  # latest right ≤ 10s is 8s
    assert got[(1, _ts(20))] == "b"
    assert got[(1, _ts(5))] is None  # no prior right row
    assert got[(2, _ts(10))] is None  # right row is in the future


def test_asof_join_same_ts_matches(spark):
    left = spark.createDataFrame([(1, _ts(8))], "user_id long, lts timestamp")
    right = spark.createDataFrame([(1, _ts(8), "x")], "user_id long, rts timestamp, val string")
    got = asof_join(left, right, "user_id", "lts", "rts", ["val"]).collect()
    assert got[0].val == "x"  # "at or before" includes equality


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(100))], "user_id long, lts timestamp")
    right = spark.createDataFrame([(1, _ts(10), "old")], "user_id long, rts timestamp, val string")
    got = asof_join(
        left, right, "user_id", "lts", "rts", ["val"], tolerance_ms=5000
    ).collect()
    assert got[0].val is None  # 90s > 5s tolerance


def test_sessionize_gap_and_island(spark):
    events = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(60)), (1, _ts(60 * 45)), (1, _ts(60 * 46)), (2, _ts(0))],
        "user_id long, ts timestamp",
    )
    got = {
        (r.user_id, r.ts): r.session_id
        for r in sessionize.sessionize(events, gap_minutes=30).collect()
    }
    assert got[(1, _ts(0))] == 1 and got[(1, _ts(60))] == 1
    assert got[(1, _ts(60 * 45))] == 2 and got[(1, _ts(60 * 46))] == 2
    assert got[(2, _ts(0))] == 1

    stats = {
        (r.user_id, r.session_id): r.n_events
        for r in sessionize.session_stats(events, gap_minutes=30).collect()
    }
    assert stats == {(1, 1): 2, (1, 2): 2, (2, 1): 1}


def test_tumbling_window(spark):
    events = spark.createDataFrame(
        [("click", _ts(0)), ("click", _ts(1800)), ("click", _ts(3700)), ("buy", _ts(0))],
        "event_type string, ts timestamp",
    )
    got = {
        (r.event_type, r.window_start): r.n_events
        for r in sessionize.tumbling_window_agg(events).collect()
    }
    assert got[("click", T0.replace(minute=0))] == 2
    assert got[("click", T0.replace(minute=0) + dt.timedelta(hours=1))] == 1
    assert got[("buy", T0.replace(minute=0))] == 1
