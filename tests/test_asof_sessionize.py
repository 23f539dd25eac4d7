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


def test_scd2_lookup_picks_effective_version(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.asof import (
        scd2_lookup,
    )

    dim = spark.createDataFrame(
        [
            (1, _ts(0), _ts(100), "bronze"),
            (1, _ts(100), None, "gold"),  # open current version
            (2, _ts(50), _ts(60), "silver"),
        ],
        "user_id long, valid_from timestamp, valid_to timestamp, tier string",
    )
    facts = spark.createDataFrame(
        [(1, _ts(99)), (1, _ts(100)), (1, _ts(500)), (2, _ts(10)), (2, _ts(60))],
        "user_id long, fts timestamp",
    )
    got = {
        (r.user_id, r.fts): r.tier
        for r in scd2_lookup(facts, dim, "user_id", "fts").collect()
    }
    assert got[(1, _ts(99))] == "bronze"  # end-exclusive boundary
    assert got[(1, _ts(100))] == "gold"  # start-inclusive
    assert got[(1, _ts(500))] == "gold"  # open-ended current
    assert got[(2, _ts(10))] is None  # before first version
    assert got[(2, _ts(60))] is None  # after closed version


def test_event_pattern_match_order_and_regex(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.sessionize import (
        event_pattern_match,
    )

    ev = spark.createDataFrame(
        [
            # user 1: view → click → purchase (matches v.*c.*p)
            (1, _ts(1), "view", 10),
            (1, _ts(2), "click", 11),
            (1, _ts(3), "purchase", 12),
            # user 2: purchase first — order matters
            (2, _ts(1), "purchase", 20),
            (2, _ts(2), "view", 21),
            (2, _ts(3), "click", 22),
            # user 3: same-ts tie broken by event_id (click before purchase)
            (3, _ts(5), "click", 30),
            (3, _ts(5), "purchase", 31),
        ],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    got = {
        r.user_id: r.seq
        for r in event_pattern_match(ev, "v.*c.*p|cp").collect()
    }
    assert got == {1: "vcp", 3: "cp"}


def test_event_pattern_match_hot_key_cap(spark):
    """A skewed key's sequence is capped at the earliest max_events events
    — bounded per-task string, deterministic prefix semantics."""
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.sessionize import (
        event_pattern_match,
    )

    t0 = dt.datetime(2022, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(seconds=i), "x" if i else "a", i)
        for i in range(50)
    ]  # hot key: 'a' then 49 'x'
    rows += [(2, t0, "a", 0), (2, t0 + dt.timedelta(seconds=1), "b", 1)]
    ev = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string, event_id int"
    )
    capped = {
        r.user_id: r.seq
        for r in event_pattern_match(ev, ".*", max_events=5).collect()
    }
    assert capped[1] == "axxxx"  # earliest 5 events, time order
    assert capped[2] == "ab"  # under-cap keys unaffected
    uncapped = {
        r.user_id: r.seq
        for r in event_pattern_match(ev, ".*", max_events=None).collect()
    }
    assert len(uncapped[1]) == 50


def test_asof_null_keys_and_timestamps_match_nothing(spark):
    """NULL join keys never match each other, a NULL-ts left row is kept
    but unmatched (forward mode handed it the min-ts right row), and
    NULL-ts right rows are ignored (regression)."""
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.asof import (
        asof_join,
    )

    t = lambda s: dt.datetime(2024, 1, 1, 10, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(None, t(10), "null-key"), ("k", None, "null-ts"), ("k", t(10), "ok")],
        "on string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(None, t(9), 5.0), ("k", None, 6.0), ("k", t(8), 7.0)],
        "on string, ts timestamp, v double",
    )
    for direction in ("backward", "forward"):
        got = {
            r.tag: r.v
            for r in asof_join(
                left, right, "on", "ts", "ts", ["v"], direction=direction
            ).collect()
        }
        assert len(got) == 3  # left-join: every left row kept
        assert got["null-key"] is None
        assert got["null-ts"] is None
        assert got["ok"] == (7.0 if direction == "backward" else None)


def test_sessionize_and_transitions_exclude_null_rows(spark):
    """NULL-ts events no longer create phantom singleton sessions, and a
    NULL event type no longer asymmetrically skews the transition matrix
    (regression)."""
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sessionize as sz,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    ev = spark.createDataFrame(
        [(1, None), (1, None), (1, t0), (1, t0 + dt.timedelta(minutes=5))],
        "user_id long, ts timestamp",
    )
    stats = sz.session_stats(ev, gap_minutes=30).collect()
    assert len(stats) == 1 and stats[0].n_events == 2

    ev2 = spark.createDataFrame(
        [
            (1, 1, t0, "A"),
            (1, 2, t0 + dt.timedelta(seconds=1), None),
            (1, 3, t0 + dt.timedelta(seconds=2), "B"),
        ],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    tm = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in sz.transition_matrix(ev2).collect()
    }
    assert tm == {("A", "B"): (1, 1.0)}  # A->B of the observable sequence


def test_scd_null_value_periods_tracked(spark):
    """A value→NULL transition starts a NULL validity period (previously
    absorbed into the prior run), and consecutive NULLs don't split
    (regression: NULL-unsafe inequality)."""
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.scd import (
        change_intervals,
    )

    t = lambda i: dt.datetime(2024, 1, 1 + i)  # noqa: E731
    ev = spark.createDataFrame(
        [(1, t(0), "A"), (1, t(1), None), (1, t(2), None), (1, t(3), "A")],
        "k long, ts timestamp, attr string",
    )
    runs = sorted(
        (r.valid_from, r.attr)
        for r in change_intervals(ev, "k", "ts", "attr").collect()
    )
    assert runs == [(t(0), "A"), (t(1), None), (t(3), "A")]
