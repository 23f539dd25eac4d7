"""Resample + forward-fill and repetition signals on hand-built fixtures."""

from __future__ import annotations

import datetime as dt

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    textstats,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.resample import (
    resample_ffill,
)

T0 = dt.datetime(2021, 1, 1, 12, 0, 0)  # already 60s-aligned


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_resample_ffill_carries_last_observation(spark):
    df = spark.createDataFrame(
        [(1, _ts(5), 10.0, 100), (1, _ts(65), 20.0, 101), (1, _ts(200), 30.0, 102)],
        "k long, ts timestamp, v double, eid long",
    )
    out = {
        (r.k, r.grid_ts): r.v
        for r in resample_ffill(df, "k", "ts", "v", 60, tie_col="eid").collect()
    }
    # Grid: 12:00:00 (floor of 12:00:05) .. 12:03:20 capped at max → 12:03:00.
    assert out[(1, _ts(0))] is None  # grid-aligned leading point precedes data
    assert out[(1, _ts(60))] == 10.0  # 12:01 carries the 12:00:05 reading
    assert out[(1, _ts(120))] == 20.0  # 12:02 carries 12:01:05
    assert out[(1, _ts(180))] == 20.0  # gap: still carried forward
    assert len(out) == 4


def test_resample_ffill_per_key_bounds_and_ties(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(0), 1.0, 7),
            (1, _ts(0), 2.0, 8),  # same instant: higher eid wins
            (2, _ts(600), 9.0, 9),  # key 2 starts 10 min later
        ],
        "k long, ts timestamp, v double, eid long",
    )
    rows = resample_ffill(df, "k", "ts", "v", 60, tie_col="eid").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append((r.grid_ts, r.v))
    assert by_key[1] == [(_ts(0), 2.0)]  # at-or-before includes same instant
    assert by_key[2] == [(_ts(600), 9.0)]  # grid starts at key 2's own min


def test_repetition_scores_flags_repeats(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # 5 bigrams: "a b"×3, "b a"×2 → all dup
            (2, "w x y z"),  # 3 distinct bigrams
            (3, "solo"),  # <2 tokens → dropped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.repetition_scores(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_grams == 5
    assert out[1].dup_gram_frac == 0.6  # (5-2)/5
    assert out[1].top_gram_share == 0.6  # "a b" holds 3/5
    assert out[2].dup_gram_frac == 0.0
    assert out[2].top_gram_share == round(1 / 3, 6) or abs(
        out[2].top_gram_share - 1 / 3
    ) < 1e-6


def test_align_series_one_clock_many_topics(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.resample import (
        align_series,
    )

    df = spark.createDataFrame(
        [
            (1, _ts(5), "gps", 1.0, 1),
            (1, _ts(70), "imu", 2.0, 2),
            (1, _ts(130), "gps", 3.0, 3),
        ],
        "k long, ts timestamp, topic string, v double, eid long",
    )
    out = {
        r.grid_ts: (r.gps, r.imu)
        for r in align_series(
            df, "k", "ts", "topic", "v", 60, ["gps", "imu"], tie_col="eid"
        ).collect()
    }
    assert out[_ts(0)] == (None, None)  # leading grid point
    assert out[_ts(60)] == (1.0, None)  # gps seen, imu not yet
    assert out[_ts(120)] == (1.0, 2.0)  # both carried forward independently
    assert len(out) == 3  # grid capped at max ts (130 → last point 120)


def test_curation_decisions_reasons(spark):
    long_en = (
        "the quick brown fox jumps over a lazy dog while the keen owl "
        "watches from an old oak tree and the wind carries a faint scent "
        "of rain across the quiet valley where farmers tend their fields"
    )  # healthy: long, english, diverse bigrams
    docs = spark.createDataFrame(
        [
            (1, long_en),
            (2, "short text"),  # < 20 tokens
            (3, "der hund und die katze und der vogel und das haus " * 5),
            (4, "the spam is the spam of spam " * 20),  # en but repetitive
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.reason for r in textstats.curation_decisions(docs).collect()}
    assert out[1] == "keep"
    assert out[2] == "too_short"
    assert out[3] == "wrong_lang"
    assert out[4] == "repetitive"


def test_lm_fluency_ranks_salad_below_fluent(spark):
    """Docs built from the corpus's common bigrams outscore a shuffled
    token salad of the same vocabulary."""
    fluent = "the cat sat on the mat and the cat ran to the mat"
    docs = spark.createDataFrame(
        [
            (1, fluent),
            (2, fluent),
            (3, fluent),
            (4, "mat the on cat sat ran and mat to the cat the"),  # salad
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.mean_logp for r in textstats.lm_fluency_scores(docs).collect()}
    assert out[4] < out[1]
    assert out[1] == out[2] == out[3]


def test_resample_interpolate_linear_and_nulls(spark):
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.resample import (
        resample_interpolate,
    )

    t0 = dt.datetime(2021, 1, 1, 0, 0, 30)  # grid floors to :00
    ev = spark.createDataFrame(
        [
            (1, t0, 0.0, 1),
            (1, t0 + dt.timedelta(seconds=40), 100.0, 2),
        ],
        "user_id long, ts timestamp, value double, event_id long",
    )
    out = {
        r.grid_ts: r.value
        for r in resample_interpolate(
            ev, "user_id", "ts", "value", step_seconds=10, tie_col="event_id"
        ).collect()
    }
    g = dt.datetime(2021, 1, 1, 0, 0, 30)
    # grid: :30 (event, =0), :40 (interp 25), :50 (50), :60 (75), :70 (event 100)
    assert out[g] == 0.0
    assert out[g + dt.timedelta(seconds=10)] == 25.0
    assert out[g + dt.timedelta(seconds=20)] == 50.0
    assert out[g + dt.timedelta(seconds=30)] == 75.0
    assert out[g + dt.timedelta(seconds=40)] == 100.0
    # no extrapolation: leading grid point before the first event is NULL
    lead = dt.datetime(2021, 1, 1, 0, 0, 20)
    assert lead not in out or out[lead] is None


def test_resample_excludes_null_timestamps_and_interp_null_values(spark):
    """NULL-ts events must not forward-fill into leading grid points
    (NULLS-FIRST window order put them before the grid), and a NULL-valued
    event must not desynchronize interpolation's (value, time) neighbor
    pair (regression)."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.resample import (
        resample_interpolate,
    )

    rows = [
        ("k", None, 99.0),
        ("k", T0 + dt.timedelta(seconds=7), 1.0),
        ("k", T0 + dt.timedelta(seconds=130), 2.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    got = {
        r.grid_ts: r.v
        for r in resample_ffill(df, "key", "ts", "v", 60).collect()
    }
    assert got[T0] is None  # leading point NULL, not 99.0

    rows2 = [
        ("k", T0, 10.0),
        ("k", T0 + dt.timedelta(seconds=10), None),  # would desync t0/v0
        ("k", T0 + dt.timedelta(seconds=20), 30.0),
    ]
    df2 = spark.createDataFrame(rows2, "key string, ts timestamp, v double")
    got2 = {
        r.grid_ts: r.v
        for r in resample_interpolate(df2, "key", "ts", "v", 5).collect()
    }
    # t=15s: linear between (0s,10) and (20s,30) -> 25.0 (not 20.0)
    assert got2[T0 + dt.timedelta(seconds=15)] == 25.0
    assert got2[T0 + dt.timedelta(seconds=10)] == 20.0  # interpolated, not "exact"
