"""Round-4 batch-3 operators: native session windows, Markov transitions,
MAD outliers, SCD2 intervals, bigram PMI, interval overlap join."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    quality,
    scd,
    sessionize,
    textstats,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.range_join import (
    interval_overlap_join,
)

T0 = dt.datetime(2021, 1, 1, 12, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


# ---------------------------------------------------------------- sessions


def test_session_window_matches_islands_sessionize(spark):
    """The native session_window form and the lag/cumsum form must agree on
    the same timeline, including at exactly-gap spacing (merge, not break)."""
    rows = [
        (1, _ts(0)),
        (1, _ts(600)),      # exactly 10 min after → same session (strict >)
        (1, _ts(601 + 600)),  # 601s gap → break
        (2, _ts(0)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in sessionize.session_window_stats(
            ev, gap="10 minutes"
        ).collect()
    }
    assert got == {(1, _ts(0)): 2, (1, _ts(1201)): 1, (2, _ts(0)): 1}

    # cross-check against the islands sessionizer
    isl = sessionize.session_stats(ev, gap_minutes=10)
    isl_got = {
        (r.user_id, r.session_start): r.n_events for r in isl.collect()
    }
    assert isl_got == got


def test_transition_matrix_probabilities(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 10, "a"),
            (1, _ts(1), 11, "b"),
            (1, _ts(2), 12, "a"),
            (1, _ts(3), 13, "c"),
            (2, _ts(0), 20, "a"),
            (2, _ts(1), 21, "b"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    out = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in sessionize.transition_matrix(ev).collect()
    }
    # from 'a': a→b twice, a→c once → p = 2/3, 1/3
    assert out[("a", "b")] == (2, round(2 / 3, 6))
    assert out[("a", "c")] == (1, round(1 / 3, 6))
    assert out[("b", "a")] == (1, 1.0)
    # last event of each user emits no transition
    assert ("c", "a") not in out


# ---------------------------------------------------------------- outliers


def test_mad_outliers_robust_to_the_outlier(spark):
    # 9 values at 0..8 plus one wild point; median=4.5? (10 values: 0..8,100)
    vals = list(range(9)) + [1000]
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "grp string, value double"
    )
    row = quality.mad_outliers(df, "grp", "value", k=3.0).collect()[0]
    # median of 0..8,1000 = 4.5; adevs: 4.5,3.5,...,995.5 → MAD small
    assert row.med == 4.5
    assert row.mad == 2.5
    assert row.n_rows == 10
    # only the wild point exceeds 3*MAD=7.5 around the median... check 0: 4.5 ≤ 7.5 ok
    assert row.n_outliers == 1


# ---------------------------------------------------------------- SCD2


def test_change_intervals_runs_and_currency(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "bronze"),
            (1, _ts(10), 2, "bronze"),
            (1, _ts(20), 3, "gold"),
            (1, _ts(30), 4, "bronze"),
            (2, _ts(0), 5, "gold"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    out = scd.change_intervals(
        ev, "user_id", "ts", "event_type", tie_col="event_id"
    )
    rows = {
        (r.user_id, r.version): (
            r.event_type,
            r.valid_from,
            r.valid_to,
            r.is_current,
        )
        for r in out.collect()
    }
    assert rows[(1, 1)] == ("bronze", _ts(0), _ts(20), False)
    assert rows[(1, 2)] == ("gold", _ts(20), _ts(30), False)
    assert rows[(1, 3)] == ("bronze", _ts(30), None, True)
    assert rows[(2, 1)] == ("gold", _ts(0), None, True)
    # intervals tile the timeline: each valid_to equals the next valid_from
    assert len(rows) == 4


def test_change_intervals_point_in_time_lookup(spark):
    """The SCD2 table answers "state at T" as an interval predicate."""
    ev = spark.createDataFrame(
        [(1, _ts(0), 1, "x"), (1, _ts(100), 2, "y")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    ivs = scd.change_intervals(ev, "user_id", "ts", "event_type", "event_id")
    at = ivs.filter(
        (F.col("valid_from") <= F.lit(_ts(50)))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(_ts(50))))
    ).collect()
    assert [(r.user_id, r.event_type) for r in at] == [(1, "x")]


# ---------------------------------------------------------------- PMI


def test_bigram_pmi_favors_exclusive_pairs(spark):
    # "x y" always adjacent and exclusive; "a b" adjacent but a,b also roam
    docs = spark.createDataFrame(
        [(i, "x y a b a c b c a b x y x y a b") for i in range(5)],
        "doc_id long, text string",
    )
    out = {
        (r.w1, r.w2): (r.n_ab, r.pmi)
        for r in textstats.bigram_pmi(docs, min_count=5).collect()
    }
    assert ("x", "y") in out and ("a", "b") in out
    # x→y is deterministic given x; a→b is diluted by a's other contexts
    assert out[("x", "y")][1] > out[("a", "b")][1]
    n_ab, pmi = out[("x", "y")]
    assert n_ab == 15  # 3 occurrences × 5 docs
    # hand-check the formula: ln(n_ab) + 2 ln(Nu) - ln(Nb) - ln(n_x) - ln(n_y)
    nu, nb = 16 * 5, 15 * 5
    expect = (
        math.log(15) + 2 * math.log(nu) - math.log(nb)
        - math.log(15) - math.log(15)
    )
    assert abs(pmi - round(expect, 6)) < 1e-9


# ------------------------------------------------------- interval overlap


def test_interval_overlap_join_exact_once(spark):
    """Pairs spanning multiple shared buckets must appear exactly once;
    non-overlapping intervals never."""
    left = spark.createDataFrame(
        [("L1", _ts(0), _ts(100)), ("L2", _ts(500), _ts(520))],
        "lid string, s_ts timestamp, e_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("R1", _ts(50), _ts(400)),   # overlaps L1 across many 10s buckets
            ("R2", _ts(101), _ts(200)),  # starts after L1 ends → no overlap
            ("R3", _ts(520), _ts(530)),  # touches L2 at the closed boundary
        ],
        "rid string, s_ts timestamp, e_ts timestamp",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "s_ts", "e_ts", "s_ts", "e_ts", bucket_ms=10_000
        ).collect()
    )
    assert got == [("L1", "R1"), ("L2", "R3")]


def test_interval_overlap_join_self_join_dedup(spark):
    """Self-join with a < guard: each unordered pair exactly once even when
    both intervals cover the same long bucket range."""
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(1000)), (2, _ts(10), _ts(990)), (3, _ts(2000), _ts(2100))],
        "iid long, s_ts timestamp, e_ts timestamp",
    )
    out = interval_overlap_join(
        iv,
        iv,
        "s_ts",
        "e_ts",
        "s_ts",
        "e_ts",
        bucket_ms=60_000,
        extra_cond=F.col("iid") < F.col("iid_r"),
    ).collect()
    assert sorted((r.iid, r.iid_r) for r in out) == [(1, 2)]


# ------------------------------------------------------------ forward as-of


def test_asof_join_forward_direction(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.asof import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(20)), (2, _ts(10))],
        "user_id long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "same"), (1, _ts(15), "later"), (2, _ts(5), "past")],
        "user_id long, rts timestamp, val string",
    )
    got = {
        (r.user_id, r.lts): r.val
        for r in asof_join(
            left, right, "user_id", "lts", "rts", ["val"], direction="forward"
        ).collect()
    }
    assert got[(1, _ts(10))] == "same"   # at-or-after includes same ts
    assert got[(1, _ts(20))] is None     # nothing after 20
    assert got[(2, _ts(10))] is None     # only past rows


def test_asof_join_forward_tolerance(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.asof import (
        asof_join,
    )

    left = spark.createDataFrame([(1, _ts(0))], "user_id long, lts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(100), "far")], "user_id long, rts timestamp, val string"
    )
    near = asof_join(
        left, right, "user_id", "lts", "rts", ["val"],
        tolerance_ms=200_000, direction="forward",
    ).collect()[0]
    far = asof_join(
        left, right, "user_id", "lts", "rts", ["val"],
        tolerance_ms=50_000, direction="forward",
    ).collect()[0]
    assert near.val == "far"
    assert far.val is None
