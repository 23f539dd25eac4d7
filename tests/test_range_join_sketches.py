"""Range join vs brute force; KMV sketch accuracy and exactness regimes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.range_join import (
    range_join,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.sketches import (
    kmv_distinct,
)

T0 = dt.datetime(2021, 1, 1, 12, 0, 0)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_range_join_matches_bruteforce(spark):
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)

    lefts = [(i % 3, _ts(h(f"l{i}") % 600), i) for i in range(40)]
    rights = [(i % 3, _ts(h(f"r{i}") % 600), 100 + i) for i in range(40)]
    left = spark.createDataFrame(lefts, "k long, lts timestamp, lid long")
    right = spark.createDataFrame(rights, "k long, rts timestamp, rid long")
    tol = 30_000
    got = {
        (r.lid, r.rid)
        for r in range_join(left, right, "k", "lts", "rts", tol).collect()
    }
    want = {
        (lid, rid)
        for lk, lt, lid in lefts
        for rk, rt, rid in rights
        if lk == rk and abs((lt - rt).total_seconds()) * 1000 <= tol
    }
    assert got == want and want


def test_range_join_exactly_once_per_pair(spark):
    """Bucket boundaries must not duplicate pairs."""
    left = spark.createDataFrame([(1, _ts(60), 1)], "k long, lts timestamp, lid long")
    right = spark.createDataFrame(
        [(1, _ts(30), 2), (1, _ts(60), 3), (1, _ts(89), 4)],
        "k long, rts timestamp, rid long",
    )
    rows = range_join(left, right, "k", "lts", "rts", 30_000).collect()
    assert sorted(r.rid for r in rows) == [2, 3, 4]  # each pair once


def test_kmv_exact_below_k_and_close_above(spark):
    rows = [("small", f"u{i}") for i in range(20)] + [
        ("big", f"v{i}") for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, u string")
    got = {r.g: (r.n_kept, r.est_distinct) for r in kmv_distinct(df, "g", "u", k=64).collect()}
    assert got["small"] == (20, 20.0)  # exact below k
    n_kept, est = got["big"]
    assert n_kept == 64
    assert est == pytest.approx(5000, rel=0.25)  # KMV σ ≈ 1/√(k-2) ≈ 12.6%


def test_bottomk_sample_merge_invariance(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    property that lets shard/day samples fold without resampling."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sketches,
    )

    rows = [("g", i, float(i % 17)) for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    a = df.filter("id < 150")
    b = df.filter("id >= 150")
    k = 32

    direct = sketches.bottomk_sample(df, "grp", "id", "v", k)
    folded = sketches.bottomk_sample(
        sketches.bottomk_sample(a, "grp", "id", "v", k).unionByName(
            sketches.bottomk_sample(b, "grp", "id", "v", k)
        ),
        "grp",
        "id",
        "v",
        k,
    )
    assert {tuple(r) for r in direct.collect()} == {
        tuple(r) for r in folded.collect()
    }
    assert direct.count() == k


def test_sampled_quantiles_exact_when_small(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sketches,
    )

    rows = [("g", i, float(i)) for i in range(101)]  # 0..100
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    out = sketches.sampled_quantiles(
        df, "grp", "id", "v", [0.5], ["p50"], k=256
    ).collect()[0]
    assert out.n_sample == 101
    assert out.p50 == 50.0  # ≤ k rows → sample is the population → exact


def test_cms_overestimates_and_merges(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sketches,
    )
    from pyspark.sql import functions as F

    words = ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + ["d"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("x",)], "w string")

    sketch = sketches.cms_build(df, "w", depth=4, width=64)
    est = {
        r.w: r.est_count
        for r in sketches.cms_estimate(sketch, probes, "w", width=64).collect()
    }
    true = {"a": 50, "b": 30, "c": 5, "d": 1, "x": 0}
    for w, t in true.items():
        assert est[w] >= t  # CMS never underestimates
        assert est[w] <= t + len(words)  # and is bounded by N

    # mergeability: sketch(A) + sketch(B) == sketch(A ∪ B), bucket-for-bucket
    a = spark.createDataFrame([(w,) for w in words[:40]], "w string")
    b = spark.createDataFrame([(w,) for w in words[40:]], "w string")
    merged = (
        sketches.cms_build(a, "w", depth=4, width=64)
        .unionByName(sketches.cms_build(b, "w", depth=4, width=64))
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    direct = sketches.cms_build(df, "w", depth=4, width=64)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_hll_merge_equals_whole(spark):
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sketches as SK,
    )

    df = spark.range(0, 10000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 997).alias("v")
    )
    whole = {
        r.g: r.n_distinct_est
        for r in SK.hll_estimate(SK.hll_sketches(df, "g", "v"), "g").collect()
    }
    # split into two halves, sketch each, merge the partials
    halves = SK.hll_sketches(df.filter(F.col("id") < 5000), "g", "v").union(
        SK.hll_sketches(df.filter(F.col("id") >= 5000), "g", "v")
    )
    merged = {
        r.g: r.n_distinct_est
        for r in SK.hll_estimate(SK.hll_merge(halves, "g"), "g").collect()
    }
    assert merged == whole  # mergeable: union of partials == one-shot sketch
    exact = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("n")).collect()
    }
    for g, est in whole.items():
        assert abs(est - exact[g]) <= 0.03 * exact[g]

def test_kmv_and_bottomk_exclude_nulls(spark):
    """NULL values/ids must not enter the sketches: md5_long(NULL)=NULL
    ranks FIRST under the ascending window, so without the filter a NULL
    inflates small-group KMV estimates and hijacks the bottom-k sample
    (regression)."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sketches,
    )

    df = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", None), ("h", None)],
        "grp string, v string",
    )
    got = {
        r.grp: (r.n_kept, r.est_distinct)
        for r in sketches.kmv_distinct(df, "grp", "v", k=8).collect()
    }
    assert got["g"] == (2, 2.0)  # NULL not a third distinct value
    assert "h" not in got  # all-NULL group vanishes (COUNT DISTINCT = 0)

    ids = spark.createDataFrame(
        [("g", None, 9.0)] * 5 + [("g", "id1", 1.0), ("g", "id2", 2.0)],
        "grp string, id string, v double",
    )
    sample = sketches.bottomk_sample(ids, "grp", "id", "v", k=2).collect()
    assert sorted(r.id for r in sample) == ["id1", "id2"]  # no NULL rows


def test_cms_empty_sketch_and_null_values(spark):
    """An empty sketch estimates 0 for every probe (one row per probe,
    not an empty frame), and NULL values stay out of the sketch so no
    dead unreachable buckets accumulate (regression)."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sketches,
    )

    empty = spark.createDataFrame([], "v string")
    sketch = sketches.cms_build(empty, "v")
    probes = spark.createDataFrame([("x",), ("y",)], "v string")
    got = {
        r.v: r.est_count
        for r in sketches.cms_estimate(sketch, probes, "v").collect()
    }
    assert got == {"x": 0, "y": 0}

    with_nulls = spark.createDataFrame(
        [("a",), (None,), (None,)], "v string"
    )
    s2 = sketches.cms_build(with_nulls, "v", depth=2, width=16)
    # 2 depths x 1 live value: no NULL-bucket rows
    assert s2.count() == 2
    est = {
        r.v: r.est_count
        for r in sketches.cms_estimate(
            s2, spark.createDataFrame([("a",)], "v string"), "v", width=16
        ).collect()
    }
    assert est["a"] >= 1


def test_range_join_zero_tolerance_and_validation(spark):
    """tolerance_ms=0 means exactly-simultaneous pairs (previously an
    ANSI divide-by-zero abort); negatives are rejected upfront."""
    import datetime as dt

    import pytest

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.range_join import (
        range_join,
    )

    t = dt.datetime(2024, 1, 1, 10, 0, 0)
    left = spark.createDataFrame(
        [("k", t, 1)], "on string, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [("k", t, 10), ("k", t + dt.timedelta(milliseconds=1), 11)],
        "on string, ts timestamp, rid long",
    )
    got = range_join(left, right, "on", "ts", "ts", tolerance_ms=0).collect()
    assert [r.rid for r in got] == [10]
    with pytest.raises(ValueError, match="tolerance_ms"):
        range_join(left, right, "on", "ts", "ts", tolerance_ms=-5)
