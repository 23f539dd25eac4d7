"""Skew helpers: salted join and two-stage distinct equal their plain twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    skew,
)


def test_salted_join_matches_plain_join(spark):
    # one hot key (0) dominating the big side
    big = spark.createDataFrame(
        [(i % 3 if i % 10 else 0, i) for i in range(500)], "k long, v long"
    )
    small = spark.createDataFrame([(0, "hot"), (1, "a"), (2, "b")], "k long, name string")
    plain = {(r.k, r.v, r.name) for r in big.join(small, ["k"]).collect()}
    salted = {(r.k, r.v, r.name) for r in skew.salted_join(big, small, ["k"]).collect()}
    assert salted == plain and len(plain) == 500

    # semi form: salted big-side semi join equals the plain one
    plain_semi = {(r.k, r.v) for r in big.join(small, ["k"], "left_semi").collect()}
    salted_semi = {
        (r.k, r.v)
        for r in skew.salted_join(big, small, ["k"], how="left_semi").collect()
    }
    assert salted_semi == plain_semi

    # join types where small-side replication is unsound are rejected
    import pytest

    with pytest.raises(ValueError, match="salted_join supports"):
        skew.salted_join(big, small, ["k"], how="full_outer")


def test_salted_count_distinct_exact(spark):
    df = spark.createDataFrame(
        [("g1", i % 37) for i in range(400)] + [("g2", i % 5) for i in range(50)],
        "g string, v long",
    )
    want = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("n")).collect()
    }
    got = {r.g: r.n_distinct for r in skew.salted_count_distinct(df, "g", "v").collect()}
    assert got == want == {"g1": 37, "g2": 5}


def test_key_skew_report_flags_hot_key(spark):
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.skew import (
        key_skew_report,
    )

    # 1000 rows on one hot key + 100 keys with 2 rows each
    df = spark.range(1200).select(
        F.when(F.col("id") < 1000, F.lit(0))
        .otherwise((F.col("id") % 100) + 1)
        .alias("k")
    )
    r = key_skew_report(df, "k").first()
    assert r.n_keys == 101
    assert r.total_rows == 1200
    assert r.max_key_rows == 1000
    assert r.p50_key_rows == 2.0
    assert abs(r.top_key_share - 1000 / 1200) < 1e-12
    assert r.skew_ratio == 500.0


def test_key_skew_report_counts_null_keys(spark):
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.skew import (
        key_skew_report,
    )

    df = spark.range(10).select(
        F.when(F.col("id") < 8, F.lit(None).cast("bigint"))
        .otherwise(F.col("id"))
        .alias("k")
    )
    r = key_skew_report(df, "k").first()
    assert r.n_keys == 3  # NULL is a key (the classic hot key)
    assert r.max_key_rows == 8
