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
