"""P1-P4 topic flatten + K1 partitioned landing write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    flatten,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources import (
    fixtures,
)


@pytest.fixture(scope="module")
def messages(spark):
    return fixtures.topic_messages(spark, n_bags=2, duration_s=2)


def test_validate_topics_raises_on_non_whitelist():
    with pytest.raises(ValueError):
        flatten.validate_topics(["/imu", "/not_a_topic"])


def test_distinct_topics(spark, messages):
    got = {r.topic for r in flatten.distinct_topics(messages).collect()}
    assert got == set(fixtures._TOPIC_RATES)


def test_topic_filter(spark, messages):
    got = flatten.topic_filter(messages, ["/imu", "/gps"])
    assert {r.topic for r in got.select("topic").distinct().collect()} == {"/imu", "/gps"}


def test_widen_topic_typed_columns(spark, messages):
    wide = flatten.widen_topic(messages, "/imu")
    types = dict(wide.dtypes)
    assert types["orientation_x"] == "double"
    assert wide.columns[1] == "rosbagTimestamp"  # first data col, bag_to_csv.py:126
    n = messages.filter(F.col("topic") == "/imu").count()
    assert wide.count() == n
    # values survive the map lookup + cast
    row = wide.orderBy("bag_id", "rosbagTimestamp").first()
    raw = (
        messages.filter((F.col("topic") == "/imu"))
        .orderBy("bag_id", "rosbagTimestamp")
        .first()
    )
    assert row.orientation_x == pytest.approx(float(raw.payload["orientation.x"]))


def test_infer_payload_keys_union(spark, messages):
    keys = flatten.infer_payload_keys(messages, "/gps")
    assert keys == sorted(
        {"latitude", "longitude", "altitude", "status.status", "status.service"}
    )


def test_partitioned_write_and_pruned_read(spark, messages, tmp_path):
    dest = str(tmp_path / "landing")
    flatten.write_partitioned(messages, dest)
    back = spark.read.parquet(dest)
    assert back.count() == messages.count()
    # partition pruning: the filter reaches the scan as a PartitionFilter
    pruned = back.filter(F.col("topic") == "/imu")
    assert pruned.count() == messages.filter(F.col("topic") == "/imu").count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "/imu" in plan


def test_widen_topic_across_evolving_bag_schemas(spark, tmp_path):
    """Per-bag inferred schemas drift (the reference infers from each bag's
    first message, bag_to_csv.py:114-130); the landing read must merge
    them — new fields appear as nulls on old rows."""
    p = str(tmp_path / "landing")
    b1 = spark.createDataFrame(
        [("bag1", "/gps", 1, 1.0)], "bag_id string, topic string, ts long, lat double"
    )
    b2 = spark.createDataFrame(
        [("bag2", "/gps", 2, 2.0, 9.9)],
        "bag_id string, topic string, ts long, lat double, alt double",
    )
    b1.write.mode("append").parquet(p)
    b2.write.mode("append").parquet(p)
    got = {
        r.bag_id: (r.lat, r.alt)
        for r in spark.read.option("mergeSchema", True).parquet(p).collect()
    }
    assert got == {"bag1": (1.0, None), "bag2": (2.0, 9.9)}
