"""Bucketed-table layout: joins and aggregations run without an Exchange."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    layout,
)


@pytest.fixture()
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    layout.write_bucketed(
        orders, "b_orders", "o_custkey", n_buckets=8, path=str(wh / "o")
    )
    layout.write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", "o_custkey", n_buckets=8, path=str(wh / "c"),
    )
    yield orders, cust
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_no_exchange(spark, bucketed):
    orders, cust = bucketed
    j = layout.bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # the whole point of the layout
    want = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    ).count()
    assert j.count() == want


def test_bucketed_groupby_no_exchange(spark, bucketed):
    orders, _ = bucketed
    agg = spark.table("b_orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == orders.select("o_custkey").distinct().count()
