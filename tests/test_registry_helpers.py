"""The fixed-point fast-sum carrier must match the decimal path exactly.

Regression: ``_fx_long`` was ``round(x*1e6)`` — double arithmetic lands
half-way values like 4.0000005 just below .5 and rounds DOWN, while
``CAST(x AS DECIMAL(18,6))`` (the dsum path and the DuckDB oracle) sees
the shortest decimal repr "4.0000005" and HALF_UPs — a silent 1e-6
divergence on any corpus containing such values. The fix routes the
scaling through the decimal cast itself.
"""

from __future__ import annotations

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.plans import (
    registry,
)

# doubles whose shortest repr is a 7th-decimal half-way value (the class
# round(x*1e6) got wrong), plus ordinary and negative money-like values
ADVERSARIAL = [
    4.0000005,
    16.0000005,
    1048576.0000005,
    8388608.0000005,
    -4.0000005,
    0.1,
    2.675,  # classic double-vs-decimal rounding trap at 2 decimals
    123456.789012,
    -0.0000005,
    0.0,
]


def test_fsum_matches_dsum_on_halfway_values(spark):
    df = spark.createDataFrame([(x,) for x in ADVERSARIAL], "x double")
    from pyspark.sql import functions as F

    row = df.agg(
        registry.fsum(F.col("x"), "fast"),
        registry.dsum(F.col("x"), "exact"),
        registry.favg(F.col("x"), "fast_avg"),
        registry.davg(F.col("x"), "exact_avg"),
    ).collect()[0]
    assert row.fast == row.exact  # bit-for-bit, not approx
    assert row.fast_avg == row.exact_avg


def test_fx_long_matches_decimal_cast_rowwise(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(x,) for x in ADVERSARIAL], "x double")
    rows = df.select(
        registry._fx_long(F.col("x")).alias("fx"),
        (F.col("x").cast("decimal(18,6)") * 1000000)
        .cast("long")
        .alias("dec"),
    ).collect()
    for r in rows:
        assert r.fx == r.dec
