"""Bloom-filter semi-join pruning: no false negatives, effective pruning,
exact-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.bloom import (
    bloom_bitmap,
    bloom_prune,
    bloom_semi_join,
)


def test_no_false_negatives(spark):
    big = spark.range(0, 20000).withColumnRenamed("id", "k")
    small = spark.range(0, 20000, 61).withColumnRenamed("id", "k")
    pruned = set(r.k for r in bloom_prune(big, small, "k").collect())
    truth = set(r.k for r in big.join(small, "k", "left_semi").collect())
    assert truth <= pruned  # every true match survives the filter


def test_pruning_is_effective(spark):
    # Disjoint key spaces: almost everything should be filtered out at the
    # scan (false-positive rate ~(1-e^(-sn/m))^s, tiny at these params).
    big = spark.range(0, 50000).withColumnRenamed("id", "k")
    small = (
        spark.range(0, 500)
        .select((F.col("id") + 10_000_000).alias("k"))
    )
    n = bloom_prune(big, small, "k", m_bits=1 << 20).count()
    assert n < 500  # <1% of 50k leak through


def test_semi_join_equals_plain_join(spark):
    big = (
        spark.range(0, 30000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    )
    small = (
        spark.range(0, 30000, 97)
        .select(F.col("id").alias("k"), F.lit("dim").alias("d"))
    )
    got = bloom_semi_join(big, small, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).first()
    want = big.join(small, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).first()
    assert (got.n, got.sv) == (want.n, want.sv)


def test_bitmap_is_one_bounded_row(spark):
    keys = spark.range(0, 1000).withColumnRenamed("id", "k")
    rows = bloom_bitmap(keys, "k", m_bits=1 << 16, n_hashes=4).collect()
    assert len(rows) == 1
    words = rows[0].bloom
    assert len(words) == (1 << 16) // 64  # dense: exactly m/64 packed words
    assert any(w != 0 for w in words)


def test_persisted_bloom_roundtrip(spark, tmp_path):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.bloom import (
        bloom_prune,
        bloom_prune_with,
        read_bloom,
        write_bloom,
    )

    p = str(tmp_path / "bf")
    small = spark.range(0, 10000, 37).withColumnRenamed("id", "k")
    big = spark.range(0, 10000).withColumnRenamed("id", "k")
    write_bloom(small, "k", p, m_bits=1 << 18, n_hashes=4)
    bf, m, h = read_bloom(spark, p)
    assert (m, h) == (1 << 18, 4)
    from_disk = set(
        r.k for r in bloom_prune_with(big, bf, "k", m, h).collect()
    )
    fresh = set(
        r.k
        for r in bloom_prune(big, small, "k", m_bits=1 << 18, n_hashes=4).collect()
    )
    assert from_disk == fresh  # persisted bitmap == freshly built bitmap
    assert set(range(0, 10000, 37)) <= from_disk
