"""Bit-equality of the vector helpers' str fast path vs the Column form.

Round-21 optimization: ``functions/vectors.py`` helpers accept a plain
column NAME and build the whole expression as one memoized SQL-text
``F.expr`` (one parser round trip) instead of ~10 py4j round trips per
higher-order function. These tests pin the contract that made the rewrite
safe: identical values (bit-equal doubles, not approx), identical NULL
semantics for degenerate vectors, and the identifier guard that keeps
non-identifier strings on the old Column path.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (  # noqa: E501
    vectors as V,
)

ROWS = [
    ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
    ([0.1, -0.2, 0.3], [-0.4, 0.5, -0.6]),
    ([1e-8, 2e8, -3.5], [7.25, -0.125, 9.75]),
    ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),  # zero vector -> NULL norm
    (None, [1.0, 2.0, 3.0]),  # NULL vector propagates
]


def _df(spark):
    return spark.createDataFrame(ROWS, "a array<double>, b array<double>")


def test_str_and_column_forms_bit_equal(spark):
    df = _df(spark)
    got = df.select(
        V.dot("a", "b").alias("d_s"),
        V.dot(F.col("a"), F.col("b")).alias("d_c"),
        V.norm("a").alias("n_s"),
        V.norm(F.col("a")).alias("n_c"),
        V.l2sq("a", "b").alias("l_s"),
        V.l2sq(F.col("a"), F.col("b")).alias("l_c"),
        V.cosine("a", "b").alias("c_s"),
        V.cosine(F.col("a"), F.col("b")).alias("c_c"),
    ).collect()
    for r in got:
        for s, c in (("d_s", "d_c"), ("n_s", "n_c"), ("l_s", "l_c"), ("c_s", "c_c")):
            a, b = r[s], r[c]
            if a is None or b is None:
                assert a is None and b is None
            else:
                # bit-equal, not approx: same fold order, same casts
                assert math.isclose(a, b, rel_tol=0.0, abs_tol=0.0) or a == b
                assert struct_bits(a) == struct_bits(b)


def struct_bits(x: float) -> bytes:
    import struct

    return struct.pack("<d", x)


def test_zero_norm_is_null_both_forms(spark):
    df = _df(spark)
    r = df.select(
        V.norm("a").alias("s"), V.norm(F.col("a")).alias("c")
    ).collect()[3]
    assert r["s"] is None and r["c"] is None


def test_non_identifier_strings_fall_back(spark):
    # A name needing resolution beyond a plain identifier must NOT be
    # spliced into SQL text; the guard routes it down the Column path.
    assert not V._ident("a.b")
    assert not V._ident("a b")
    assert not V._ident("`a`")
    assert not V._ident("1a")
    assert V._ident("vec_col")
    # Fallback still resolves like F.col: rename to something guard-safe
    df = _df(spark).withColumnRenamed("a", "va")
    got = df.select(V.norm("va").alias("n")).collect()
    assert got[0]["n"] is not None


def test_expr_cache_reuse_across_plans(spark):
    # The memoized Column handle is shared between plans; both must resolve
    # independently (expression fragments carry no plan binding).
    d1 = _df(spark).select(V.dot("a", "b").alias("x"))
    d2 = _df(spark).withColumn("a", F.col("b")).select(V.dot("a", "b").alias("x"))
    v1 = [r["x"] for r in d1.collect()]
    v2 = [r["x"] for r in d2.collect()]
    assert v1[0] == 32.0  # 1*4+2*5+3*6
    assert v2[0] == 4.0 * 4 + 5 * 5 + 6 * 6
