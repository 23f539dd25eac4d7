"""stats.py operators + curation.nucleus_keep on hand-checked inputs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    curation,
    stats,
)


def test_fixed_width_histogram_bins_and_clamp(spark):
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 5.0), ("a", 9.9), ("b", 10.0)],
        "grp string, value double",
    )
    # global range [0,10], 10 bins of width 1; max value clamps into bin 9
    out = {
        (r.grp, r.bin): r.n
        for r in stats.fixed_width_histogram(
            df, "value", n_bins=10, group_col="grp"
        ).collect()
    }
    assert out == {("a", 0): 1, ("a", 5): 1, ("a", 9): 1, ("b", 9): 1}


def test_pearson_correlation_exact_signs(spark):
    rows = [("g", float(i), float(2 * i + 1)) for i in range(10)]
    anti = [("h", float(i), float(-3 * i)) for i in range(10)]
    df = spark.createDataFrame(rows + anti, "grp string, x double, y double")
    out = {r.grp: r.r for r in stats.pearson_correlation(df, "x", "y", "grp").collect()}
    assert out["g"] == 1.0  # perfectly linear
    assert out["h"] == -1.0


def test_chi2_independent_distribution_is_zero(spark):
    # perfectly independent 2x2: chi2 terms all 0
    rows = [("x", "u")] * 4 + [("x", "v")] * 4 + [("y", "u")] * 4 + [("y", "v")] * 4
    df = spark.createDataFrame(rows, "a string, b string")
    out = stats.chi2_independence(df, "a", "b").collect()
    assert all(r.chi2_term == 0.0 for r in out)
    assert all(r.expected == 4.0 for r in out)


def test_chi2_dependent_cells_positive(spark):
    rows = [("x", "u")] * 8 + [("y", "v")] * 8
    df = spark.createDataFrame(rows, "a string, b string")
    out = stats.chi2_independence(df, "a", "b").collect()
    # diagonal-only table: expected 4 everywhere, observed 8 → term (8-4)²/4 = 4
    assert sorted(r.chi2_term for r in out) == [4.0, 4.0]


def test_token_entropy_uniform_vs_degenerate(spark):
    docs = spark.createDataFrame(
        [("flat", "a b c d"), ("loop", "a a a a")],
        "source string, text string",
    )
    out = {
        r.grp: (r.n_tokens, r.n_distinct, r.entropy_nats)
        for r in stats.token_entropy_by_group(docs, "source").collect()
    }
    assert out["flat"] == (4, 4, round(math.log(4), 6))
    assert out["loop"] == (4, 1, 0.0)


def test_rfm_scores_orientation(spark):
    import datetime as dt

    d = dt.datetime(2024, 1, 1)
    rows = []
    # customer 1: recent, frequent, big spender; customer 2: stale single cheap
    for i in range(5):
        rows.append((1, d + dt.timedelta(days=360 + i), 1000.0))
    rows.append((2, d, 10.0))
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {r.o_custkey: r for r in stats.rfm_scores(orders).collect()}
    assert out[1].r_score > out[2].r_score
    assert out[1].f_score > out[2].f_score
    assert out[1].m_score > out[2].m_score
    assert out[2].recency_days == 364
    assert 1 <= out[2].r_score <= 5


def test_nucleus_keep_coverage_bound(spark):
    docs = spark.createDataFrame(
        [(1, "s", 50), (2, "s", 30), (3, "s", 15), (4, "s", 5)],
        "doc_id long, source string, n_chars long",
    )
    kept = curation.nucleus_keep(docs, p=0.9).collect()
    ids = sorted(r.doc_id for r in kept)
    # total 100; 0.9 coverage: 50+30=80 < 90 → include 15 (cum 95) → stop
    assert ids == [1, 2, 3]
    # coverage met, never undershot
    assert sum(r.n_chars for r in kept) >= 90


def test_equi_depth_histogram_balanced(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.stats import (
        equi_depth_histogram,
    )

    out = {r.bin: r.n for r in equi_depth_histogram(df, "v", n_bins=10).collect()}
    assert len(out) == 10
    # uniform data → each decile bin holds ~10 rows
    assert all(9 <= n <= 11 for n in out.values())
    assert sum(out.values()) == 100


def test_fixed_width_histogram_nulls_excluded_and_degenerate_width(spark):
    # NULLs have no bin — they must not be clamped into the last bin
    df = spark.createDataFrame(
        [(0.0,), (None,), (10.0,), (None,)], "value double"
    )
    out = {r.bin: r.n for r in stats.fixed_width_histogram(df, "value", n_bins=5).collect()}
    assert out == {0: 1, 4: 1}  # 2 NULL rows gone, not in bin 4
    # min == max (width 0): everything lands in the single bin 0
    flat = spark.createDataFrame([(3.0,)] * 4 + [(None,)], "value double")
    out = {r.bin: r.n for r in stats.fixed_width_histogram(flat, "value", n_bins=5).collect()}
    assert out == {0: 4}


def test_chi2_independence_null_categories_excluded(spark):
    # NULL-keyed rows must not inflate the grand total: with them dropped,
    # the remaining 2x2 is perfectly independent → all chi2 terms zero.
    rows = (
        [("x", "u")] * 4 + [("x", "v")] * 4
        + [("y", "u")] * 4 + [("y", "v")] * 4
        + [(None, "u")] * 3 + [("x", None)] * 2
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = stats.chi2_independence(df, "a", "b").collect()
    assert len(out) == 4
    assert all(r.expected == 4.0 for r in out)
    assert all(r.chi2_term == 0.0 for r in out)


def test_pearson_complete_cases_and_constant_column(spark):
    """Rows with a NULL x or y are excluded from ALL moments including n,
    and a constant column yields r=NULL instead of an ANSI divide-by-zero
    abort (regression)."""
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (None, 3.0), (4.0, None)],
        "x double, y double",
    )
    row = stats.pearson_correlation(df, "x", "y").collect()[0]
    assert row.n == 2
    assert row.r == 1.0  # perfect correlation over the complete pairs

    const = spark.createDataFrame(
        [(5.0, 1.0), (5.0, 2.0), (5.0, 3.0)], "x double, y double"
    )
    row = stats.pearson_correlation(const, "x", "y").collect()[0]
    assert row.r is None


def test_rfm_excludes_incomplete_orders(spark):
    """A customer with only NULL-dated orders must not surface with the
    BEST recency score (regression: NULL banded to r_score=5)."""
    rows = (
        [(1, f"2024-01-{d:02d}", 100.0) for d in range(1, 6)]
        + [(2, "2024-01-01", 50.0)]
        + [(3, None, 999.0)]
        + [(2, None, 10.0)]  # incomplete row for an otherwise-valid cust
    )
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string, o_totalprice double"
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    got = {r.o_custkey: r for r in stats.rfm_scores(orders).collect()}
    assert 3 not in got  # no complete orders -> absent, not top-scored
    assert got[2].frequency == 1  # NULL-dated order not counted
    assert got[1].r_score >= got[2].r_score


def test_equi_depth_histogram_excludes_nulls(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 11)] + [(None,)] * 5, "v double"
    )
    bins = {r.bin: r.n for r in stats.equi_depth_histogram(df, "v", n_bins=2).collect()}
    assert sum(bins.values()) == 10  # NULLs not silently piled into bin 0
