"""Data-quality expectations: one-scan rule checks, quarantine rows, FK."""

from __future__ import annotations

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    quality as Q,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A", "ok"),
            (2, -5.0, "A", "ok"),      # range violation
            (3, 10.0, "X", "ok"),      # set violation
            (4, 99.0, "B", None),      # range + null violations
        ],
        "id long, qty double, flag string, note string",
    )


RULES = None


def _rules():
    return [
        Q.in_range("qty", 0, 50),
        Q.in_set("flag", ["A", "B"]),
        Q.not_null("note"),
    ]


def test_check_rules_single_scan_counts(spark):
    got = {r.rule: (r.n_violations, r.n_rows) for r in Q.check_rules(_df(spark), _rules()).collect()}
    assert got == {
        "qty_in_range": (2, 4),
        "flag_in_set": (1, 4),
        "note_not_null": (1, 4),
    }
    # one scan: the plan contains exactly one aggregate over the source
    plan = Q.check_rules(_df(spark), _rules())._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1


def test_violating_rows_tags(spark):
    got = {r.id: r.failed_rules for r in Q.violating_rows(_df(spark), _rules()).collect()}
    assert got == {
        2: ["qty_in_range"],
        3: ["flag_in_set"],
        4: ["note_not_null", "qty_in_range"],
    }


def test_check_foreign_key(spark):
    child = spark.createDataFrame([(1, 100), (2, 200), (3, 999)], "id long, fk long")
    parent = spark.createDataFrame([(100,), (200,)], "pk long")
    got = Q.check_foreign_key(child, "fk", parent, "pk").collect()
    assert [r.id for r in got] == [3]


def test_profile_columns_one_scan(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        quality as Q,
    )

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 8.0, None), (3, 8.0, "a")],
        "id long, x double, s string",
    )
    out = {r.column: r for r in Q.profile_columns(df).collect()}
    assert out["id"].n_rows == 4
    assert out["id"].n_nulls == 0 and out["id"].n_distinct == 3
    assert out["x"].n_nulls == 1 and out["x"].n_distinct == 2
    assert (out["x"].min_val, out["x"].max_val) == (2.0, 8.0)
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["s"].min_val is None  # non-numeric: no cross-engine min/max


def test_rolling_zscore_flags_spike(spark):
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        quality as Q,
    )

    t0 = dt.datetime(2022, 1, 1)
    rows = [(1, t0 + dt.timedelta(seconds=i), float(10 + (i % 3)), i) for i in range(10)]
    rows.append((1, t0 + dt.timedelta(seconds=10), 1000.0, 10))  # spike
    rows.append((1, t0 + dt.timedelta(seconds=11), 11.0, 11))
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, eid long")
    out = {r.eid: r for r in Q.rolling_zscore_anomalies(df, "k", "ts", "v", "eid").collect()}
    assert out[10].is_anomaly  # the spike
    assert not out[5].is_anomaly
    assert out[2].zscore is None  # < min_history prior points
    assert not out[2].is_anomaly  # null never flags


def test_rolling_zscore_constant_series_never_flags(spark):
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        quality as Q,
    )

    t0 = dt.datetime(2022, 1, 1)
    rows = [(1, t0 + dt.timedelta(seconds=i), 5.0, i) for i in range(15)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, eid long")
    out = Q.rolling_zscore_anomalies(df, "k", "ts", "v", "eid").collect()
    assert all(r.zscore is None for r in out)  # zero variance → no score
    assert not any(r.is_anomaly for r in out)


def test_group_linear_trend_exact_line(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.quality import (
        group_linear_trend,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # group "a": exact line y = 2x + 3 (x in hours)
    for h in range(6):
        rows.append(("a", t0 + dt.timedelta(hours=h), 2.0 * h + 3.0))
    # group "b": constant time (zero variance) -> NULL fit
    rows += [("b", t0, 1.0), ("b", t0, 2.0)]
    # group "c": single point -> NULL fit
    rows.append(("c", t0, 7.0))
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    got = {r.g: r for r in group_linear_trend(df, "g", "ts", "v").collect()}
    assert got["a"].slope == 2.0
    assert got["a"].intercept == 3.0
    assert got["a"].r2 == 1.0
    assert got["b"].slope is None and got["b"].r2 is None
    assert got["c"].slope is None
    assert got["a"].n == 6 and got["b"].n == 2 and got["c"].n == 1


def test_table_diff_classification(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.quality import (
        table_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k long, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "C", 3.0), (4, "d", 4.0)], "k long, s string, v double"
    )
    got = {r.k: r.status for r in table_diff(old, new, "k", ["s", "v"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_schema_diff_reports_drift(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.quality import (
        schema_diff,
    )

    before = spark.createDataFrame([(1, "a", 1.0)], "id long, keep string, widen float")
    after = spark.createDataFrame([(1, "a", 1.0, True)], "id long, keep string, widen double, extra boolean")
    got = {r.column: (r.change, r.before_type, r.after_type)
           for r in schema_diff(before, after).collect()}
    assert got == {
        "widen": ("TYPE_CHANGED", "float", "double"),
        "extra": ("ADDED", None, "boolean"),
    }
    # no drift → empty report
    assert schema_diff(before, before).count() == 0


def test_text_ratios_guard_empty_and_null(spark):
    """Empty text gets ratio 0.0 instead of an ANSI 0/0 abort; NULL text
    stays NULL (regression)."""
    from pyspark.sql import functions as F

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
        text as T,
    )

    df = spark.createDataFrame([("",), (None,), ("Hi there!",)], "t string")
    rows = df.select(
        T.punct_ratio(F.col("t")).alias("p"),
        T.stopword_ratio(F.col("t")).alias("s"),
    ).collect()
    assert rows[0].p == 0.0 and rows[0].s == 0.0
    assert rows[1].p is None
    assert rows[2].p > 0


def test_check_rules_null_passes_and_zscore_min_history_guard(spark):
    """NULL predicate results PASS (SQL CHECK semantics; not_null is the
    explicit opt-in), and min_history=1 must not divide by (n-1)=0
    (regression: ANSI abort on every key's second row)."""
    df = spark.createDataFrame(
        [(1.0,), (None,), (200.0,)], "temp double"
    )
    got = {
        r.rule: r.n_violations
        for r in Q.check_rules(
            df, [Q.in_range("temp", 0, 100), Q.not_null("temp")]
        ).collect()
    }
    assert got["temp_in_range"] == 1  # only 200.0; NULL is not "out of range"
    assert got["temp_not_null"] == 1

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [("k", t0 + dt.timedelta(seconds=i), i, float(i)) for i in range(4)]
    z = Q.rolling_zscore_anomalies(
        spark.createDataFrame(rows, "key string, ts timestamp, tie long, v double"),
        key_col="key", ts_col="ts", tie_col="tie", value_col="v",
        min_history=1,
    ).collect()
    assert len(z) == 4  # no ANSI abort


def test_table_diff_null_and_separator_unambiguous(spark):
    """(x, NULL) vs (NULL, x) and 'a|b','c' vs 'a','b|c' must read as
    changed (regression: concat_ws skipped NULLs and '|' was injectable,
    so both collided to 'unchanged')."""
    old = spark.createDataFrame(
        [(1, "x", None), (2, "a|b", "c")], "k long, c1 string, c2 string"
    )
    new = spark.createDataFrame(
        [(1, None, "x"), (2, "a", "b|c")], "k long, c1 string, c2 string"
    )
    got = {
        r.k: r.status
        for r in Q.table_diff(old, new, "k", ["c1", "c2"]).collect()
    }
    assert got == {1: "changed", 2: "changed"}
