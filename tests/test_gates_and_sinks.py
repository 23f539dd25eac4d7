"""The verification gate's canonicalization and the binary export sink.

A bug in the gate silently invalidates every green result, so its
encoding must be collision-free; the sink must confine writes and
tolerate NULL identity (regressions from review)."""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import canon, table_digest  # noqa: E402


def test_canon_is_collision_free():
    # separator injection: ('a|b','c') must differ from ('a','b|c')
    h1, _ = table_digest(["x", "y"], [("a|b", "c")])
    h2, _ = table_digest(["x", "y"], [("a", "b|c")])
    assert h1 != h2
    # array element injection
    assert canon(["a,b"]) != canon(["a", "b"])
    assert canon([1, 23]) != canon([12, 3])
    # SQL NULL vs the literal string "NULL"
    assert canon(None) != canon("NULL")
    # the NULL token itself as a literal string
    assert canon(None) != canon("␀")
    # inf must not crash (previously OverflowError aborted the gate run)
    assert canon(float("inf")) == "inf"
    assert canon(float("-inf")) == "-inf"
    # tz-aware timestamps normalize to UTC, not just drop the offset
    utc = dt.timezone.utc
    plus2 = dt.timezone(dt.timedelta(hours=2))
    a = dt.datetime(2024, 1, 1, 12, 0, tzinfo=utc)
    b = dt.datetime(2024, 1, 1, 12, 0, tzinfo=plus2)  # different instant
    assert canon(a) != canon(b)
    assert canon(a) == canon(dt.datetime(2024, 1, 1, 14, 0, tzinfo=plus2))


def test_digest_crash_isolated_per_query():
    # a value the renderer can't handle fails that query, not the run
    class Weird:
        def __str__(self):
            raise RuntimeError("boom")

    try:
        table_digest(["x"], [(Weird(),)])
    except RuntimeError:
        pass  # raised — main() wraps this per query now


def test_frame_filename_never_truncates(spark):
    """%04d keeps all digits: frame 10000 must not collide with frame
    1000's filename (lpad truncated to width 4 — silent overwrite)."""
    from pyspark.sql import functions as F  # noqa: F401

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sinks,
    )

    df = spark.createDataFrame(
        [("b", "left", 7), ("b", "left", 1000), ("b", "left", 10000)],
        "bag_id string, camera string, frame_index int",
    )
    names = {
        r.frame_index: r.n
        for r in df.withColumn("n", sinks.frame_filename()).collect()
    }
    assert names[7] == "b/left0007.png"
    assert names[1000] == "b/left1000.png"
    assert names[10000] == "b/left10000.png"  # not "b/left1000.png"


def test_export_confines_and_skips_null_filenames(spark, tmp_path):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sinks,
    )

    dest = str(tmp_path / "out")
    escape_target = tmp_path / "evil.png"
    rows = [
        ("ok/left0001.png", bytearray(b"good")),
        (None, bytearray(b"null-name")),
        ("../evil.png", bytearray(b"escape")),
        (f"{tmp_path}/evil.png", bytearray(b"absolute")),
    ]
    df = spark.createDataFrame(rows, "filename string, annotated binary")
    sinks.export_binary_files(df, dest)
    assert (tmp_path / "out" / "ok" / "left0001.png").read_bytes() == b"good"
    # neither the ../ traversal nor the absolute path wrote OUTSIDE dest
    assert not escape_target.exists()
    for r, _d, fs in os.walk(dest):
        assert os.path.abspath(r).startswith(os.path.abspath(dest))
