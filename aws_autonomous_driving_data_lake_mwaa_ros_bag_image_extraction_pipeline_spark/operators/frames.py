"""Frame-identity derivation + data-quality audits (P5-P8, A4, A5).

Reference: camera/index parsed from the filename with regexes
(processing.py:206-207), absolute frame time = bag-prefix date + index × 67 ms
(processing.py:192,210-221); frame-continuity audit and run-diff in
check_pngs.py:1970-2002.

Spark-first: regex/interval column expressions (codegen, no shuffle) and a
single window pass for the gap audit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FRAME_MS = 67  # hard-coded frame_duration (processing.py:192) ≈ 15 fps


def parse_camera(filename: Column) -> Column:
    """Leading alpha run = camera (processing.py:206 — P7)."""
    return F.regexp_extract(filename, r"^([A-Za-z]+)", 1)


def parse_frame_index(filename: Column) -> Column:
    """First 4-digit run = frame index (processing.py:207 — P7).
    A filename with no 4-digit run yields NULL — regexp_extract's
    no-match empty string through a plain cast would abort the whole
    scan under ANSI mode on one stray file."""
    return F.regexp_extract(filename, r"(\d{4})", 1).try_cast("int")


def parse_bag_time(prefix: Column) -> Column:
    """``YYYY-MM-DD-HH-MM-SS`` from the bag's S3 prefix dir
    (processing.py:210-213 — P8)."""
    # try_to_timestamp: a prefix without the date segment yields NULL
    # instead of an ANSI CANNOT_PARSE_TIMESTAMP job abort
    return F.try_to_timestamp(
        F.regexp_extract(prefix, r"(\d{4}-\d{2}-\d{2}-\d{2}-\d{2}-\d{2})", 1),
        F.lit("yyyy-MM-dd-HH-mm-ss"),
    )


def frame_time(bag_time: Column, frame_index: Column, frame_ms: int = FRAME_MS) -> Column:
    """base + index × 67 ms (processing.py:218-221 — P8)."""
    return F.timestamp_millis(
        F.unix_millis(bag_time) + frame_index.cast("bigint") * F.lit(frame_ms)
    )


def strip_bag_suffix(key: Column) -> Column:
    """Output prefix = key minus ``.bag`` (engine.py:148 — P6)."""
    return F.regexp_replace(key, r"\.bag$", "")


def with_frame_identity(files: DataFrame, path_col: str = "path") -> DataFrame:
    """binaryFile-style listing → typed frame rows (S10 + P5 + P7 + P8).
    ``bag_id`` = the containing directory name (the bag's output prefix,
    engine.py:148) — derived here so ``gap_audit``'s default
    (bag_id, camera) partitioning composes directly with this scan."""
    fname = F.element_at(F.split(F.col(path_col), "/"), -1)
    bag_dir = F.element_at(F.split(F.col(path_col), "/"), -2)
    return (
        files.filter(F.col(path_col).endswith(".png"))  # P5
        .withColumn("filename", fname)
        .withColumn("bag_id", bag_dir)
        .withColumn("camera", parse_camera(F.col("filename")))
        .withColumn("frame_index", parse_frame_index(F.col("filename")))
        .withColumn("bag_time", parse_bag_time(F.col(path_col)))
        .withColumn("frame_time", frame_time(F.col("bag_time"), F.col("frame_index")))
    )


def gap_audit(
    frames: DataFrame,
    part_cols: list[str] | None = None,
    idx_col: str = "frame_index",
) -> DataFrame:
    """A4: per-partition monotonic-index audit (check_pngs.py:1970-1997).

    One window pass: rows where ``idx != lag(idx)+1`` report the gap
    ``(prev, idx, missed = idx - prev - 1)``. Window partitions align with the
    grouping key, so the only shuffle is the hash partition by camera — no
    global sort.
    """
    part_cols = part_cols or ["bag_id", "camera"]
    w = Window.partitionBy(*part_cols).orderBy(idx_col)
    return (
        frames.select(*part_cols, idx_col)
        .withColumn("prev_idx", F.lag(idx_col).over(w))
        .filter(
            F.col("prev_idx").isNotNull()
            & (F.col(idx_col) != F.col("prev_idx") + 1)
        )
        .withColumn("missed", F.col(idx_col) - F.col("prev_idx") - 1)
    )


def run_diff(run_a: DataFrame, run_b: DataFrame, name_col: str = "filename") -> DataFrame:
    """A5: frames present in run A but not run B (check_pngs.py:1983-2002)."""
    return run_a.select(name_col).exceptAll(run_b.select(name_col))
