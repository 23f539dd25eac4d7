"""Range (interval) join — the second temporal-alignment primitive beside
the as-of join.

Semantics: for each left row, all right rows with
``|left.ts - right.ts| <= tolerance`` on the same key.

Spark has no native range join; the naive condition-only join plans as a
nested loop over each key group. The scale formulation **bins time into
``tolerance``-wide buckets**: a pair within tolerance is at most one bucket
apart, so emitting each left row into its bucket and each right row into
(bucket-1, bucket, bucket+1) turns the join into an equi-join on
(key, bucket) — shuffle-partitionable, AQE-skew-splittable — followed by
the exact predicate on the ~3× candidate set. Cost is O(matches + 3·|right|)
instead of O(|left| × |right per key|). Each true pair joins exactly once
(the left row lives in one bucket; the right row's three bucket copies are
distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_ms: int,
) -> DataFrame:
    """All (left, right) pairs on the same key within ``tolerance_ms``.

    Output: every left column + every right column; right columns whose
    names collide with left's are suffixed ``_r``. ``tolerance_ms=0``
    means exactly-simultaneous pairs (1 ms buckets + ``|dt| <= 0``);
    negative tolerances are rejected upfront — the unvalidated division
    would otherwise abort deep in the plan under ANSI mode.
    """
    if tolerance_ms < 0:
        raise ValueError(f"tolerance_ms must be >= 0, got {tolerance_ms}")
    bucket_w = max(1, tolerance_ms)
    rename = {c: f"{c}_r" for c in right.columns if c in left.columns}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_on = rename.get(on, on)
    r_ts = rename.get(right_ts, right_ts)

    # floor division, not cast-truncation: exact bucketing for negative epochs
    l_binned = left.withColumn(
        "__lb", F.floor(F.unix_millis(F.col(left_ts)) / bucket_w)
    )
    rb = F.floor(F.unix_millis(F.col(r_ts)) / bucket_w)
    r_binned = r.withColumn(
        "__rb", F.explode(F.array(rb - 1, rb, rb + 1))
    )
    joined = l_binned.join(
        r_binned,
        (F.col(on) == F.col(r_on)) & (F.col("__lb") == F.col("__rb")),
    )
    in_range = (
        F.abs(F.unix_millis(F.col(left_ts)) - F.unix_millis(F.col(r_ts)))
        <= F.lit(tolerance_ms)
    )
    return joined.filter(in_range).drop("__lb", "__rb")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_ms: int,
    extra_cond=None,
) -> DataFrame:
    """All (left, right) interval pairs that OVERLAP:
    ``l_start <= r_end AND r_start <= l_end`` (closed intervals) — the
    third temporal-alignment primitive beside as-of and tolerance joins
    (Flink's interval join, DuckDB/Trino's inequality join).

    The naive condition-only join is a nested loop. Scale formulation:
    each interval is exploded into every ``bucket_ms``-wide time bucket it
    covers, the join becomes an equi-join on the bucket — shuffleable,
    AQE-skew-splittable — and each true pair is kept EXACTLY ONCE without
    a distinct: the pair is admitted only in the bucket containing
    ``greatest(l_start, r_start)``, which every overlapping pair covers on
    both sides (overlap means max(start) <= min(end)) and which is unique
    per pair. Cost is O(Σ buckets-per-interval + candidates), so pick
    ``bucket_ms`` near the typical interval length: long intervals explode
    into more copies, short buckets collide less.

    Right columns colliding with left's are suffixed ``_r``.
    ``extra_cond`` (a Column over the joined row) is applied WITH the
    bucket equality, before the exact overlap predicate — pass the
    equi-key here (e.g. same day, different user) so it prunes in the
    join itself.
    """
    if bucket_ms <= 0:
        raise ValueError(f"bucket_ms must be > 0, got {bucket_ms}")
    rename = {c: f"{c}_r" for c in right.columns if c in left.columns}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_start = rename.get(right_start, right_start)
    r_end = rename.get(right_end, right_end)

    def _buckets(start: str, end: str):
        lo = F.floor(F.unix_micros(F.col(start)) / (bucket_ms * 1000))
        hi = F.floor(F.unix_micros(F.col(end)) / (bucket_ms * 1000))
        return F.explode(F.sequence(lo, hi))

    l_b = left.withColumn("__lb", _buckets(left_start, left_end))
    r_b = r.withColumn("__rb", _buckets(r_start, r_end))
    cond = F.col("__lb") == F.col("__rb")
    if extra_cond is not None:
        cond = cond & extra_cond
    anchor = F.floor(
        F.greatest(
            F.unix_micros(F.col(left_start)), F.unix_micros(F.col(r_start))
        )
        / (bucket_ms * 1000)
    )
    overlap = (
        F.unix_micros(F.col(left_start)) <= F.unix_micros(F.col(r_end))
    ) & (F.unix_micros(F.col(r_start)) <= F.unix_micros(F.col(left_end)))
    return (
        l_b.join(r_b, cond)
        .filter((F.col("__lb") == anchor) & overlap)
        .drop("__lb", "__rb")
    )
