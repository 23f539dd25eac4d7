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
    names collide with left's are suffixed ``_r``.
    """
    rename = {c: f"{c}_r" for c in right.columns if c in left.columns}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_on = rename.get(on, on)
    r_ts = rename.get(right_ts, right_ts)

    # floor division, not cast-truncation: exact bucketing for negative epochs
    l_binned = left.withColumn(
        "__lb", F.floor(F.unix_millis(F.col(left_ts)) / tolerance_ms)
    )
    rb = F.floor(F.unix_millis(F.col(r_ts)) / tolerance_ms)
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
