"""Skew mitigation for joins and aggregations.

AQE's skew-join splitting (on in session.py) handles most skew at runtime
by splitting oversized shuffle partitions. Salting is the explicit fallback
for the cases AQE can't fix — e.g. a broadcast-ineligible dimension joined
on a key where ONE value dominates (null keys, a default id, a celebrity
entity): the salt spreads that single key across ``n_salts`` reducers at
the cost of replicating the small side n_salts times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side salted and the small side replicated.

    The big side's salt is deterministic (hash of the whole row, mod
    n_salts) so repeated runs shuffle identically; the small side explodes
    to every salt value, so each (key, salt) reducer holds the full small
    partition for that key. Result == plain join (tested), wall-clock ∝
    1/n_salts on a single hot key.

    Only join types where replicating the SMALL side is sound are allowed:
    with right/full outer, an unmatched small-side row would surface once
    per salt, breaking the plain-join contract.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "replicating the small side would duplicate unmatched rows in "
            "right/full outer joins"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")


def salted_count_distinct(
    df: DataFrame, group_col: str, value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-stage EXACT distinct count for skewed groups.

    The salt is a hash of the VALUE, so each distinct value lands in exactly
    one (group, salt) shard — per-shard distinct counts are disjoint and the
    merge is a plain SUM. The hottest group fans across n_salts reducers in
    stage one and the merge shuffles just n_salts tiny rows per group.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    partial = (
        df.select(group_col, value_col)
        .withColumn("__salt", salt)
        .groupBy(group_col, "__salt")
        .agg(F.count_distinct(value_col).alias("__n"))
    )
    return partial.groupBy(group_col).agg(F.sum("__n").alias("n_distinct"))


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew diagnostic for a prospective join/agg key: ``(n_keys,
    total_rows, max_key_rows, p50_key_rows, p99_key_rows, top_key_share,
    skew_ratio)`` — the numbers that decide whether a key needs salting
    (``skew_ratio`` = hottest key vs median key; a ratio in the hundreds
    with a meaningful ``top_key_share`` means one reducer will own the
    join) or whether AQE's split threshold will catch it.

    Two shuffles, both tiny after partial aggregation: per-key counts
    (map-side combined, one row per distinct key) then a one-row summary.
    NULL keys are counted as a key — they're the most common hot key in
    the wild.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("total_rows"),
        F.max("__n").alias("max_key_rows"),
        F.percentile("__n", F.lit(0.5)).alias("p50_key_rows"),
        F.percentile("__n", F.lit(0.99)).alias("p99_key_rows"),
        (F.max("__n") / F.sum("__n")).alias("top_key_share"),
        (F.max("__n") / F.percentile("__n", F.lit(0.5))).alias("skew_ratio"),
    )
