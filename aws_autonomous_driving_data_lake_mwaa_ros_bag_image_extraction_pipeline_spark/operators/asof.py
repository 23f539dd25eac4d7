"""As-of (most-recent-prior) join — sensor-topic alignment primitive.

The reference aligns streams implicitly (filename pairing, processing.py:362);
a real multi-topic fusion needs "for each left row, the latest right row at or
before its timestamp, per key". Spark has no native as-of join; this is the
classic **union + last_value window** formulation: one sort-shuffle on
(key, ts) instead of a per-row range probe, which is the scalable plan — the
window is partitioned by key so skew maps to key skew, handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tolerance_ms: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row: values of the nearest right row on the same key —
    ``direction="backward"`` (default) takes the latest right row with
    ``right.ts <= left.ts``; ``direction="forward"`` the earliest right row
    with ``right.ts >= left.ts`` (pandas merge_asof's direction flag).
    Nulls when no such right row, or the match is farther than
    ``tolerance_ms``.

    Both directions are the same single sort-shuffle union plan — forward
    just flips the same-ts tiebreak and the window frame (first following
    non-null instead of last preceding).

    NULL semantics (pandas merge_asof / SQL ASOF): a left row with a NULL
    key or NULL timestamp is KEPT but matches nothing (an equi-join never
    matches NULL keys; an unknown time has no "nearest" row), and right
    rows with a NULL key or timestamp match nothing. Without the guards,
    the union-window formulation would group NULL keys together and —
    under NULLS-FIRST ordering — hand a NULL-ts left row the minimum-ts
    right row in forward mode.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    forward = direction == "forward"
    right = right.filter(
        F.col(on).isNotNull() & F.col(right_ts).isNotNull()
    )
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_vals],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_vals],
        F.col(right_ts).alias("__rts"),
    )
    if forward:
        # Left rows sort before right rows at the same ts → "at or after";
        # pick the FIRST following right value.
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # Right rows sort before left rows at the same ts → "at or before".
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    has_ts = F.col("__ts").isNotNull()
    filled = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.when(has_ts, pick(f"__r_{c}")).alias(f"__f_{c}")
            for c in right_vals
        ],
        F.when(has_ts, pick("__rts")).alias("__f_rts"),
    )
    out = filled.filter(F.col("__is_left") == 1)
    if tolerance_ms is not None:
        signed_gap = (
            F.unix_millis(F.col("__f_rts")) - F.unix_millis(F.col("__ts"))
            if forward
            else F.unix_millis(F.col("__ts")) - F.unix_millis(F.col("__f_rts"))
        )
        in_tol = signed_gap <= F.lit(tolerance_ms)
        sel_vals = [
            F.when(in_tol, F.col(f"__f_{c}")).alias(c) for c in right_vals
        ]
    else:
        sel_vals = [F.col(f"__f_{c}").alias(c) for c in right_vals]
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns], *sel_vals
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    dim_vals: list[str] | None = None,
) -> DataFrame:
    """Effective-dated (SCD type-2) dimension lookup: each fact row picks
    the dimension version whose ``[valid_from, valid_to)`` interval
    contains its timestamp; facts before the first version keep NULLs.

    The join is EQUI on the key with the interval containment as a
    residual predicate — Catalyst plans a hash/sort-merge join on the key
    and filters the few versions per key afterwards, so this scales like
    any key join (a version-count blowup per key is a dim-modeling bug,
    not a plan problem). A NULL ``valid_to`` means the open current
    version. Caller contract: versions of one key don't overlap — with
    overlaps, use ``asof_join`` on ``valid_from`` (latest-start-wins).
    """
    if dim_vals is None:
        dim_vals = [
            c for c in dim.columns if c not in (on, valid_from, valid_to)
        ]
    d = dim.select(
        F.col(on).alias("__k"),
        F.col(valid_from).alias("__vf"),
        F.col(valid_to).alias("__vt"),
        *[F.col(c) for c in dim_vals],
    )
    cond = (
        (facts[fact_ts] >= d["__vf"])
        & (d["__vt"].isNull() | (facts[fact_ts] < d["__vt"]))
        & (facts[on] == d["__k"])
    )
    return facts.join(d, cond, "left").select(
        *[facts[c] for c in facts.columns], *[d[c] for c in dim_vals]
    )
