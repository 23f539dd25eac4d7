"""Mergeable sketches as relational operators.

``approx_count_distinct`` (HLL) is built in; KMV (k-minimum-values) is the
classic alternative that composes from plain relational ops — which makes
it (a) transparent to Catalyst, (b) bit-for-bit reproducible in the DuckDB
oracle, and (c) a template for custom sketches: any "keep the k extreme
hashes per group" statistic gets the same shape.

Estimator: hash values uniformly into [0,1); if a group keeps the k
smallest distinct hashes and the k-th is ``m``, distinct ≈ (k-1)/m (exact
count when fewer than k distinct values exist). The rank-filter window
benefits from Spark's WindowGroupLimit pushdown — partial top-k happens
map-side before the shuffle, so a skewed group never ships all its hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H

TWO_POW_60 = float(1 << 60)


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: (group, n_kept, est_distinct). ``est_distinct`` is exact when
    the group has < k distinct values.

    NULL values are excluded (COUNT(DISTINCT) semantics) — without the
    filter, md5_long(NULL)=NULL ranks FIRST under Spark's ascending
    window and both inflates small groups by one and evicts a real hash
    from saturated ones (and DuckDB's NULLS-LAST default would order the
    kept set differently, breaking the oracle replay).
    """
    h = (H.md5_long(F.col(value_col)) / F.lit(TWO_POW_60)).alias("h")
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), h)
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    kept = hashes.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        H.quantize(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")).otherwise(
                (F.lit(float(k - 1))) / F.max("h")
            ),
            4,
        ).alias("est_distinct"),
    )


def bottomk_sample(
    df: DataFrame, group_col: str, id_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """Per-group mergeable uniform row sample: the ``k`` rows whose
    ``md5(id)`` rank lowest. Hashing the row IDENTITY (not the value)
    keeps duplicate values in the sample with their true multiplicity —
    required for unbiased quantile/mean estimation over the sample.

    Mergeable exactly like KMV: the union of two groups' samples re-ranked
    to its bottom-k IS the sample of the union — so per-partition,
    per-day, or per-shard samples fold together without resampling.
    WindowGroupLimit pushes the rank filter map-side; a skewed group ships
    k rows per input partition, never its full population.

    Rows with a NULL id are excluded: their hash is NULL, which ranks
    first and would deterministically hijack the "uniform" sample (k
    NULL-id rows would BE the sample); sampling needs a defined identity.
    """
    h = (H.md5_long(F.col(id_col).cast("string")) / F.lit(TWO_POW_60)).alias("__h")
    w = Window.partitionBy(group_col).orderBy("__h", id_col)
    return (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(group_col), F.col(id_col), F.col(value_col), h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__h", "__rn")
    )


def sampled_quantiles(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    quantiles: list[float],
    names: list[str],
    k: int = 256,
) -> DataFrame:
    """Quantile estimates per group from the bottom-k sample — error
    O(1/√k), deterministic (the sample is fixed by the md5 ranks, the
    estimate is Spark's exact interpolated ``percentile`` OVER the
    sample). Exact when the group has ≤ k rows. The mergeable-sample +
    cheap-final-percentile split is the same contract as
    ``approx_percentile`` with an oracle-replayable sketch."""
    sample = bottomk_sample(df, group_col, id_col, value_col, k)
    return sample.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_sample"),
        *[
            H.quantize(F.percentile(value_col, F.lit(q)), 6).alias(n)
            for q, n in zip(quantiles, names)
        ],
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch as a TABLE: (d, bucket, c) with ``depth × width``
    rows regardless of input cardinality — the bounded-memory answer to
    frequency counting when the exact per-key groupBy (heavy_hitters)
    would carry an unbounded key space through the shuffle.

    Each row hashes into one bucket per depth (independent md5 salts); the
    sketch is MERGEABLE by construction — union two sketch tables and sum
    ``c`` per (d, bucket) to get the sketch of the union. Deterministic
    (md5), so an oracle replays it bit-for-bit.

    NULL values are excluded: they'd hash to a NULL bucket no probe can
    join back to — dead rows that inflate the sketch and break its
    est ≥ true-count guarantee for the NULL key. With the filter, a NULL
    probe's estimate of 0 is consistent (NULLs are simply not counted).
    """
    df = df.filter(F.col(value_col).isNotNull())
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            H.md5_long(
                                F.concat(F.lit(f"cms{d}|"), F.col(value_col))
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("h")
    )
    return (
        rows.select("h.d", "h.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, value_col: str, width: int = 256
) -> DataFrame:
    """Point-frequency estimates from a count-min sketch: for each probe
    value, the MIN bucket count across depths (upward-biased; error ≤
    ε·N with ε = e/width at probability 1 - e^-depth). The probe side
    computes its buckets with the same salted hashes and joins the sketch
    on (d, bucket) — sketch-size rows, never the original data. An EMPTY
    sketch (built over no rows) estimates 0 for every probe — one row per
    distinct probe value, same shape as the populated path."""
    depth_count = sketch.select("d").distinct().count()
    if depth_count == 0:
        return (
            probes.select(value_col)
            .distinct()
            .withColumn("est_count", F.lit(0).cast("bigint"))
        )
    probe_buckets = probes.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            H.md5_long(
                                F.concat(F.lit(f"cms{d}|"), F.col(value_col))
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for d in range(depth_count)
                ]
            )
        ).alias("h"),
    ).select(value_col, "h.d", "h.bucket")
    return (
        probe_buckets.join(sketch, ["d", "bucket"], "left")
        .fillna(0, subset=["c"])
        .groupBy(value_col)
        .agg(F.min("c").alias("est_count"))
    )


def hll_sketches(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = 14
) -> DataFrame:
    """Per-group Apache DataSketches HLL sketch (binary, mergeable) via
    Spark's native ``hll_sketch_agg`` — the industrial-strength cousin of
    the relational KMV above. The sketch column is a few KB per group
    regardless of cardinality; persist it per partition/day and roll any
    time range up with ``hll_merge`` without rescanning data (the same
    "partial aggregates are the long-lived artifact" contract as cms_build
    and the rollup tables)."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll")
    )


def hll_estimate(sketches: DataFrame, group_col: str) -> DataFrame:
    """(group, n_distinct_est) from stored sketches — no data rescan."""
    return sketches.select(
        group_col, F.hll_sketch_estimate("hll").alias("n_distinct_est")
    )


def hll_merge(sketches: DataFrame, group_col: str) -> DataFrame:
    """Merge per-partition sketches for the same group into one (e.g.
    per-day sketches → per-month): ``hll_union_agg`` is associative and
    commutative, so Spark combines map-side — the shuffle carries one
    sketch per group per mapper, never raw values."""
    return sketches.groupBy(group_col).agg(
        F.hll_union_agg("hll", F.lit(True)).alias("hll")
    )
