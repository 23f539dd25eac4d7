"""Bloom-filter semi-join pruning — cut the big side of a selective join
BEFORE its shuffle.

The classic 100 TB join shape: a huge fact table joined to a filtered
dimension subset (the reference's pattern of syncing only the files whose
keys appear in a picked manifest — deploy.py's filtered S3 sync — and the
TPC-H "lineitems of urgent orders" shape). A plain join shuffles the ENTIRE
fact table on the join key; when the dimension subset matches only a few
percent of fact rows, almost all of that shuffle is wasted.

This operator builds a Bloom filter over the small side's keys as a one-row
dense bitmap (array of packed 64-bit words), broadcasts it, and filters the
fact table with pure JVM bit arithmetic before the real join. False positives
(rate ~= (1 - e^(-s*n/m))^s) pass the filter harmlessly — the exact join
still drops them — so the composition is EXACTLY the plain join, which is
what the DuckDB oracle checks.

Scale shape:
- bitmap build: one narrow pass over the keys; positions aggregate with
  map-side-combined ``bit_or`` partials on at most ``m/64`` word keys, then
  fold into a single map row. Broadcast cost = m/8 bytes (1 MiB default) —
  independent of fact-table size; raise ``m_bits`` with corpus size to hold
  the false-positive rate.
- probe: whole-stage-codegen bit tests (xxhash64 + shift/mask), no Python,
  no shuffle — the filter runs AT THE SCAN, so the downstream join shuffles
  only survivors.
- Spark's AQE injects runtime bloom filters for some shapes
  (spark.sql.optimizer.runtime.bloomFilter.enabled); this operator makes
  the pattern explicit, composable (the bitmap is reusable across queries,
  e.g. persisted next to a manifest), and available where AQE won't fire.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 23,
    n_hashes: int = 5,
) -> DataFrame:
    """One-row DataFrame ``(bloom: array<bigint>)`` — a DENSE ``m_bits``-wide
    Bloom bitmap over ``key_col`` as ``m_bits/64`` packed words, with
    ``n_hashes`` xxhash64 probes per key (seeded 0..n_hashes-1).

    Dense array, not a map: Spark's expression-level maps are unsorted
    entry lists, so ``element_at(map, k)`` is a LINEAR scan — fatal when
    the probe side does rows × n_hashes lookups against ~10⁵ entries
    (measured 50×+ slowdown). ``element_at(array, i)`` is O(1). The dense
    form costs m_bits/8 bytes broadcast (1 MiB default) regardless of key
    count; the scatter is a union with an all-zero word range + one
    ``array_sort(collect_list(...))`` fold of m_bits/64 structs on one
    reducer — metadata-scale, data-size-independent."""
    m_words = m_bits // 64
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(m_bits))
                    for s in range(n_hashes)
                ]
            )
        ).alias("__pos")
    )
    # ONE groupBy builds the dense word table: the all-zero word range is
    # unioned with the per-position single-bit rows BEFORE the aggregation
    # (bit_or with 0 is the identity), instead of the old
    # groupBy → union zeros → groupBy chain — same bitmap, one exchange
    # and one AQE stage fewer on the build side. Map-side bit_or partials
    # still cap the shuffle at ~m/64 word rows per input partition.
    words = pos.select(
        (F.col("__pos") / 64).cast("int").alias("__word"),
        F.expr("shiftleft(1L, CAST(__pos % 64 AS INT))").alias("__bits"),
    )
    zeros = (
        keys.sparkSession.range(m_words)
        .select(
            F.col("id").cast("int").alias("__word"),
            F.lit(0).cast("bigint").alias("__bits"),
        )
    )
    dense = (
        zeros.union(words)
        .groupBy("__word")
        .agg(F.bit_or("__bits").alias("__bits"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__word", "__bits"))),
            lambda x: x["__bits"],
        ).alias("bloom")
    )


def _member(key: Column, m_bits: int, n_hashes: int) -> Column:
    """All-probes-set test against the broadcast dense ``bloom`` array
    (1-indexed element_at, O(1) per lookup)."""
    cond = F.lit(True)
    for s in range(n_hashes):
        p = F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits))
        word = F.element_at(F.col("bloom"), (p / 64).cast("int") + 1)
        bit = F.bit_get(word, (p % 64).cast("int"))
        cond = cond & (F.coalesce(bit, F.lit(0)) == F.lit(1))
    return cond


def bloom_prune(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str | None = None,
    m_bits: int = 1 << 23,
    n_hashes: int = 5,
) -> DataFrame:
    """Filter ``big`` to rows whose ``big_key`` is *probably* in
    ``keys[keys_key]`` — no false negatives, tunable false positives.
    The result is a SUPERSET of the semi-join, suitable as the shuffled
    input of the exact join."""
    keys_key = keys_key or big_key
    # No distinct before the build: bit_or is duplicate-insensitive, so the
    # bitmap is bit-identical without it — the dedup exchange was a pure
    # extra shuffle (and its AQE stage) on the build side.
    bf = bloom_bitmap(
        keys.select(F.col(keys_key)), keys_key, m_bits, n_hashes
    )
    pruned = big.crossJoin(F.broadcast(bf)).filter(
        _member(F.col(big_key), m_bits, n_hashes)
    )
    return pruned.drop("bloom")


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    m_bits: int = 1 << 23,
    n_hashes: int = 5,
) -> DataFrame:
    """Exact inner join ``big ⋈ small``, with the big side Bloom-pruned
    before its shuffle. Result is IDENTICAL to the plain join (false
    positives die in the exact join); only the plan differs."""
    small_key = small_key or big_key
    pruned = bloom_prune(big, small, big_key, small_key, m_bits, n_hashes)
    if big_key == small_key:
        return pruned.join(small, big_key)
    return pruned.join(small, pruned[big_key] == small[small_key], "inner")


def write_bloom(
    keys: DataFrame,
    key_col: str,
    path: str,
    m_bits: int = 1 << 23,
    n_hashes: int = 5,
) -> None:
    """Persist the bitmap (with its parameters) as a one-row parquet — the
    reusable artifact the module docstring promises: build once when the
    dimension/manifest changes, prune any number of later queries without
    rescanning the keys. Readers MUST probe with the stored parameters;
    ``read_bloom`` returns them alongside the bitmap row."""
    bf = bloom_bitmap(keys, key_col, m_bits, n_hashes).select(
        "bloom",
        F.lit(m_bits).alias("m_bits"),
        F.lit(n_hashes).alias("n_hashes"),
    )
    bf.coalesce(1).write.mode("overwrite").parquet(path)


def read_bloom(spark, path: str):
    """(one-row bitmap DataFrame, m_bits, n_hashes) from ``write_bloom``."""
    df = spark.read.parquet(path)
    row = df.select("m_bits", "n_hashes").first()
    return df.select("bloom"), int(row.m_bits), int(row.n_hashes)


def bloom_prune_with(
    big: DataFrame,
    bloom_df: DataFrame,
    big_key: str,
    m_bits: int,
    n_hashes: int,
) -> DataFrame:
    """``bloom_prune`` against an already-built (e.g. persisted) bitmap."""
    pruned = big.crossJoin(F.broadcast(bloom_df)).filter(
        _member(F.col(big_key), m_bits, n_hashes)
    )
    return pruned.drop("bloom")
