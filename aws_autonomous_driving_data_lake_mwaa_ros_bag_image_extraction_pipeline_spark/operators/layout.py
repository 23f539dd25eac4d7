"""Storage layout operators: bucketing for shuffle-free joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Bucketing
pre-shuffles ONCE at write time: both tables hash-partitioned into the same
number of buckets on the join key mean every subsequent join (and groupBy on
the key) is exchange-free — each task zips bucket i with bucket i. The write
is one-time; every downstream query amortizes it.

Spark's bucketing lives in the table catalog (``bucketBy`` requires
``saveAsTable``), so these helpers take table names, not paths. Sort-merge
joins additionally skip the sort when ``sortBy`` matches the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on ``key``.

    Pick ``n_buckets`` so one bucket of the LARGER table fits an executor
    core's working memory at target scale (e.g. 100 TB / 4096 buckets ≈
    25 GB per bucket pre-compression — size up, buckets can't be split).
    Both sides of a planned join must use the same n_buckets, or one side's
    buckets must divide the other's (Spark then coalesces). ``path`` makes
    the table external (data at ``path``, bucketing metadata still in the
    catalog — Spark bucketing is catalog-bound, so a bare ``.parquet(path)``
    write cannot carry it).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — a sort-merge join with NO Exchange on
    either side (asserted in tests); with sorted buckets the per-task sort
    collapses too. The MERGE hint pins the strategy: bucketing exists for
    fact-fact joins where neither side broadcasts, but on small test data
    the planner would otherwise pick broadcast and ignore the bucket layout
    (at real scale it chooses SMJ on its own; the hint just makes the
    exchange-free property deterministic)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(
        spark.table(right_table).hint("merge"), on_cols, how
    )


def zorder_value(cols: list, bits: int = 16):
    """Interleave the low ``bits`` bits of pre-normalized integer columns
    into one Morton (Z-curve) key. Pure bit arithmetic — shifts and masks
    compile into whole-stage codegen; ``bits``·``len(cols)`` must fit 63.
    Inputs must already be scaled to [0, 2^bits) (see ``write_zordered``).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered along a Z-curve over ``cols`` — the multi-
    dimensional analogue of a sort: every output file covers a small
    RECTANGLE in (col1, col2, …) space, so parquet row-group min/max stats
    prune scans filtered on ANY of the dimensions, not just a leading sort
    column. This is the layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
    expressed on plain parquet.

    Each column is min-max scaled to ``bits`` bits (one tiny broadcast agg),
    the Morton keys range-partition into ``n_files`` (sampling-based, no
    global sort), and files sort internally so row groups are tight.
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    bounds = df.agg(*aggs)
    scaled = df.join(F.broadcast(bounds))
    norm = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1))
        norm.append(
            F.least(
                F.lit((1 << bits) - 1),
                F.floor((F.col(c) - mn) / span * F.lit((1 << bits) - 1)),
            )
        )
    scaled = scaled.withColumn("__z", zorder_value(norm, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )
    (
        scaled.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_files(
    spark: SparkSession, path: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(rows / target)`` files and swap it into place. Returns the new
    file count.

    Streaming sinks and per-batch MERGE/append writers accrete small files
    until scan planning (one task per file, footer reads) dominates query
    time — the classic 100 TB operational tax. The rewrite stages to a
    sibling ``<path>__compacting`` dir and swaps via two renames, so a
    reader never observes a HALF-WRITTEN directory — but the swap is NOT
    atomic: between the two renames the path is briefly absent, so a
    concurrent reader can hit FileNotFound. The contract is single-writer
    with no concurrent readers during the swap (or readers that retry);
    os.rename also limits this helper to local/POSIX filesystems — on an
    object store, use the versioned commit-log (``streaming.pipeline``
    manifest) whose readers resolve a pointer file instead of a mutable
    directory. The displaced original is kept at ``<path>__pre_compact``
    until the caller vacuums (same retention contract as the manifest
    ledger's generations).
    """
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    staging = path.rstrip("/") + "__compacting"
    backup = path.rstrip("/") + "__pre_compact"
    df.repartition(n_files).write.mode("overwrite").parquet(staging)
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path, backup)
    os.rename(staging, path)
    return n_files


def zonemap_stats(spark: SparkSession, path: str, cols: list[str]):
    """Per-FILE zone map: ``(file, n_rows, min/max/n_nulls per col)`` —
    the Delta add-file-stats / Iceberg manifest-metrics table, computed on
    plain parquet via the ``_metadata.file_path`` column.

    Parquet footers already hold row-group min/max, but at 100 TB "open
    every footer" is itself the bottleneck (one S3 GET per file per query).
    Persisting this table once means query planning touches ONE small
    metadata table instead of a million footers; ``write_zordered`` makes
    the per-file ranges tight so the skipping actually bites on multiple
    dimensions. One narrow scan; the groupBy key is the file path, so the
    aggregation is map-sided by Spark's file-partition alignment.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file"), *cols
    )
    return df.groupBy("file").agg(*_zonemap_aggs(cols))


def zonemap_candidate_files(
    zonemap, ranges: dict[str, tuple]
) -> list[str]:
    """Files whose zone COULD contain a row matching every ``col BETWEEN
    lo AND hi`` range — the file-skipping decision. A file with a NULL
    min/max for a predicate column holds no non-null values there and is
    skipped (BETWEEN never matches NULL). Driver-side materialization is
    metadata-bounded: one row per file, never per data row."""
    from pyspark.sql import functions as F

    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        cond = (
            cond
            & (F.col(f"min_{c}") <= F.lit(hi))
            & (F.col(f"max_{c}") >= F.lit(lo))
        )
    return [r.file for r in zonemap.filter(cond).select("file").collect()]


def zonemap_pruned_read(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple],
    zonemap=None,
):
    """Read ``path`` filtered to ``col BETWEEN lo AND hi`` per range, but
    open ONLY the files the zone map admits; the exact predicate still
    applies on the survivors (zones are a superset guarantee, like the
    Bloom filter's). Result is identical to a plain filtered read."""
    from pyspark.sql import functions as F

    if zonemap is None:
        zonemap = zonemap_stats(spark, path, list(ranges))
    files = zonemap_candidate_files(zonemap, ranges)
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        cond = cond & F.col(c).between(F.lit(lo), F.lit(hi))
    if not files:
        return spark.read.parquet(path).filter(cond).limit(0)
    return spark.read.parquet(*files).filter(cond)


def _zonemap_aggs(cols: list[str]):
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{c}"),
        ]
    return aggs


def _norm_file(p: str) -> str:
    """Normalize 'file:///x', 'file:/x', '/x' to a comparable '/x' form —
    ``_metadata.file_path`` and ``DataFrame.inputFiles()`` render the same
    file with different URI spellings."""
    if "://" in p:
        p = p.split("://", 1)[1]
        return p if p.startswith("/") else "/" + p
    if p.startswith("file:"):
        return p[5:]
    return p


def zonemap_refresh(
    spark: SparkSession, lake_path: str, zonemap_dir: str, cols: list[str]
) -> int:
    """Incrementally maintain a PERSISTED zone map as a lake grows: stat
    only the data files not yet present in ``zonemap_dir`` and append
    their rows. Returns the number of files admitted this call.

    This is the streaming-sink counterpart of ``zonemap_stats`` (which
    rebuilds from scratch): each tick touches O(new files), so the skip
    index stays current without re-opening the whole lake — the Delta/
    Iceberg commit-time stats-collection behavior on plain parquet.

    Idempotent under at-least-once replay: per-file stats are
    deterministic, the new-file check consults the already-persisted map,
    and ``load_zonemap`` dedups by file — a replayed tick that re-appends
    a file's row changes nothing.

    Discovery is metadata-only (``inputFiles`` = the file listing, no
    footer or data-page reads); the stats pass reads just the new files.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    try:
        existing = {
            _norm_file(r.file)
            for r in spark.read.parquet(zonemap_dir).select("file").collect()
        }
    except AnalysisException:
        existing = set()
    new = sorted(
        f
        for f in spark.read.parquet(lake_path).inputFiles()
        if _norm_file(f) not in existing
    )
    if not new:
        return 0
    stats = (
        spark.read.parquet(*new)
        .select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*_zonemap_aggs(cols))
    )
    stats.write.mode("append").parquet(zonemap_dir)
    return len(new)


def load_zonemap(spark: SparkSession, zonemap_dir: str):
    """Read a persisted zone map (see ``zonemap_refresh``), collapsing any
    replay-duplicated rows — same schema as ``zonemap_stats``, usable
    directly by ``zonemap_candidate_files`` / ``zonemap_pruned_read``."""
    return spark.read.parquet(zonemap_dir).dropDuplicates(["file"])


def column_size_report(spark: SparkSession, path: str) -> "DataFrame":
    """Per-column storage report over a parquet table: compressed /
    uncompressed bytes, compression ratio, encodings, value count —
    straight from the parquet footers (no data pages read). The input to
    every layout decision this module automates: which columns dominate
    storage, whether dictionary encoding is engaging (a sorted/Z-ordered
    rewrite often flips PLAIN → RLE_DICTIONARY), what a projection
    actually saves at the scan.

    Footer parsing is DISTRIBUTED — one task per file via the same
    binaryFile + mapInPandas shape as zonemap_stats (pyarrow ships with
    executors); results aggregate per column. The `parquet-tools meta`
    replacement, as a DataFrame.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(
        path.rstrip("/") + "/*.parquet"
    ).select("path")

    def _stats(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                local = p[len("file:"):] if p.startswith("file:") else p
                md = pq.ParquetFile(local).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        rows.append(
                            (
                                c.path_in_schema,
                                c.total_compressed_size,
                                c.total_uncompressed_size,
                                c.num_values,
                                ",".join(sorted({str(e) for e in c.encodings})),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "column",
                    "compressed",
                    "uncompressed",
                    "n_values",
                    "encodings",
                ],
            )

    per_chunk = files.mapInPandas(
        _stats,
        "column string, compressed long, uncompressed long, "
        "n_values long, encodings string",
    )
    return (
        per_chunk.groupBy("column")
        .agg(
            F.sum("compressed").alias("compressed_bytes"),
            F.sum("uncompressed").alias("uncompressed_bytes"),
            F.sum("n_values").alias("n_values"),
            F.array_join(
                F.array_sort(F.collect_set("encodings")), ";"
            ).alias("encodings"),
        )
        .withColumn(
            "ratio",
            F.round(
                F.col("uncompressed_bytes") / F.col("compressed_bytes"), 3
            ),
        )
    )


def write_range_sorted(
    df: "DataFrame",
    path: str,
    col: str,
    n_files: int = 16,
) -> None:
    """Range-partitioned, sorted-within-file layout on a LINEAR key — the
    simpler sibling of the Z-order writer for single-column access
    patterns: ``repartitionByRange`` gives each output file a disjoint
    key range (so zone maps prune perfectly for range predicates on
    ``col``), and ``sortWithinPartitions`` keeps pages internally ordered
    (page-level min/max + better encodings). Prefer Z-order only when
    queries filter on SEVERAL columns at once."""
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def rendezvous_shard(
    df: "DataFrame",
    key_col: str,
    n_shards: int,
    shard_name: str = "shard",
) -> "DataFrame":
    """Rendezvous (highest-random-weight) shard assignment: ``shard =
    argmax_i md5(key # i)`` (Thaler & Ravishankar, "Using Name-Based
    Mappings to Increase Hit Rates", IEEE/ACM ToN 1998 — public
    literature, the scheme behind consistent object placement in Riak /
    Ceph-style systems).

    Why not ``hash(key) mod n``: growing a mod-sharded lake from n to n+1
    shards remaps an expected n/(n+1) of ALL keys (at n=8, 89% of the
    corpus rewrites); under rendezvous a key moves ONLY if the new
    shard's weight beats its current maximum — an expected 1/(n+1)
    fraction, the provable minimum for uniform placement. That is the
    difference between "add a shard, rewrite everything" and "add a
    shard, move one shard's worth" for a partitioned corpus, feature
    store, or embedding index.

    Narrow per-row expression (n md5s per row, whole-stage codegen, no
    shuffle) — cost is O(n_shards) per row, the textbook HRW trade-off:
    intended for moderate shard counts (≲ a few thousand); beyond that,
    use mod-hash inside rendezvous-assigned super-shards. Ties (60-bit
    md5 collisions within one key's weight set, ~n²/2⁶¹) break to the
    LARGER shard index on both engines. NULL keys get shard NULL — a
    row with no identity has no stable placement.
    """
    from pyspark.sql import functions as F

    from ..functions import hashing as H

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    ws = F.array(
        *[
            F.struct(
                H.md5_long(
                    F.concat(
                        F.col(key_col).cast("string"),
                        F.lit("#"),
                        F.lit(str(i)),
                    )
                ).alias("w"),
                F.lit(i).alias("i"),
            )
            for i in range(n_shards)
        ]
    )
    return df.withColumn(
        shard_name,
        F.when(
            F.col(key_col).isNotNull(), F.array_max(ws)["i"]
        ).cast("int"),
    )


def weighted_rendezvous_shard(
    df: "DataFrame",
    key_col: str,
    weights: list[int],
    shard_name: str = "shard",
) -> "DataFrame":
    """Capacity-proportional rendezvous placement: shard ``i`` with
    integer weight ``w_i`` receives exactly ``w_i / Σw`` of the keys, in
    expectation, while keeping HRW's minimal-movement property per unit
    of weight (raise one shard's weight by 1 and only ~1/(Σw+1) of keys
    move, all onto that shard).

    Implemented as HRW over VIRTUAL nodes — shard ``i`` fields ``w_i``
    salted candidates ``md5(key # i ~ j)`` and the global argmax wins —
    rather than the float-ranked straw2 form (``ln(u_i)/w_i``), because
    the integer/md5 comparison is bit-exact in any engine: placement is
    reproducible across runs, clusters, and the SQL oracle with no libm
    last-ulp risk. Cost is O(Σ weights) md5s per row, so weights are
    capacity RATIOS (keep them small and coprime), not absolute byte
    counts. Zero-weight shards receive nothing; NULL keys get shard NULL.
    """
    from pyspark.sql import functions as F

    from ..functions import hashing as H

    if not weights or any(w < 0 for w in weights) or sum(weights) < 1:
        raise ValueError(
            f"weights must be non-negative with a positive sum: {weights}"
        )
    ws = F.array(
        *[
            F.struct(
                H.md5_long(
                    F.concat(
                        F.col(key_col).cast("string"),
                        F.lit(f"#{i}~{j}"),
                    )
                ).alias("w"),
                F.lit(i).alias("i"),
            )
            for i, wt in enumerate(weights)
            for j in range(wt)
        ]
    )
    return df.withColumn(
        shard_name,
        F.when(
            F.col(key_col).isNotNull(), F.array_max(ws)["i"]
        ).cast("int"),
    )
