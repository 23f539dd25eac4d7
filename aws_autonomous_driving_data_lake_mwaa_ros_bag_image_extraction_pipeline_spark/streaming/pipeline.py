"""Incremental / streaming pipeline (operator O4) + processing-state ledger.

Reference semantics being re-expressed:

- the 30-minute cron + S3 sensor loop (rosbag_processing.py:16-24,
  s3_metadata_sensor.py:49-90) becomes a Structured Streaming **file source**
  with ``Trigger.AvailableNow`` — the checkpoint gives exactly-once file
  discovery with no tag races;
- the ``processing.status`` object-tag ledger (processing.py:4-27) becomes an
  **append-only manifest log**: one (key, status, updated_at) row per
  transition, current state = last writer per key. Appends are cheap and
  atomic-enough on any filesystem (no read-modify-overwrite of the table
  we're reading); on Delta/Iceberg the same API maps to ``MERGE INTO``;
- the replay-by-clearing-tag capability (reference README.md:90-100) is
  ``clear_status`` + ``process_pending``: the *batch* incremental tick
  discovers anything the manifest doesn't mark as done — including keys the
  streaming checkpoint has already seen — so explicit replay works even
  though the stream source never re-emits a file.

Scale notes: the manifest log grows one tiny row per transition —
``current_manifest`` is one window pass, and ``compact_manifest`` rewrites
it to one row per key when the log gets long. Failure isolation is per bag
(one bag = one unit of work, matching the reference), each bag a filtered
slice of the batch.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.discovery import discover_new
from ..schemas import TERMINAL_OR_ACTIVE

BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)
MANIFEST_LOG_SCHEMA = "key string, status string, updated_at timestamp"

# ---------------------------------------------------------------------------
# Manifest ledger (K8 / S2 state store) — versioned commit log
#
# Delta-semantics-without-the-package. Layout under manifest_dir:
#
#   _log/00000000.json, 00000001.json, …   one entry per COMMIT
#   data/v00000000/, v00000001/, …         parquet rows for that commit
#
# Commit protocol (single-writer by contract, same as the reference's
# tag store driven by one scheduler): write the commit's parquet rows to
# its data dir, then create the log entry via write-temp + os.rename —
# ONE atomic pointer move. A commit is visible iff its log entry exists;
# a crash between data write and log rename leaves an invisible orphan
# dir that the next commit at that version simply overwrites. The head
# version is the max-numbered log entry (exactly Delta's _delta_log
# discovery — no mutable HEAD file to corrupt).
#
# An "append" commit adds rows; a "snapshot" commit (compaction) holds
# the full last-writer-wins state as of its version, superseding earlier
# commits for readers at-or-after it. Reading version V = union of the
# data dirs from the latest snapshot ≤ V through V. Compaction therefore
# never touches files a concurrent reader may hold; old versions stay
# readable (time travel) until ``vacuum_manifest`` reclaims commits
# below the newest snapshot outside the retention window.
# ---------------------------------------------------------------------------


def _log_dir(manifest_dir: str) -> str:
    return os.path.join(manifest_dir, "_log")


def _versions(manifest_dir: str) -> list[int]:
    d = _log_dir(manifest_dir)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(d)
        if f.endswith(".json") and f[:-5].isdigit()
    )


def _data_path(manifest_dir: str, version: int) -> str:
    return os.path.join(manifest_dir, "data", f"v{version:08d}")


def _read_entry(manifest_dir: str, version: int) -> dict:
    import json

    with open(os.path.join(_log_dir(manifest_dir), f"{version:08d}.json")) as f:
        return json.load(f)


def _commit(manifest_dir: str, version: int, action: str) -> None:
    """Make a prepared data dir visible: one atomic rename of the log
    entry. THIS is the commit point."""
    import json

    log = _log_dir(manifest_dir)
    os.makedirs(log, exist_ok=True)
    entry = {
        "version": version,
        "action": action,
        "data": f"data/v{version:08d}",
        "committed_at": dt.datetime.now(dt.timezone.utc).isoformat(),
    }
    tmp = os.path.join(log, f".tmp-{version:08d}.json")
    with open(tmp, "w") as f:
        json.dump(entry, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(log, f"{version:08d}.json"))


def append_status(
    spark: SparkSession, manifest_dir: str, keys: list[str], status: str | None
) -> None:
    """Record a status transition for each key (append-only; K8). One
    call = one commit = one new readable version."""
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    rows = [(k, status, now) for k in keys]
    if not rows:
        return
    versions = _versions(manifest_dir)
    v = versions[-1] + 1 if versions else 0
    spark.createDataFrame(rows, MANIFEST_LOG_SCHEMA).write.mode(
        "overwrite"  # clobbers an invisible orphan from a crashed commit
    ).parquet(_data_path(manifest_dir, v))
    _commit(manifest_dir, v, "append")


def clear_status(spark: SparkSession, manifest_dir: str, keys: list[str]) -> None:
    """Replay hook: clearing the status re-enqueues the key on the next
    ``process_pending`` tick (reference README.md:90-100)."""
    append_status(spark, manifest_dir, keys, None)


def _log_frame(
    spark: SparkSession, manifest_dir: str, version: int
) -> DataFrame:
    """The raw transition log visible at ``version``: data dirs from the
    latest snapshot ≤ version through version (a snapshot supersedes all
    earlier commits — that's what makes compaction O(live keys) to read
    while leaving history untouched)."""
    versions = [v for v in _versions(manifest_dir) if v <= version]
    if not versions:
        return spark.createDataFrame([], MANIFEST_LOG_SCHEMA)
    base = versions[0]
    for v in reversed(versions):
        if _read_entry(manifest_dir, v)["action"] == "snapshot":
            base = v
            break
    paths = [_data_path(manifest_dir, v) for v in versions if v >= base]
    return spark.read.schema(MANIFEST_LOG_SCHEMA).parquet(*paths)


def _last_writer_wins(log: DataFrame) -> DataFrame:
    w = Window.partitionBy("key").orderBy(F.desc("updated_at"))
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def current_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """Last-writer-wins view of the log at the head version:
    (key, status, updated_at)."""
    versions = _versions(manifest_dir)
    if not versions:
        return spark.createDataFrame([], MANIFEST_LOG_SCHEMA)
    return _last_writer_wins(_log_frame(spark, manifest_dir, versions[-1]))


def manifest_at(
    spark: SparkSession,
    manifest_dir: str,
    version: int | None = None,
    as_of: "dt.datetime | None" = None,
) -> DataFrame:
    """Time travel: the last-writer-wins view as of a past commit
    ``version`` (every append and every compaction is one version —
    Delta's ``VERSION AS OF``) or an ``as_of`` timestamp (``TIMESTAMP AS
    OF``: replay the head log up to that instant)."""
    versions = _versions(manifest_dir)
    if not versions:
        return spark.createDataFrame([], MANIFEST_LOG_SCHEMA)
    if version is not None:
        if version not in versions:
            raise ValueError(
                f"version {version} not on disk (have {versions}; vacuumed?)"
            )
        log = _log_frame(spark, manifest_dir, version)
    else:
        log = _log_frame(spark, manifest_dir, versions[-1])
    if as_of is not None:
        log = log.filter(F.col("updated_at") <= F.lit(as_of))
    return _last_writer_wins(log)


def compact_manifest(spark: SparkSession, manifest_dir: str) -> None:
    """Write the one-row-per-key snapshot as the next commit (run when
    the log gets long). Readers at older versions are untouched — their
    data dirs remain until ``vacuum_manifest``; readers that list the log
    after the commit rename resolve the snapshot and skip history."""
    versions = _versions(manifest_dir)
    if not versions:
        return
    head = versions[-1]
    v = head + 1
    current_manifest(spark, manifest_dir).write.mode("overwrite").parquet(
        _data_path(manifest_dir, v)
    )
    _commit(manifest_dir, v, "snapshot")


def vacuum_manifest(manifest_dir: str, keep: int = 2) -> None:
    """Reclaim commits no reader inside the retention window can need:
    keep the newest ``keep`` versions readable; everything below the
    newest snapshot at-or-below that window goes (data dir + log entry).
    Run when no reader predates the retained window — the same contract
    as Delta VACUUM."""
    versions = _versions(manifest_dir)
    if not versions:
        return
    cutoff = versions[-1] - max(1, keep) + 1  # oldest version kept readable
    base = versions[0]
    for v in reversed(versions):
        if v <= cutoff and _read_entry(manifest_dir, v)["action"] == "snapshot":
            base = v
            break
    for v in versions:
        if v < base:
            shutil.rmtree(_data_path(manifest_dir, v), ignore_errors=True)
            try:
                os.remove(os.path.join(_log_dir(manifest_dir), f"{v:08d}.json"))
            except FileNotFoundError:
                pass


# ---------------------------------------------------------------------------
# Incremental processing
# ---------------------------------------------------------------------------


def _process_batch(
    spark: SparkSession,
    batch: DataFrame,
    manifest_dir: str,
    process_fn: Callable[[DataFrame], list[str] | None],
    per_bag: bool,
) -> dict[str, str]:
    """Run ``process_fn`` with per-bag failure isolation + status ledger.

    One bag = one unit of *accounting* (the reference's granularity), one
    batch = one set of Spark jobs: ``process_fn`` handles the whole batch
    and reports the keys that failed (the quarantine pattern — decoders
    emit per-bag error rows instead of failing the task, see
    runner.process_bags). A corrupt bag marks `failure` without poisoning
    the batch (O2 semantics — unlike the reference, which treats any
    container STOP as success, processing.py:154-173). A tick discovering
    10k bags therefore runs a constant number of jobs, not 10k.

    Returns {key: "complete" | "failure"} for the batch.
    """
    keys = [r.path for r in batch.select("path").distinct().collect()]
    if not keys:
        return {}
    append_status(spark, manifest_dir, keys, "in progress")
    try:
        failed = set(process_fn(batch) or [])
    except Exception:
        # infrastructure failure (not a per-bag decode error): the whole
        # batch is unaccounted-for → mark everything failed and surface it
        append_status(spark, manifest_dir, keys, "failure")
        raise
    if failed and not per_bag:
        failed = set(keys)  # all-or-nothing accounting
    statuses = {k: "failure" if k in failed else "complete" for k in keys}
    append_status(
        spark, manifest_dir, [k for k in keys if k not in failed], "complete"
    )
    append_status(spark, manifest_dir, sorted(failed), "failure")
    return statuses


def run_available_now(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    manifest_dir: str,
    process_fn: Callable[[DataFrame], None],
    glob: str = "*.bag*",
    per_bag: bool = True,
    timeout_s: int = 300,
) -> None:
    """One streaming tick: process every file not yet seen by the checkpoint
    (exactly-once), recording manifest transitions. Swap
    ``trigger(availableNow=True)`` for ``processingTime='30 minutes'`` to get
    the reference's cron cadence as a long-running query."""
    stream = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
        .load(source_dir)
    )

    def _fb(batch: DataFrame, _epoch: int) -> None:
        _process_batch(spark, batch, manifest_dir, process_fn, per_bag)

    q = (
        stream.writeStream.foreachBatch(_fb)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination(timeout_s)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming tumbling-window counts with late-data handling: events
    older than the watermark are dropped and closed windows emit exactly
    once (append mode). The batch twin is sessionize.tumbling_window_agg —
    same grouping expression, so batch backfill and the live stream produce
    the same table."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), group_col, "n_events")
    )


def attribution_join_streams(
    purchases: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    purchase_ts: str = "purchase_ts",
    click_ts: str = "click_ts",
    horizon: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same key's
    clicks in the preceding ``horizon`` (ad-attribution shape; the streaming
    twin of asof/range_join on batch data).

    Both sides carry watermarks and the join condition bounds event time on
    BOTH sides, so Spark derives a state-retention horizon per side and
    evicts matched/expired rows — state stays O(horizon × rate), never
    O(stream). Inner join → append mode; results for a purchase emit once
    its click-side watermark passes the interval's end.

    ``how="leftOuter"`` is the audit form: every purchase emits exactly
    once — attributed rows as they match, UNATTRIBUTED purchases with a
    NULL click_ts once the watermark guarantees no qualifying click can
    still arrive. The null-flush happens at a later micro-batch than the
    match (it needs the watermark to PASS the horizon), which is why the
    test drives two ticks through one checkpoint.
    """
    if how not in ("inner", "leftOuter", "left_outer", "left"):
        raise ValueError(
            f"attribution join supports inner/leftOuter, got {how!r}: "
            "right/full outer would emit per-click rows, not per-purchase"
        )
    p = purchases.withWatermark(purchase_ts, watermark).alias("p")
    c = clicks.withWatermark(click_ts, watermark).alias("c")
    return p.join(
        c,
        F.expr(
            f"p.{key} = c.{key} AND "
            f"c.{click_ts} >= p.{purchase_ts} - INTERVAL {horizon} AND "
            f"c.{click_ts} <= p.{purchase_ts}"
        ),
        how,
    ).select(
        F.col(f"p.{key}").alias(key),
        F.col(f"p.{purchase_ts}").alias(purchase_ts),
        F.col(f"c.{click_ts}").alias(click_ts),
    )


def session_window_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Native session windows (F.session_window): state merges adjacent
    events within ``gap`` per key; the watermark bounds state retention.
    Works in batch too — the batch gap-and-island formulation
    (sessionize.session_stats) is the window-function twin."""
    df = events
    if events.isStreaming:
        df = events.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def process_pending(
    spark: SparkSession,
    source_dir: str,
    manifest_dir: str,
    process_fn: Callable[[DataFrame], list[str] | None],
    glob: str = "*.bag*",
    per_bag: bool = True,
) -> dict[str, str]:
    """Batch incremental tick: discover files whose manifest status is not
    terminal/active (S1+S2 anti-join), process them, record transitions.

    This is the replay-capable path — a cleared status makes the key
    discoverable again regardless of the streaming checkpoint. Returns
    {key: "complete" | "failure"} for this tick's keys ({} = no work) so
    callers get a programmatic failure signal without scanning the
    manifest."""
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(source_dir)
        .withColumnRenamed("path", "key")
    )
    manifest = current_manifest(spark, manifest_dir)
    new = discover_new(listing, manifest, key_col="key").withColumnRenamed(
        "key", "path"
    )
    return _process_batch(spark, new, manifest_dir, process_fn, per_bag)


def dedup_within_watermark(
    stream, id_col: str = "event_id", ts_col: str = "ts", delay: str = "10 minutes"
):
    """Streaming exact-once-per-id within a bounded horizon: Spark's
    ``dropDuplicatesWithinWatermark`` keeps per-id state only until the
    watermark passes id's first-seen event time + delay, so state is bounded
    by the duplicate-arrival window instead of growing with the full id
    history (the built-in complement to stateful.streaming_dedup, which
    remembers forever). Use when duplicates are caused by at-least-once
    upstream delivery — retries land within minutes, not days."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        [id_col]
    )


def streaming_rollup(
    stream,
    rollup_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "1 hour",
):
    """Continuous aggregate as a stream: every micro-batch folds into the
    incremental rollup table via ``rollup.update_rollup`` (partition-pruned
    read of only the touched windows, dynamic overwrite of only the touched
    partitions) — a materialized view that stays fresh without recomputing
    history. foreachBatch is the right hook because the sink is a keyed
    MERGE-shaped write, not an append.

    Delivery: foreachBatch is at-least-once and the fold is additive, so a
    replayed epoch would double-count — an epoch marker written after each
    fold makes Spark's batch retries (same epoch id re-delivered) no-ops.
    A crash in the instant between fold and marker can still double-fold;
    closing that window needs a transactional table format (Delta/Iceberg
    MERGE keyed on the epoch), same as any non-transactional sink."""
    import os

    from ..operators.rollup import update_rollup

    marker_dir = rollup_path.rstrip("/") + "__epochs"

    def _fold(batch, epoch_id: int) -> None:
        marker = os.path.join(marker_dir, str(epoch_id))
        if os.path.exists(marker):
            return  # retried epoch: already folded
        update_rollup(
            batch.sparkSession, batch, rollup_path,
            ts_col=ts_col, group_col=group_col, window=window,
        )
        os.makedirs(marker_dir, exist_ok=True)
        with open(marker, "w"):
            pass

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def streaming_cms(
    stream,
    sketch_path: str,
    checkpoint: str,
    value_col: str = "event_type",
    depth: int = 4,
    width: int = 256,
):
    """Continuously-maintained count-min sketch: each micro-batch's sketch
    folds into the persisted one by per-(d, bucket) addition — the
    mergeability that makes CMS the right frequency structure for streams
    (state is depth×width rows forever, independent of stream length).
    Idempotence is transactional with the fold itself: the set of folded
    epoch ids rides INSIDE the swapped directory (an underscore-prefixed
    ``_epochs`` parquet subdir, which Spark's parquet scan of the sketch
    dir ignores as metadata), so the fold and its marker commit in the
    same atomic rename. A replayed micro-batch (foreachBatch is
    at-least-once) finds its epoch id already recorded and no-ops — and a
    crash BETWEEN fold and marker is impossible because there is no
    between. Query the live sketch any time with
    ``sketches.cms_estimate(spark.read.parquet(sketch_path), ...)``.
    """
    def _fold(batch, epoch_id: int) -> None:
        cms_fold_batch(batch, epoch_id, sketch_path, value_col, depth, width)

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def cms_fold_batch(
    batch,
    epoch_id: int,
    sketch_path: str,
    value_col: str = "event_type",
    depth: int = 4,
    width: int = 256,
) -> bool:
    """One idempotent CMS fold (the foreachBatch body of ``streaming_cms``,
    exposed for direct testing of replay/crash behavior). Returns True if
    the batch was folded, False if its epoch was already committed.

    The folded-epoch set is written INSIDE the staged sketch directory
    (``_epochs`` subdir) so the fold and its idempotence marker commit in
    the same directory rename; an interrupted swap (sketch absent, staging
    complete) is rolled forward on the next call."""
    import os
    import shutil

    from ..operators.sketches import cms_build

    spark = batch.sparkSession
    staging = sketch_path.rstrip("/") + "__staging"
    if not os.path.exists(sketch_path) and os.path.exists(
        os.path.join(staging, "_epochs")
    ):
        # Crash landed between the two swap renames: staging is a
        # complete committed fold (renames only start after both
        # writes finish), so roll it forward instead of refolding.
        os.rename(staging, sketch_path)
    epochs_path = os.path.join(sketch_path, "_epochs")
    if os.path.exists(epochs_path):
        prev_epochs = spark.read.parquet(epochs_path)
        if prev_epochs.filter(F.col("epoch_id") == epoch_id).count() > 0:
            return False  # retried epoch: fold already committed with swap
    else:
        prev_epochs = None
    new = cms_build(batch, value_col, depth, width)
    if os.path.exists(sketch_path):
        merged = (
            spark.read.parquet(sketch_path)
            .unionByName(new)
            .groupBy("d", "bucket")
            .agg(F.sum("c").alias("c"))
        )
    else:
        merged = new
    this_epoch = spark.createDataFrame([(int(epoch_id),)], "epoch_id bigint")
    all_epochs = (
        prev_epochs.unionByName(this_epoch)
        if prev_epochs is not None
        else this_epoch
    )
    merged.write.mode("overwrite").parquet(staging)
    all_epochs.write.mode("overwrite").parquet(
        os.path.join(staging, "_epochs")
    )
    old = sketch_path.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(sketch_path):
        os.rename(sketch_path, old)
    os.rename(staging, sketch_path)
    shutil.rmtree(old, ignore_errors=True)
    return True


def streaming_bag_ingest(
    spark: SparkSession,
    bags_dir: str,
    dest_dir: str,
    checkpoint: str,
    topics: list[str],
    timeout_s: int = 300,
) -> None:
    """The full reference E1/E2 lifecycle as ONE streaming job over genuine
    ROS bag bytes: rosbag stream source (real binary codec, topic pushdown,
    one bag = one input partition) → ``widen_topic`` per requested topic →
    per-topic parquet tables partitioned by bag_id under
    ``dest_dir/<topic>/`` — the reference's per-topic output layout
    (bag_to_csv.py:114-132) with its 30-minute cron + sensor + replay
    machinery collapsed into a checkpointed AvailableNow tick.

    Exactly-once end-to-end: the source's path-set offsets hand each bag
    to exactly one micro-batch (a bag never spans batches), and the sink
    is idempotent under foreachBatch's at-least-once replay — each topic
    write is a DYNAMIC partition overwrite keyed on bag_id, so a replayed
    batch rewrites its own bags' partitions instead of double-appending.
    Run a long-lived ``processingTime`` trigger for the always-on form.
    """
    from ..operators.flatten import widen_topic
    from ..sources.bag_datasource import BagDataSource

    spark.dataSource.register(BagDataSource)
    stream = (
        spark.readStream.format("rosbag")
        .option("path", bags_dir)
        .option("topics", ",".join(topics))
        .load()
    )

    def _fb(batch: DataFrame, _epoch: int) -> None:
        s = batch.sparkSession
        prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            for topic in topics:
                name = topic.strip("/").replace("/", "_")
                widen_topic(batch, topic).write.partitionBy(
                    "bag_id"
                ).mode("overwrite").option("compression", "snappy").parquet(
                    os.path.join(dest_dir, name)
                )
        finally:
            s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    q = (
        stream.writeStream.foreachBatch(_fb)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def gram_fold_batch(
    batch,
    epoch_id: int,
    gram_path: str,
    vec_col: str = "embedding",
    dim: int = 64,
) -> bool:
    """One idempotent Gram-matrix fold — the linear-algebra member of the
    mergeable-state family (same staged-swap + in-directory epoch ledger
    as ``cms_fold_batch``): each micro-batch contributes its d×d partial
    XᵀX and cells ADD, so the persisted table is always the exact Gram of
    everything folded so far; a PCA/eigensolve can run against the live
    table at any time (operators/linalg.pca_top_component consumes the
    same cell layout). Cells are stored as DECIMAL so folds are exact and
    order-independent across ticks."""
    import os
    import shutil

    from ..operators.linalg import gram_matrix

    spark = batch.sparkSession
    staging = gram_path.rstrip("/") + "__staging"
    if not os.path.exists(gram_path) and os.path.exists(
        os.path.join(staging, "_epochs")
    ):
        os.rename(staging, gram_path)
    epochs_path = os.path.join(gram_path, "_epochs")
    if os.path.exists(epochs_path):
        prev_epochs = spark.read.parquet(epochs_path)
        if prev_epochs.filter(F.col("epoch_id") == epoch_id).count() > 0:
            return False
    else:
        prev_epochs = None
    new = gram_matrix(batch, vec_col, dim, as_decimal=True)
    if os.path.exists(gram_path):
        merged = (
            spark.read.parquet(gram_path)
            .unionByName(new)
            .groupBy("i", "j")
            .agg(F.sum("v").alias("v"))
        )
    else:
        merged = new
    this_epoch = spark.createDataFrame([(int(epoch_id),)], "epoch_id bigint")
    all_epochs = (
        prev_epochs.unionByName(this_epoch)
        if prev_epochs is not None
        else this_epoch
    )
    merged.write.mode("overwrite").parquet(staging)
    all_epochs.write.mode("overwrite").parquet(os.path.join(staging, "_epochs"))
    old = gram_path.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(gram_path):
        os.rename(gram_path, old)
    os.rename(staging, gram_path)
    shutil.rmtree(old, ignore_errors=True)
    return True


def streaming_gram(
    stream,
    gram_path: str,
    checkpoint: str,
    vec_col: str = "embedding",
    dim: int = 64,
):
    """Continuously-maintained Gram matrix over a vector stream — the
    incremental input to PCA/whitening (state is d(d+1)/2 cells forever,
    independent of stream length). Same exactly-once contract as
    ``streaming_cms``."""
    def _fold(batch, epoch_id: int) -> None:
        gram_fold_batch(batch, epoch_id, gram_path, vec_col, dim)

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
