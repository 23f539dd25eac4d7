"""End-to-end pipeline runner (E1: O1/O2 composition).

The reference's DAG — sensor → tag → Fargate extract → label → aggregate →
draw → tag complete (rosbag_processing.py:131-136, processing.py:30-50,
141-173) — collapses into one incremental Spark job per tick:

    discover (manifest anti-join / stream checkpoint)
      → decode bags → topic landing (K1)
      → frames → infer labels (P13) → frame_stats pivot (A1+A2, K4)
      → annotate (P12) → binary sink (K7)
      → manifest transitions in progress → complete | failure (O1/O2, K8)

The empty-discovery branch (O1 ``no_work``) is a no-op tick; failures mark
``failure`` per bag instead of the reference's silent container-STOP=success
(processing.py:154-173). Every stage is a DataFrame transform — no XCom, no
polling; lineage replaces cross-task value passing (O5).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .operators import annotate, frame_stats, sinks
from .schemas import TOPIC_WHITELIST
from .sources import frames_source
from .streaming import pipeline as sp


@dataclass
class PipelineConfig:
    bags_dir: str
    output_dir: str
    manifest_dir: str
    # the reference's acceptable_topics whitelist (engine.py:200-209);
    # keeps sensor_msgs/Image blobs out of the message landing table
    # (frames take the decode_bag_frames path). None = decode everything.
    topics: list[str] | None = field(
        default_factory=lambda: list(TOPIC_WHITELIST)
    )
    model_fn: object = None  # P13 plug; None = numpy color-blob detector
    sync_dir: str | None = None  # optional K2 file-tree export
    extra: dict = field(default_factory=dict)


def process_bags(
    spark: SparkSession, cfg: PipelineConfig, batch: DataFrame
) -> list[str]:
    """One batch of bag blobs through the full E2+E1 computation.

    Both bag outputs (topic tables AND frames) come from the same scan —
    the reference needs two full bag passes plus a realtime replay
    (engine.py:96-137); here each is one ``mapInPandas`` decode over the
    already-loaded blobs. Appends (not overwrites) so each incremental tick
    adds its bags to the landing tables.

    Failure isolation is the quarantine pattern: the decoders run with
    ``on_error="quarantine"`` so a corrupt bag becomes one error row, the
    whole batch is ONE set of Spark jobs regardless of bag count, and the
    failed paths ride back on the write job's ``observe()`` metrics (no
    extra pass, no driver-side per-bag loop). Returns the failed bag paths
    (O2: the caller records them as ``failure`` in the manifest).

    REPLAY-IDEMPOTENT sinks: every landing table partitions by bag_id and
    writes as a DYNAMIC partition overwrite, so a bag re-run after
    ``clear_status`` (or a tick retried after a mid-pipeline failure)
    rewrites ITS OWN partitions instead of appending duplicates — a bag
    whose telemetry landed but whose frames stage failed would otherwise
    double its topic_messages on replay.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    bad = F.col("decode_error").isNotNull()
    failed_set = F.collect_set(F.when(bad, F.col("bag_path")))

    # A3: pipeline counters via observe() — collected from the write job
    # itself, no extra pass over the data (the reference counts uploads in a
    # Python loop, engine.py:282-300).
    obs = Observation("decode_metrics")
    msgs = frames_source.decode_bag_blobs(
        batch, cfg.topics, on_error="quarantine"
    ).observe(
        obs,
        F.count(F.when(~bad, F.lit(1))).alias("n_messages"),
        # observe() forbids DISTINCT aggregates; HLL is exact at topic-count
        # cardinalities
        F.approx_count_distinct(F.when(~bad, F.col("topic"))).alias("n_topics"),
        failed_set.alias("failed_paths"),
    )
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    msgs.filter(~bad).drop("bag_path", "decode_error").write.partitionBy(
        "bag_id", "topic"
    ).mode("overwrite").option("compression", "snappy").parquet(
        f"{cfg.output_dir}/topic_messages"
    )
    cfg.extra["last_metrics"] = obs.get
    failed = list(obs.get["failed_paths"])

    good = batch
    if failed:
        good = batch.filter(~F.col("path").isin(failed))
    frames_obs = Observation("frame_decode")
    # persist: the bag parse + per-frame PNG encode is the most expensive
    # stage, and frames feeds THREE sinks (stats, labels, annotated) —
    # uncached it would re-decode every bag once per sink
    frames = (
        frames_source.decode_bag_frames(good, on_error="quarantine")
        .observe(frames_obs, failed_set.alias("failed_paths"))
        .filter(~bad)
        .drop("bag_path", "decode_error")
    ).persist()
    labels = annotate.infer_labels(frames, model_fn=cfg.model_fn).persist()
    try:
        stats = frame_stats.pivot_stats(labels)
        stats.write.partitionBy("bag_id").mode("overwrite").parquet(
            f"{cfg.output_dir}/frame_stats"
        )
        failed += [
            p for p in frames_obs.get["failed_paths"] if p not in failed
        ]
        labels.write.partitionBy("bag_id", "camera").mode("overwrite").json(
            f"{cfg.output_dir}/labels"
        )

        annotated = annotate.annotate_frames(
            frames.join(labels, ["bag_id", "camera", "frame_index"])
        )
        annotated.write.partitionBy("bag_id", "camera").mode(
            "overwrite"
        ).parquet(f"{cfg.output_dir}/annotated")
        if cfg.sync_dir is not None:
            sinks.export_binary_files(
                annotated.withColumn("filename", sinks.frame_filename()),
                cfg.sync_dir,
            )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
        frames.unpersist()
        labels.unpersist()
    return failed


def run_once(spark: SparkSession, cfg: PipelineConfig) -> dict[str, str]:
    """One incremental tick (batch form — the replay-capable path).

    Returns {bag key: "complete" | "failure"} for this tick; {} = the O1
    ``no_work`` branch.
    """
    return sp.process_pending(
        spark,
        cfg.bags_dir,
        cfg.manifest_dir,
        lambda batch: process_bags(spark, cfg, batch),
    )


def run_stream_tick(spark: SparkSession, cfg: PipelineConfig, checkpoint_dir: str) -> None:
    """One ``Trigger.AvailableNow`` streaming tick (exactly-once discovery
    via checkpoint; the O4 form of the reference's 30-minute cron)."""
    sp.run_available_now(
        spark,
        cfg.bags_dir,
        checkpoint_dir,
        cfg.manifest_dir,
        lambda batch: process_bags(spark, cfg, batch),
    )
