"""Quickstart: the full pipeline end-to-end on generated fixture data.

    python examples/quickstart.py [workdir]

Generates bag files (one tar.gz-wrapped), runs the incremental pipeline
(discover → decode → infer → aggregate → sinks → manifest), prints the
landing tables, then demonstrates replay-by-clearing-status and a few
analysis queries over the outputs.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark import (  # noqa: E402
    get_spark,
    runner,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (  # noqa: E402
    frames as frames_ops,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources import (  # noqa: E402
    fixtures,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (  # noqa: E402
    pipeline as sp,
)


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="aads_")
    assert not work.startswith("/root/testdata"), (
        "argv[1] is a SCRATCH dir (outputs/checkpoints are written there); "
        "the driver testdata is read-only"
    )
    bags = os.path.join(work, "bags")
    out = os.path.join(work, "out")
    manifest = os.path.join(work, "manifest")

    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"== generating 3 fixture bags under {bags} (one .tar.gz-wrapped)")
    fixtures.write_bag_dir(bags, n_bags=3, tar_gz=(1,))

    cfg = runner.PipelineConfig(bags_dir=bags, output_dir=out, manifest_dir=manifest)
    print("== tick 1: processing", len(runner.run_once(spark, cfg)), "bags")
    print("== tick 2 (no new work):", runner.run_once(spark, cfg))

    print("\n== manifest")
    sp.current_manifest(spark, manifest).show(truncate=60)

    print("== topic landing (partition-pruned /imu read)")
    msgs = spark.read.parquet(f"{out}/topic_messages")
    msgs.filter(F.col("topic") == "/imu").groupBy("bag_id").count().show()

    print("== frame stats (per-frame label pivot)")
    spark.read.parquet(f"{out}/frame_stats").select(
        "bag_id", "camera", "frame_index", "Ped_Count", "Bike_Count"
    ).show(5)

    print("== gap audit over decoded frames")
    frames_df = spark.read.parquet(f"{out}/annotated").select(
        "bag_id", "camera", "frame_index"
    )
    frames_ops.gap_audit(frames_df).show(5)

    print("== replay: clearing one bag's status re-enqueues exactly it")
    key = sp.current_manifest(spark, manifest).orderBy("key").first().key
    sp.clear_status(spark, manifest, [key])
    print("   reprocessed:", runner.run_once(spark, cfg))

    print(f"\nall outputs under {work}")


if __name__ == "__main__":
    main()
