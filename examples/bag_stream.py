"""End-to-end streaming bag ingestion on genuine ROS bag 2.0 bytes.

The reference's E1/E2 lifecycle (30-min cron + S3 sensor discovers bags →
ECS task replays each bag → per-topic CSVs, rosbag_processing.py:16-24 +
bag_to_csv.py:114-132) as ONE checkpointed Spark streaming job:

    rosbag stream source (real codec, topic pushdown, 1 bag = 1 partition)
      → widen_topic (long→wide typed tables, pure codegen)
      → per-topic parquet partitioned by bag_id (idempotent dynamic
        partition overwrite — replay-safe)

Run: python examples/bag_stream.py [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.session import (  # noqa: E402
    get_spark,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources import (  # noqa: E402
    fixtures,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (  # noqa: E402
    pipeline as sp,
)


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_bag_stream"
    assert not work.startswith("/root/testdata"), (
        "argv[1] is a SCRATCH dir (outputs/checkpoints are written there); "
        "the driver testdata is read-only"
    )
    bags, dest, ck = f"{work}/bags", f"{work}/lake", f"{work}/ck"
    spark = get_spark("bag-stream-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== tick 1: two bags land")
    fixtures.write_bag_dir(bags, n_bags=2, tar_gz=())
    sp.streaming_bag_ingest(spark, bags, dest, ck, topics=["/imu", "/gps"])
    spark.read.parquet(f"{dest}/imu").groupBy("bag_id").count().show()

    print("== tick 2: one more bag arrives; only it is decoded")
    fixtures.write_bag_dir(bags, n_bags=3, tar_gz=())
    sp.streaming_bag_ingest(spark, bags, dest, ck, topics=["/imu", "/gps"])
    spark.read.parquet(f"{dest}/imu").groupBy("bag_id").count().show()

    print("== typed wide schema for /gps")
    spark.read.parquet(f"{dest}/gps").printSchema()
    print(f"outputs under {work}")


if __name__ == "__main__":
    main()
