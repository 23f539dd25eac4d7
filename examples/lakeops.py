"""Lake-maintenance end-to-end: the storage-layout operator chain.

    python examples/lakeops.py [sf_dir]

What a table owner runs on a growing parquet lake, composed from the
engine's layout/pruning operators (each tested + oracle-checked):

1. land raw events, fragmented (the streaming-sink shape: many small files)
2. compact to right-sized files (layout.compact_files)
3. rewrite Z-ordered on the two hottest filter columns (write_zordered)
4. build the zone-map stats table (zonemap_stats) — the "manifest metrics"
   that replace per-query footer reads
5. answer a 2-D range query through file skipping (zonemap_pruned_read)
   and show how many files it touched vs the file count
6. prune a fact→filtered-dim join with a Bloom bitmap (bloom_semi_join)
7. pre-flight a join key with the skew report (skew.key_skew_report)

Everything is lazy until the prints; all paths live under a temp dir.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark import (  # noqa: E402
    get_spark,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (  # noqa: E402
    bloom,
    layout,
    skew,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("lakeops")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="lakeops_")
    try:
        raw = os.path.join(tmp, "events_raw")
        lake = os.path.join(tmp, "events_z")

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "user_id", "value", "event_type"
        )

        # 1) fragmented landing (what a micro-batch sink accretes)
        ev.repartition(40).write.parquet(raw)
        n_raw = len([f for f in os.listdir(raw) if f.endswith(".parquet")])

        # 2) compaction
        n_files = layout.compact_files(spark, raw, target_rows_per_file=50_000)
        print(f"== compaction: {n_raw} small files -> {n_files}")

        # 3) Z-order rewrite on the two hottest filter dimensions
        layout.write_zordered(
            spark.read.parquet(raw), lake, ["user_id", "value"],
            n_files=16, bits=10,
        )

        # 4) zone-map stats table (persist this next to the data in prod)
        zm = layout.zonemap_stats(spark, lake, ["user_id", "value"]).cache()
        zm.count()

        # 5) 2-D range query through file skipping
        ranges = {"user_id": (100, 160), "value": (10.0, 30.0)}
        admitted = layout.zonemap_candidate_files(zm, ranges)
        hits = (
            layout.zonemap_pruned_read(spark, lake, ranges, zm)
            .groupBy("event_type")
            .count()
        )
        n_hits = hits.agg(F.sum("count")).first()[0] or 0
        print(
            f"== zone-map scan: {len(admitted)}/16 files admitted, "
            f"{n_hits} rows matched"
        )

        # 6) bloom-pruned join: events of the heaviest-hitting users only
        top_users = (
            spark.read.parquet(lake)
            .groupBy("user_id").count()
            .orderBy(F.desc("count"), "user_id").limit(50)
            .select("user_id")
        )
        joined = bloom.bloom_semi_join(
            spark.read.parquet(lake), top_users, "user_id", m_bits=1 << 18
        )
        print(f"== bloom-pruned join: {joined.count()} events of the top-50 users")

        # 7) skew pre-flight on the join key
        rep = skew.key_skew_report(spark.read.parquet(lake), "user_id").first()
        print(
            f"== key skew: {rep.n_keys} keys, top share "
            f"{rep.top_key_share:.4f}, skew ratio {rep.skew_ratio:.1f} "
            f"-> {'salt it' if rep.skew_ratio > 100 else 'plain shuffle is fine'}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
