"""Dump per-headline-query formatted physical plans to plans/r21/.

Usage:
    python tools/dump_plans_r21.py before   # plans/r21/<query>_before.txt
    python tools/dump_plans_r21.py after    # plans/r21/<query>_after.txt

Runs at the bench scale factor (sf0.1 by default) with the same session
factory the bench uses, so the plans match what BENCH_full times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.plans import (
        registry,
    )
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.session import (
        get_spark,
    )

    spark = get_spark("plan-dump-r21")
    spark.sparkContext.setLogLevel("ERROR")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r21")
    os.makedirs(outdir, exist_ok=True)
    n = 0
    for name, spec in registry.QUERIES.items():
        if not spec.headline or (only and name not in only):
            continue
        df = spec.fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan.rstrip() + "\n")
        n += 1
    print(f"wrote {n} plans to {outdir} (*_{suffix}.txt)")


if __name__ == "__main__":
    main()
