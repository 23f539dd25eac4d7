"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full execution, no
driver-side materialization — the 100 TB-honest way to time a plan).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.plans import (
        registry,
    )
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.session import (
        get_spark,
    )

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    heads = registry.headline_queries()
    # Warm each query once at the target SF (Janino codegen + HotSpot JIT of
    # the generated classes — a one-time ~10-20s cost for the heaviest
    # expression trees, and C2 only kicks in with enough rows), then time the
    # steady state. That's what a long-running cluster job sees; cold-start
    # compile time is not a per-query property. Verified: repeat runs re-run
    # all stages (no cross-job shuffle reuse inflating the numbers).
    for fn in heads.values():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # min of 3 timed runs per query, rounds INTERLEAVED across queries:
    # single measurements on a shared host showed 3x outliers from CPU
    # contention, and back-to-back repeats share the same burst — spreading
    # a query's samples across the whole bench decorrelates them. The min is
    # the standard noise-resistant estimator of the plan's actual cost.
    timings: dict[str, float] = {n: float("inf") for n in heads}
    for _round in range(3):
        for name, fn in heads.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = min(timings[name], time.time() - t0)
    timings = {n: round(v, 3) for n, v in timings.items()}

    # Per-round history: compare against the latest recorded BENCH_r{N}.json
    # so each round's line carries its own deltas (extra keys; the driver's
    # parser only needs metric/value/unit/queries/sf).
    prev_round, prev_queries = None, {}
    here = os.path.dirname(os.path.abspath(__file__))
    import glob

    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
            parsed = rec.get("parsed", rec)
            if parsed and parsed.get("queries"):
                prev_round = int(re.search(r"BENCH_r(\d+)", path).group(1))
                prev_queries = parsed["queries"]
        except Exception:
            continue

    out = {
        "metric": "headline_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if prev_queries:
        out["prev_round"] = prev_round
        out["delta_vs_prev"] = {
            n: round(timings[n] - prev_queries[n], 3)
            for n in timings
            if n in prev_queries
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
