"""Behavioral analytics end-to-end: the event-stream analysis chain.

    python examples/behavior.py [sf_dir]

Runs the events/orders tables through the engine's behavioral family —
each stage a registered, oracle-checked operator:

1. native session windows (F.session_window, streaming-portable)
2. first-order Markov transition matrix (where do users go next?)
3. conversion funnel timing (first view → first purchase latency)
4. inter-purchase gap histogram (repeat-behavior profile)
5. SCD2 state history (what was each user's state at time T?)
6. co-activity interval overlap (which users are online together?)
7. robust outliers (median/MAD, fat-tail-safe)
8. RFM segmentation over orders (quantile-boundary scoring, no ntile sort)
9. spend concentration (Gini) + cumulative adoption curve

Every transform is lazy; the only actions are the final counts/shows.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (  # noqa: E402
    quality,
    scd,
    sessionize,
    stats,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.range_join import (  # noqa: E402
    interval_overlap_join,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.plans.registry import (  # noqa: E402
    _t,
    queries,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("behavior-example")
    spark.sparkContext.setLogLevel("ERROR")
    ev = _t(spark, sf_dir, "events")
    od = _t(spark, sf_dir, "orders")

    # 1. sessions (native windowing — identical code path under streaming)
    sessions = sessionize.session_window_stats(ev, gap="6 hours")
    print("sessions:", sessions.count())

    # 2. where do users go next?
    print("top transitions:")
    sessionize.transition_matrix(ev).orderBy(F.desc("p")).show(5, False)

    # 3./4. conversion timing + repeat behavior (registered queries)
    q = queries()
    print("median-ish conversion latency buckets:")
    q["view_to_purchase_latency"](spark, sf_dir).orderBy("latency_hours").show(5)
    print("inter-purchase gap buckets:", q["inter_purchase_gaps"](spark, sf_dir).count())

    # 5. SCD2: each user's event-type state history
    hist = scd.change_intervals(ev, "user_id", "ts", "event_type", "event_id")
    print("state intervals:", hist.count(), "current:",
          hist.filter("is_current").count())

    # 6. who is co-active? (interval overlap join on daily spans)
    spans = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts")
    )
    pairs = interval_overlap_join(
        spans, spans, "s_ts", "e_ts", "s_ts", "e_ts",
        bucket_ms=6 * 3600 * 1000,
        extra_cond=(F.col("day") == F.col("day_r"))
        & (F.col("user_id") < F.col("user_id_r")),
    )
    print("co-active (user,day) pairs:", pairs.count())

    # 7. robust outliers per event type
    quality.mad_outliers(ev, "event_type", "value", k=3.0).show(5, False)

    # 8./9. customer value: RFM, concentration, adoption
    rfm = stats.rfm_scores(od)
    print("champions (R=F=M=5):",
          rfm.filter("r_score = 5 AND f_score = 5 AND m_score = 5").count())
    q["customer_spend_gini"](spark, sf_dir).show()
    q["cumulative_adoption"](spark, sf_dir).orderBy("day").show(5)


if __name__ == "__main__":
    main()
