"""Statistical-inference tour: the measurement layer of the engine.

    python examples/statistics.py [sf_dir]

Every number a dashboard shows deserves an uncertainty, a drift check,
and a changepoint — this tour runs the registry's inference family over
the events/orders tables, each stage a registered, oracle-checked query:

1.  fleet_health_daily        — the dashboard the rest interrogates
2.  bootstrap_mean_ci         — 95% CI for mean order value (Poisson bootstrap)
3.  weekend_spend_ttest       — is the weekend difference real? (Welch t)
4.  psi_value_drift           — has the value distribution shifted? (PSI)
5.  cusum_changepoint         — when did the level shift? (CUSUM MLE)
6.  seasonal_naive_mase       — is weekly seasonality real signal? (MASE)
7.  daily_autocorrelation     — which lag carries it? (ACF)
8.  type_cross_correlation    — does one series lead another?
9.  count_burstiness          — Poisson-like or bursty arrivals? (Fano)
10. lines_per_order_poisson_gof — does the Poisson assumption even hold?
11. km_time_to_purchase       — conversion timing with censoring (KM)
12. revenue_bridge_monthly    — attribute the move: volume vs price
13. quantity_price_correlation / customer_spend_gini / mad_anomalies —
    relationship, concentration, robust outliers
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.plans.registry import (  # noqa: E402
    queries,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.session import (  # noqa: E402
    get_spark,
)

TOUR = [
    ("fleet_health_daily", 5),
    ("bootstrap_mean_ci", 1),
    ("weekend_spend_ttest", 1),
    ("psi_value_drift", 1),
    ("cusum_changepoint", 5),
    ("seasonal_naive_mase", 5),
    ("daily_autocorrelation", 7),
    ("type_cross_correlation", 7),
    ("count_burstiness", 5),
    ("lines_per_order_poisson_gof", 7),
    ("km_time_to_purchase", 11),
    ("revenue_bridge_monthly", 5),
    ("quantity_price_correlation", 3),
    ("customer_spend_gini", 1),
    ("mad_anomalies", 5),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("statistics-example")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()
    for name, n in TOUR:
        print(f"\n== {name}")
        q[name](spark, sf_dir).show(n, truncate=False)


if __name__ == "__main__":
    main()
