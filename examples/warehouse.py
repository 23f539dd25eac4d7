"""Warehouse analytics end-to-end: the classic query-shape tour.

    python examples/warehouse.py [sf_dir]

Runs the TPC-H-family shapes the engine registers, in the order an
analyst builds up a revenue review — every stage a registered,
oracle-checked query:

1. pricing summary (Q1: scan→filter→agg)
2. regional revenue + market share (Q5/Q8 family)
3. shipping priority (Q3: segment gate + top-k)
4. volume shipping between nations (Q7: five-way join)
5. product-type profit by nation/year (Q9 adaptation)
6. returned-item report (Q10: lost-revenue triage)
7. value-share important parts (Q11: scalar-subquery threshold)
8. large orders (Q18: aggregate-then-join)
9. sole-supplier exposure (Q21 semantics as one aggregate)
10. idle rich customers (Q22: scalar avg + anti join)
11. grains in one pass (GROUPING SETS) + the pivot matrix
12. customer value: RFM, spend Gini, basket lift

Every transform is lazy; the only actions are the final shows.
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
    ("pricing_summary", 6),
    ("region_revenue", 5),
    ("nation_market_share", 5),
    ("shipping_priority", 5),
    ("volume_shipping", 5),
    ("product_type_profit", 5),
    ("returned_item_report", 5),
    ("important_parts", 5),
    ("large_orders", 5),
    ("sole_supplier_orders", 5),
    ("idle_rich_customers", 5),
    ("forecast_revenue_change", 1),
    ("promo_revenue_share", 1),
    ("bracket_revenue", 1),
    ("priority_shipment_counts", 2),
    ("cheapest_supplier_per_part", 5),
    ("top_supplier_revenue", 3),
    ("promo_heavy_suppliers", 5),
    ("grouping_sets_revenue", 10),
    ("status_priority_matrix", 5),
    ("rfm_scores", 5),
    ("customer_spend_gini", 1),
    ("part_basket_lift", 5),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("warehouse-example")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()
    for name, n in TOUR:
        print(f"\n== {name}")
        q[name](spark, sf_dir).show(n, truncate=False)


if __name__ == "__main__":
    main()
