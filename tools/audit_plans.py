"""Physical-plan audit over every registered query.

Flags plan smells that break at 100 TB:

- CartesianProduct (all-pairs join with no key)
- BroadcastNestedLoopJoin outside the queries that document it (exact
  brute-force paths)
- row-at-a-time Python UDFs (BatchEvalPython) — Arrow paths are fine
- full-width parquet scans (ReadSchema covering EVERY column of a wide
  table — no column pruning)
- MORE BroadcastNestedLoopJoins than a query's documented allowance (the
  allowance is a per-query COUNT, so a regression that adds a second,
  unbounded nested loop to an allowlisted query is still flagged)

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
# name -> max allowed BNLJ operator count in the plan (measured from the
# documented-contract plans; a regression ADDING a nested loop beyond the
# allowance is flagged even for allowlisted queries)
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


# measured operator counts for the documented-contract plans: a
# regression ADDING a nested loop beyond these is flagged even for
# allowlisted queries (set exempted the whole plan before)
_BNLJ_ALLOWANCE = {
    "ann_recall_at5": 1,
    "benchmark_contamination_bloom": 1,
    "benford_first_digit": 1,
    "bigram_pmi": 2,
    "bloom_prune_join": 1,
    "bm25_topk": 1,
    "brute_force_topk": 1,
    # 3: verdict assembly — cross joins of four broadcast 1-row count
    # aggregates (CDC vs fixed-chunk survival shares)
    "cdc_boundary_stability": 3,
    # 1: bounded-vs-unbounded length verdict — two broadcast 1-row aggs
    "cdc_bounded_length_stats": 1,
    # 3: same verdict-assembly shape (ngram vs skipgram hit shares)
    "skipgram_vs_ngram_under_edits": 3,
    "chi2_lang_source": 1,
    "contrastive_negatives": 1,
    "cosine_similarity_histogram": 1,
    # 2: the lag-pair broadcast + the 1-row global-moments broadcast the
    # standard-ACF form adds (single series mean / sum of squares)
    "daily_autocorrelation": 2,
    "distinctive_terms": 1,
    "dow_effect_size": 3,
    "embedding_dup_pairs": 1,
    "equi_depth_price_histogram": 1,
    "event_type_pagerank": 22,
    "funnel_stages": 2,
    "hnsw_recall_at5": 1,
    "idle_rich_customers": 1,
    "important_parts": 1,
    "ivf_recall_at5": 3,
    "ivf_topk": 2,
    "ivf_topk_fast": 2,
    "km_time_to_purchase": 1,
    "knn_graph_clustering": 2,
    "lines_per_order_poisson_gof": 1,
    "lm_fluency_scores": 1,
    "minhash_recall_audit": 1,
    "part_basket_lift": 1,
    "pq_recall_at5": 1,
    "price_quartiles": 1,
    "psi_value_drift": 6,
    "rfm_scores": 3,
    "semantic_dedup_survivors": 3,
    "session_impl_consistency": 1,
    "session_type_lift": 1,
    "simhash_recall_audit": 2,
    "similar_nation_names": 1,
    "source_kl_divergence": 4,
    "tfidf_cosine_pairs": 4,
    "type_cross_correlation": 1,
    "value_histogram": 1,
    "winsorized_value_stats": 1,
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

    import re

    widths = {
        t: len(spark.read.parquet(f"{SF_DIR}/{t}.parquet").columns)
        for t in _TABLES
    }

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
        n_bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
        allowed = _BNLJ_ALLOWANCE.get(name, 0)
        if n_bnlj > allowed:
            smells.append(
                f"BroadcastNestedLoopJoin x{n_bnlj} (allowed {allowed})"
            )
        if "BatchEvalPython" in plan:
            smells.append("row-at-a-time Python UDF")
        smells += _full_width_scans(plan, widths, name)
        status = "ok" if not smells else "SMELL: " + ", ".join(smells)
        print(f"{name:<26} {status}")
        failures += bool(smells)
    print(f"\n{len(names) - failures} clean / {len(names)} audited")
    return 1 if failures else 0


_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# queries that legitimately need EVERY column of a wide table
ALLOWED_FULL_SCAN: set[str] = set()

_FULL_SCAN_MIN_WIDTH = 8  # narrow dims reading all columns is fine


def _top_level_fields(struct_body: str) -> int:
    """Count top-level fields of a ReadSchema struct<...> body (nested
    structs/arrays contain commas — count at bracket depth 0)."""
    depth, n = 0, 0
    if not struct_body.strip():
        return 0
    for ch in struct_body:
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n + 1


def _full_width_scans(plan: str, widths: dict, name: str) -> list[str]:
    """Flag parquet scans whose ReadSchema covers EVERY column of a wide
    gate table — no column pruning reached the scan."""
    import re

    if name in ALLOWED_FULL_SCAN:
        return []
    out = []
    table = None
    for line in plan.splitlines():
        m = re.search(r"/([a-z_]+)\.parquet", line)
        if "Location" in line and m:
            table = m.group(1)
            continue
        m = re.search(r"ReadSchema: struct<(.*)>\s*$", line)
        if m and table in widths:
            w = widths[table]
            n = _top_level_fields(m.group(1))
            if w >= _FULL_SCAN_MIN_WIDTH and n >= w:
                out.append(f"full-width scan of {table} ({n}/{w} cols)")
            table = None
    return sorted(set(out))


if __name__ == "__main__":
    raise SystemExit(main())
