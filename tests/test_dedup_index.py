"""Persisted MinHash index: build → probe → append lifecycle.

The invariant that matters: deduplicating batch B against an index built
from corpus A finds exactly the candidate pairs a FULL recompute over A∪B
finds, minus the pairs wholly inside A (already reported when A was
indexed) — at a fraction of the compute.
"""

from __future__ import annotations

import pytest

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    dedup,
    dedup_index,
)

CORPUS_A = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a completely different document about spark engines and parquet"),
    (3, "rain in spain falls mainly on the plain every single day"),
]
BATCH_B = [
    (10, "the quick brown fox jumps over the sleepy dog"),  # near-dups 1
    (11, "the quick brown fox jumps over the lazy dog"),  # exact text of 1
    (12, "nothing like anything else in either corpus at all honestly"),
    (13, "the quick brown fox jumps over the sleepy dog"),  # dup of 10 (in-batch)
]


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("mh_index") / "idx")
    docs_a = spark.createDataFrame(CORPUS_A, "doc_id long, text string")
    dedup_index.build_minhash_index(docs_a, p)
    return p


def test_probe_matches_full_recompute(spark, index_path):
    batch = spark.createDataFrame(BATCH_B, "doc_id long, text string")
    got = {
        tuple(sorted((r.id_new, r.id_match)))
        for r in dedup_index.dedup_against_index(batch, index_path).collect()
    }

    both = spark.createDataFrame(CORPUS_A + BATCH_B, "doc_id long, text string")
    full = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in dedup.lsh_candidate_pairs(both).collect()
    }
    batch_ids = {i for i, _ in BATCH_B}
    expected = {p for p in full if p[0] in batch_ids or p[1] in batch_ids}
    assert got == expected
    assert (1, 11) in got and (10, 13) in got  # cross-index and in-batch dups


def test_probe_estimates_jaccard(spark, index_path):
    batch = spark.createDataFrame(BATCH_B, "doc_id long, text string")
    est = {
        tuple(sorted((r.id_new, r.id_match))): r.est_jaccard
        for r in dedup_index.dedup_against_index(batch, index_path).collect()
    }
    assert est[(1, 11)] == 1.0  # identical text → identical signatures
    assert est[(10, 13)] == 1.0
    assert all(0.0 <= v <= 1.0 for v in est.values())


def test_append_then_probe_sees_appended_docs(spark, index_path):
    batch = spark.createDataFrame(BATCH_B, "doc_id long, text string")
    dedup_index.append_to_minhash_index(batch, index_path)
    probe = spark.createDataFrame(
        [(20, "the quick brown fox jumps over the sleepy dog")],
        "doc_id long, text string",
    )
    got = {
        (r.id_new, r.id_match)
        for r in dedup_index.dedup_against_index(probe, index_path).collect()
    }
    # matches the appended batch's docs (10, 13 are its exact twins).
    assert (20, 10) in got and (20, 13) in got


def test_param_mismatch_rejected(spark, index_path):
    batch = spark.createDataFrame(BATCH_B, "doc_id long, text string")
    with pytest.raises(ValueError, match="built with"):
        dedup_index.dedup_against_index(batch, index_path, num_hashes=8)


def test_bm25_ranks_term_rich_docs_first(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        search,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark runs fast"),
            (2, "spark is a engine"),
            (3, "nothing relevant here at all"),
            (4, "fast cars go fast"),
        ],
        "doc_id long, text string",
    )
    rows = search.bm25_topk(docs, ["spark"], k=4).collect()
    assert [r.doc_id for r in rows[:2]] == [1, 2]  # tf-ordered
    scores = {r.doc_id: r.bm25 for r in rows}
    assert scores[3] == 0.0 and scores[4] == 0.0


def test_tfidf_cosine_pairs_vs_brute_force(spark):
    """Inverted-index TF-IDF cosine == brute-force numpy computation."""
    import math

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        search,
    )

    texts = {
        1: "apple banana cherry apple",
        2: "apple banana cherry",
        3: "dog elephant fox",
        4: "dog elephant fox dog",
        5: "apple dog",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in search.tfidf_cosine_pairs(
            docs, threshold=0.0, max_df_frac=1.0
        ).collect()
    }

    # brute force
    n = len(texts)
    tf: dict = {i: {} for i in texts}
    for i, t in texts.items():
        for w in t.split():
            tf[i][w] = tf[i].get(w, 0) + 1
    df = {}
    for i in texts:
        for w in tf[i]:
            df[w] = df.get(w, 0) + 1
    wts = {
        i: {w: c * math.log(n / df[w]) for w, c in tf[i].items() if df[w] <= n}
        for i in texts
    }
    for (a, b), got_cos in got.items():
        dot = sum(wts[a][w] * wts[b].get(w, 0.0) for w in wts[a])
        na = math.sqrt(sum(v * v for v in wts[a].values()))
        nb = math.sqrt(sum(v * v for v in wts[b].values()))
        assert abs(got_cos - dot / (na * nb)) < 1e-3
    assert (1, 2) in got and got[(1, 2)] > 0.9  # near-identical docs
    assert (3, 4) in got and got[(3, 4)] > 0.9
