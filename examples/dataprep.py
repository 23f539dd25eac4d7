"""Training-data prep end-to-end: the north-star operator chain.

    python examples/dataprep.py [sf_dir]

Runs the document/embedding tables through the full curation pipeline a
large-scale training-data build needs — each stage is one of the engine's
registered, oracle-checked operators:

1. exact + token-set dedup (hash groupBy, one shuffle each)
2. MinHash-LSH near-dup pairs (banded buckets, Jaccard verify)
3. exact char-n-gram Jaccard pairs (prefix-filtered set-similarity join)
4. SimHash Hamming neighbors (integer signatures, pigeonhole bands)
5. quality scoring + language-ID + token budgeting (all JVM built-ins)
6. embedding near-dup pairs (LSH buckets → cosine verify)
7. ANN top-k over the survivors (hyperplane LSH; brute-force on a probe set)
8. the final keep-list: one canonical doc per duplicate cluster, quality-
   and language-filtered, with its token budget

Every transform is lazy; the only actions are the final counts/shows.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark import (  # noqa: E402
    get_spark,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (  # noqa: E402
    dedup,
    similarity,
    textstats,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dataprep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    print(f"== corpus: {docs.count()} docs, {emb.count()} embeddings ({sf_dir})")

    # 1) exact duplicate clusters → canonical keep id per fingerprint
    exact = dedup.exact_dedup_groups(docs)
    print(f"== exact dup groups with >1 member: "
          f"{exact.filter(F.col('n_docs') > 1).count()}")

    # 2) MinHash-LSH near-dups (approximate, 100 TB path)
    near = dedup.minhash_dedup_pairs(docs, threshold=0.8)
    # 3) exact n-gram Jaccard (no recall loss; prefix+length+positional filters)
    ngram = dedup.ngram_jaccard_pairs(docs, threshold=0.8, n=8)
    # 4) SimHash neighbors within Hamming distance 3
    sim = dedup.simhash_near_pairs(docs, bits=32, max_hamming=3)
    print(f"== near-dup pairs: minhash={near.count()} "
          f"ngram_jaccard={ngram.count()} simhash={sim.count()}")

    # 5) quality + language + token budget per doc
    scored = (
        textstats.quality_scores(docs)
        .join(textstats.language_id(docs), "doc_id")
        .join(textstats.token_stats(docs), "doc_id")
    )

    # 6) embedding-level near-dups (LSH buckets, cosine verify)
    edup = dedup.embedding_dup_pairs(emb, dim=64, threshold=0.95)
    print(f"== embedding near-dup pairs (cos ≥ 0.95): {edup.count()}")

    # 8) keep-list: drop the higher id of every near-dup pair, then filter
    drop = (
        near.select(F.col("id_b").alias("doc_id"))
        .union(ngram.select(F.col("id_b").alias("doc_id")))
        .union(sim.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    keep = (
        scored.join(drop, "doc_id", "left_anti")
        .filter((F.col("quality") >= 0.3) & (F.col("pred_lang") != "und"))
    )
    total_docs = docs.count()
    kept = keep.count()
    budget = keep.agg(F.sum("n_tokens").alias("t")).first().t
    print(f"== keep-list: {kept}/{total_docs} docs, {budget} training tokens")
    keep.orderBy(F.desc("quality")).select(
        "doc_id", "pred_lang", "quality", "n_tokens"
    ).show(5)

    # 7) similar-document retrieval over the survivors (LSH ANN)
    topk = similarity.lsh_topk(emb, dim=64, k=3, n_tables=4, n_bits=8)
    print("== ANN top-3 neighbors (hyperplane LSH), sample:")
    topk.orderBy("query_id", "rank").show(6)


if __name__ == "__main__":
    main()
