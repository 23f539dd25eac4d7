"""Persisted-index lifecycle end-to-end: build → serve → append → re-serve.

    python examples/index_lifecycle.py [sf_dir]

The production ANN/dedup shape is build-once-probe-many: the expensive
pass (clustering, graph construction, codebook training, shingling)
amortizes across every later query, and each index's storage layout turns
serving into a pruned read. This tour walks every persisted index the
engine ships, on one corpus, through the full lifecycle:

1. split the embedding corpus into an initial load and an arriving batch
2. build the four ANN indexes over the initial load — IVF (list-partitioned
   lists → partition-pruned probes), HNSW (degree-bounded graph → corpus-
   size-independent search), LSH ((table, bucket)-partitioned buckets),
   PQ (m codes/vector — the memory-bound member; geometry self-described
   by its params file, written last as the build-completed marker)
3. serve one query set through all four and score recall@k against the
   exact brute-force top-k
4. append the arriving batch to each index WITHOUT a rebuild (the
   append-then-rebuild contract: correctness immediately, rebuild when
   drift/degree-overflow grows) and prove the new vectors are findable
5. same lifecycle for the incremental MinHash dedup index over documents:
   build, probe an arriving batch with a planted near-dup, append

Everything lands under a temp dir; sized for the sample tables, the same
calls run at lake scale (the layouts exist for exactly that).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark import (  # noqa: E402
    get_spark,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (  # noqa: E402
    dedup_index,
    similarity,
)

DIM = 64
K = 5


def _recall(got_df, want: set[tuple]) -> float:
    got = {(r.query_id, r.neighbor_id) for r in got_df.collect()}
    return len(got & want) / len(want)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("index_lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="idxlife_")
    try:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # deterministic split: ~80% initial load, ~20% arriving batch
        initial = emb.filter(F.col("vec_id") % 5 != 0)
        arriving = emb.filter(F.col("vec_id") % 5 == 0)
        queries = emb.filter(F.col("vec_id") % 97 == 1)
        n0, n1, nq = initial.count(), arriving.count(), queries.count()
        print(f"corpus: {n0} initial + {n1} arriving vectors, {nq} queries")

        exact = {
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(initial, queries, k=K).collect()
        }

        paths = {name: os.path.join(tmp, name) for name in
                 ("ivf", "hnsw", "lsh", "pq")}
        builds = {
            "ivf": lambda: similarity.build_ivf_index(
                initial, paths["ivf"], n_lists=8),
            "hnsw": lambda: similarity.build_hnsw_index(
                initial, paths["hnsw"], degree=8),
            "lsh": lambda: similarity.build_lsh_index(
                initial, paths["lsh"], dim=DIM, n_tables=8, n_bits=4),
            "pq": lambda: similarity.build_pq_index(
                initial, paths["pq"], dim=DIM, m=8, n_codes=32),
        }
        searches = {
            "ivf": lambda q, k=K: similarity.search_ivf_index(
                spark, paths["ivf"], q, k=k, n_probe=4),
            "hnsw": lambda q, k=K: similarity.search_hnsw_index(
                spark, paths["hnsw"], q, k=k),
            "lsh": lambda q, k=K: similarity.search_lsh_index(
                spark, paths["lsh"], q, k=k),
            # geometry (dim, m) read from the index's own params file
            "pq": lambda q, k=K: similarity.search_pq_index(
                spark, paths["pq"], q, k=k),
        }
        appends = {
            "ivf": lambda: similarity.append_to_ivf_index(
                arriving, paths["ivf"]),
            "hnsw": lambda: similarity.append_to_hnsw_index(
                arriving, paths["hnsw"], degree=8),
            "lsh": lambda: similarity.append_to_lsh_index(
                arriving, paths["lsh"]),
            "pq": lambda: similarity.append_to_pq_index(
                arriving, paths["pq"]),
        }

        # PQ serves as a SHORTLIST generator (ADC candidates → exact
        # rerank), so it is scored on exact-top-K containment in its
        # ADC top-10K shortlist; uniform random vectors are PQ's
        # adversarial case (no cluster structure for the codebooks).
        score_k = {"ivf": K, "hnsw": K, "lsh": K, "pq": 10 * K}
        for name in paths:
            t0 = time.time()
            builds[name]()
            tb = time.time() - t0
            t0 = time.time()
            rec = _recall(searches[name](queries, score_k[name]), exact)
            ts = time.time() - t0
            label = (f"recall@{K}" if score_k[name] == K
                     else f"exact-top{K} in ADC top{score_k[name]}")
            print(f"{name:>4}: build {tb:5.1f}s   "
                  f"serve {ts:4.1f}s   {label} {rec:.2f}")

        # append the arriving batch, then query AS the batch: every index
        # must now see the new vectors (each one's own nearest neighbor
        # set is drawn from the grown corpus, no rebuild needed)
        probe = arriving.limit(5)
        probe_ids = [r.vec_id for r in probe.select("vec_id").collect()]
        for name in paths:
            t0 = time.time()
            appends[name]()
            got = searches[name](probe)
            n_served = got.filter(
                F.col("query_id").isin(probe_ids)
            ).select("query_id").distinct().count()
            print(f"{name:>4}: append+re-serve {time.time() - t0:4.1f}s   "
                  f"{n_served}/{len(probe_ids)} appended queries answered")

        # --- MinHash dedup index over documents: the same lifecycle ---
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        d_initial = docs.filter(F.col("doc_id") % 5 != 0)
        d_batch = docs.filter(F.col("doc_id") % 5 == 0)
        # plant one near-dup: an arriving doc that copies an indexed one
        src = d_initial.orderBy("doc_id").limit(1).collect()[0]
        planted = spark.createDataFrame(
            [(9_000_000, src.text + " tail", src.lang, src.source,
              len(src.text) + 5)],
            docs.schema,
        )
        d_batch = d_batch.unionByName(planted)

        mh = os.path.join(tmp, "minhash")
        t0 = time.time()
        dedup_index.build_minhash_index(d_initial, mh)
        tb = time.time() - t0
        t0 = time.time()
        cands = dedup_index.dedup_against_index(d_batch, mh)
        hits = cands.filter(F.col("id_new") == 9_000_000).count()
        tp = time.time() - t0
        print(f"minhash: build {tb:5.1f}s   probe {tp:4.1f}s   "
              f"planted near-dup found: {hits >= 1}")
        assert hits >= 1, "planted near-dup must surface as a candidate"
        dedup_index.append_to_minhash_index(
            d_batch.filter(F.col("doc_id") != 9_000_000), mh
        )
        n_sigs = spark.read.parquet(f"{mh}/signatures").count()
        print(f"minhash: appended batch → {n_sigs} signatures in store")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
