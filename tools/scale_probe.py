"""Scale probe BEYOND the bench gate: sf0.1 × {1, 2, 5, 10} synthetic
multiples of the documents/embeddings tables, timing the heavy dedup/ANN
family and fitting per-query growth exponents.

    python tools/scale_probe.py [--multiples 1,2,5,10]

Replication is content-aware so the probe measures "more data of the same
character", not an artifact:

- documents: replica i rotates the alphabet (``translate``) so replicas
  share NO vocabulary — cross-replica near-dup pairs are impossible and
  the true pair count scales LINEARLY with the multiple (k identical
  copies of each doc would instead inflate pairs ~k² and fake a
  quadratic).
- embeddings: ids offset per replica; vectors reused as-is. Top-k probes
  keep a FIXED query set, so candidate work grows with the corpus only.

Prints one JSON line: {"multiples": [...], "per_query": {name:
{"sec": {k: t}, "exponent": e}}} where exponent = log(t_k_max / t_1) /
log(k_max); ~1 linear, ~2 quadratic. Fixed per-job overhead inflates t_1,
so data-bound exponents read LOW — the signal is bucketed paths staying
near-or-below linear while any all-pairs baseline bends up.
"""

from __future__ import annotations

import json
import math
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 100_000_000


def replicate_docs(docs: DataFrame, k: int) -> DataFrame:
    """k replicas with rotated alphabets (disjoint vocabularies)."""
    parts = []
    alpha = string.ascii_lowercase
    for i in range(k):
        rot = alpha[i:] + alpha[:i]
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * ID_STRIDE)).alias("doc_id"),
                F.translate(F.col("text"), alpha, rot).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_embeddings(emb: DataFrame, k: int) -> DataFrame:
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * ID_STRIDE)).alias("vec_id"),
            F.col("embedding"),
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    multiples = [1, 2, 5, 10]
    for a in sys.argv[1:]:
        if a.startswith("--multiples"):
            multiples = [int(x) for x in a.split("=", 1)[1].split(",")]

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        dedup,
        similarity,
    )
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.session import (
        get_spark,
    )

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries0 = emb0.filter(F.col("vec_id") < 10)
    par = spark.sparkContext.defaultParallelism

    def probes(k: int) -> dict:
        docs = replicate_docs(docs0, k)
        emb = replicate_embeddings(emb0, k)
        return {
            "exact_dedup_groups": lambda: dedup.exact_dedup_groups(docs),
            "minhash_dedup_pairs": lambda: dedup.minhash_dedup_pairs(
                docs, threshold=0.8, repartition_to=par
            ),
            "simhash_near_pairs": lambda: dedup.simhash_near_pairs(docs),
            "lsh_topk": lambda: similarity.lsh_topk(
                emb, dim=64, k=5, queries=queries0
            ),
            "brute_force_topk": lambda: similarity.brute_force_topk(
                emb, queries0, k=5
            ),
        }

    results: dict[str, dict] = {}
    for k in multiples:
        for name, fn in probes(k).items():
            if k == multiples[0]:
                # C2 JIT of the generated whole-stage code converges over
                # SEVERAL executions of the same plan shape (measured: the
                # minhash plan runs 12.6→8.7→9.3→1.6 s on repeats) — warm
                # three times on the smallest multiple
                for _ in range(3):
                    fn().write.format("noop").mode("overwrite").save()
            dt = float("inf")
            for _ in range(2):  # min-of-2: residual-compile / GC outliers
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                dt = min(dt, time.time() - t0)
            dt = round(dt, 3)
            results.setdefault(name, {"sec": {}})["sec"][str(k)] = dt
            print(f"  k={k:>2} {name:24s} {dt:7.2f}s", file=sys.stderr)

    k_lo, k_hi = multiples[0], multiples[-1]
    for name, r in results.items():
        t_lo, t_hi = r["sec"][str(k_lo)], r["sec"][str(k_hi)]
        r["exponent"] = round(
            math.log(t_hi / t_lo) / math.log(k_hi / k_lo), 2
        )
    print(json.dumps({"sf_base": SF_DIR, "multiples": multiples,
                      "per_query": results}))


if __name__ == "__main__":
    main()
