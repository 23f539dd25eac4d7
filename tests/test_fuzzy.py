"""Edit-distance near-dup pairs (PassJoin segment blocking).

The blocking scheme must be LOSSLESS: every pair the brute-force
``levenshtein(a, b) <= k`` predicate admits must survive candidate
generation. The brute-force cross-join is the in-test oracle.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.fuzzy import (
    edit_distance_pairs,
    edit_distance_survivors,
)


def _pairs(spark, rows, k=2, text_col="text"):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = edit_distance_pairs(df, "doc_id", text_col, k=k)
    return {(r.id_a, r.id_b): r.dist for r in out.collect()}


def _brute(spark, rows, k=2):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = df.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = df.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    out = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("ta", "tb"))
        .filter(F.col("dist") <= k)
    )
    return {(r.id_a, r.id_b): r.dist for r in out.collect()}


def test_known_edits(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "the quick brown fox"),   # exact dup → dist 0
        (3, "the quick brown fux"),   # 1 substitution
        (4, "the quick brwn fox"),    # 1 deletion
        (5, "thX quick brown fuxY"),  # 3 edits vs #1 → excluded at k=2
        (6, "completely different"),
    ]
    got = _pairs(spark, rows)
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1
    assert got[(1, 4)] == 1
    assert got[(3, 4)] == 2
    assert (1, 5) not in got
    assert not any(6 in p for p in got)


def test_tiny_strings_covered(spark):
    # Strings shorter than k+1 can't be pigeonholed; the tiny-string
    # stratum must still pair them ("" vs "ab" is distance 2).
    rows = [(1, ""), (2, "ab"), (3, "a"), (4, "abcde"), (5, "abcdf")]
    got = _pairs(spark, rows)
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 1
    assert got[(4, 5)] == 1
    # "" vs "abcde" is distance 5 — and length-incompatible
    assert (1, 4) not in got


@pytest.mark.parametrize("k", [1, 2, 3])
def test_matches_brute_force(spark, k):
    # Random corpus with planted near-dups at varied lengths, including
    # lengths straddling the tiny-string boundary.
    rng = random.Random(42)
    alphabet = "abcdef"
    rows = []
    doc_id = 0
    for _ in range(40):
        n = rng.randint(0, 12)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        rows.append((doc_id, s))
        doc_id += 1
        if rng.random() < 0.5 and n > 0:
            # planted edit: substitute / delete / insert 1-3 chars
            t = list(s)
            for _ in range(rng.randint(1, 3)):
                op = rng.choice("sdi")
                if op == "s" and t:
                    t[rng.randrange(len(t))] = rng.choice(alphabet)
                elif op == "d" and t:
                    del t[rng.randrange(len(t))]
                else:
                    t.insert(rng.randrange(len(t) + 1), rng.choice(alphabet))
            rows.append((doc_id, "".join(t)))
            doc_id += 1
    assert _pairs(spark, rows, k=k) == _brute(spark, rows, k=k)


def test_survivors_drop_higher_ids(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "the quick brown fux"),
        (3, "unrelated document x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r.doc_id for r in edit_distance_survivors(df, "doc_id", "text").collect()
    )
    assert kept == [1, 3]


def test_no_allpairs_join_in_plan(spark):
    # The main path must be an equi-join on segment keys: the physical plan
    # for a corpus of long strings (no tiny stratum rows) must not contain
    # a cartesian / broadcast nested loop join.
    rows = [(i, f"document number {i} with some shared prefix text") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = edit_distance_pairs(df, "doc_id", "text", k=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "NestedLoopJoin" not in plan
