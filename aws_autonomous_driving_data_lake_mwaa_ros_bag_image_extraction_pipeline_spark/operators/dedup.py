"""Deduplication operators over the ``documents`` table (north-star).

Five strategies, all shuffle-aware:

- exact:      md5(normalized text) groupBy — one shuffle on a 32-byte key.
- token-set:  md5(sorted distinct tokens) — order-insensitive exact dup.
- minhash+LSH: shingles → k seeded min-hashes → b bands → bucket self-join.
  The self-join is on band keys, so candidate generation is O(collisions),
  never O(n²) — the 100 TB path. Hashes are md5-based so the DuckDB oracle
  can reproduce them bit-for-bit (see plans/registry.py).
- simhash:    per-bit majority vote over token hashes; equal-signature
  grouping for near-dup buckets.
- embedding:  cosine > threshold pairs (exact for small n; LSH-bucketed in
  operators/similarity.py for scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vectors as V
from ..functions.hashing import hex_digit_val


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: fingerprint, member
    count, canonical (min) id. Map-side partial agg → tiny shuffle."""
    return (
        docs.select(F.col(id_col), T.fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative per fingerprint (lowest id — deterministic)."""
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        docs.withColumn("fp", T.fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("fp", "__rn")
    )


def token_set_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-insensitive duplicate groups (sorted-token fingerprint)."""
    return (
        docs.select(F.col(id_col), T.sorted_token_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


# --- MinHash + LSH -----------------------------------------------------------

def _seeded_min_hash(shingles: Column, seed: int) -> Column:
    # One-arg lambda via closure: a `i=i` default param would make PySpark
    # pass the array index as the second lambda arg (HOF arity comes from the
    # signature, defaults included) and the seed literal would be garbage.
    prefix = f"{seed}:"
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(prefix), s)))
    )


def _min_hashes(shingles: Column, num_hashes: int) -> list[Column]:
    """k independent min-hashes of a shingle array.

    Hash family = md5 of ``seed:shingle``; the *minimum hex string* under each
    seed is a uniform permutation minimum — equivalent to numeric minhash and
    reproducible in any engine with md5.
    """
    return [
        _seeded_min_hash(shingles, i).alias(f"mh{i}") for i in range(num_hashes)
    ]


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    num_hashes: int = 12,
) -> DataFrame:
    shingles = F.array_distinct(T.word_ngrams(F.col(text_col), shingle_len))
    return docs.select(
        F.col(id_col),
        *[
            c
            for c in _min_hashes(shingles, num_hashes)
        ],
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Band-bucket self-join → candidate near-dup pairs (id_a < id_b).

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows; a pair
    collides if any band matches exactly. The join key is the 32-byte band
    hash — skew-safe for natural text; AQE skew-join splits pathological
    buckets (e.g. empty docs).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, shingle_len, num_hashes)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    long = banded.select(
        F.col(id_col),
        F.explode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias("bucket"),
    )
    a = long.alias("a")
    b = long.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (verification step).

    Joins the (small) candidate set back to shingle arrays; intersection and
    union computed JVM-side with array intrinsics.
    """
    sh = docs.select(
        F.col(id_col),
        F.array_distinct(T.word_ngrams(F.col(text_col), shingle_len)).alias("sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return j.select(
        "id_a",
        "id_b",
        (inter.cast("double") / union).alias("jaccard"),
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates → exact Jaccard ≥ t."""
    cands = lsh_candidate_pairs(docs, id_col, text_col, shingle_len, num_hashes, bands)
    return jaccard_pairs(docs, cands, id_col, text_col, shingle_len).filter(
        F.col("jaccard") >= threshold
    )


# --- SimHash -----------------------------------------------------------------

def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """``bits``-bit SimHash: bit b = majority vote of bit b of md5(token)
    over the document's distinct tokens. Bit source = low bit of each hex
    digit — reproducible in the SQL oracle via strpos arithmetic.
    """
    def _bit_counter(b: int):
        # Two-arg merge lambda via closure — a `b=b` default would raise the
        # apparent arity to 3 and break F.aggregate (see _seeded_min_hash).
        return lambda acc, h: acc + hex_digit_val(h, b + 1) % 2

    toks = F.array_distinct(T.tokens(F.lower(F.col(text_col))))
    hashes = F.transform(toks, lambda t: F.md5(t))
    bit_cols = []
    for b in range(bits):
        ones = F.aggregate(hashes, F.lit(0), _bit_counter(b))
        bit_cols.append(F.when(ones * 2 >= F.size(toks), F.lit("1")).otherwise(F.lit("0")))
    return docs.select(F.col(id_col), F.concat(*bit_cols).alias("simhash"))


def simhash_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """Documents sharing an identical simhash signature (near-dup buckets)."""
    return (
        simhash(docs, id_col, text_col, bits)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


# --- Embedding near-dup ------------------------------------------------------

def embedding_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_bits: int = 6,
) -> DataFrame:
    """Cosine-similar pairs above threshold — LSH-bucketed (the scale path).

    Candidates come from hyperplane-LSH bucket collisions
    (similarity.lsh_buckets): the self-join key is (table, bucket), so the
    work is O(collisions), never O(n²). The candidate shuffle carries only id
    pairs; vectors are joined back afterwards for the exact cosine verify.
    Recall is tunable via (n_tables, n_bits) — more tables → higher recall,
    fewer bits → bigger buckets. For an exact (oracle-checkable) answer use
    ``embedding_dup_pairs_exact``.
    """
    from . import similarity

    bk = similarity.lsh_buckets(emb, dim, n_tables, n_bits, id_col, vec_col)
    a = bk.select(F.col(id_col).alias("id_a"), "table", "bucket")
    b = bk.select(F.col(id_col).alias("id_b"), "table", "bucket")
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", V.cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_dup_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact O(n²) cosine pairs — the correctness baseline / oracle target.

    Fine for dim-sized inputs only; at scale use ``embedding_dup_pairs``.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", V.cosine(F.col("va"), F.col("vb")).alias("cosine")
    ).filter(F.col("cosine") >= threshold)
