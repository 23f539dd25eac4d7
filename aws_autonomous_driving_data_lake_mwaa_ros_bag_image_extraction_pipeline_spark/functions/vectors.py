"""Vector (embedding-column) helpers over ``array<float>`` columns.

Built-in higher-order functions (``zip_with`` + ``aggregate``) keep the dot
product JVM-side; no Arrow round-trip for the brute-force path. For very wide
vectors or very large candidate sets, the pandas-UDF batch path in
``operators/similarity.py`` takes over.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm, with NULL (not 0) for an all-zero or empty vector: every
    caller uses the norm as a cosine DENOMINATOR, and under ANSI mode
    (the Spark 4 default) a 0 there aborts the whole job with
    DIVIDE_BY_ZERO. With NULL the division degrades to a NULL score, so
    a degenerate vector (a common fill for a missing embedding) simply
    never matches anything instead of killing the search/dedup job."""
    return F.nullif(
        F.sqrt(
            F.aggregate(
                F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
        F.lit(0.0),
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity (NULL when either vector has zero norm — see
    ``norm``). DuckDB oracle: ``list_cosine_similarity``."""
    return dot(a, b) / (norm(a) * norm(b))


def l2sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance via the polarization identity
    ``|a|² + |b|² − 2·a·b`` — three dot products, the SAME arithmetic a
    DuckDB oracle can replay with ``list_inner_product`` (an elementwise
    (a−b)² fold has no DuckDB twin with matching float semantics)."""
    return dot(a, a) + dot(b, b) - 2.0 * dot(a, b)
