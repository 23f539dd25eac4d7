"""Vector (embedding-column) helpers over ``array<float>`` columns.

Built-in higher-order functions (``zip_with`` + ``aggregate``) keep the dot
product JVM-side; no Arrow round-trip for the brute-force path. For very wide
vectors or very large candidate sets, the pandas-UDF batch path in
``operators/similarity.py`` takes over.

Each helper accepts either a Column or a PLAIN COLUMN NAME (str). The str
form builds the whole expression as one SQL-text ``F.expr`` — a single
parser round trip, memoized per name — where the Column form pays ~10 py4j
round trips per higher-order function (measured: the six HOFs behind one
``l2sq`` cost ~50 ms of driver latency per plan build; ANN queries build
dozens). The parsed trees are semantically identical: same fold order, same
casts, double literals spelled ``0.0D`` so SQL's decimal-literal default
can't change the arithmetic. Strings must be plain identifiers (no
expressions) — callers with derived vectors pass Columns as before.
"""

from __future__ import annotations

import functools
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Only a plain identifier may take the SQL-text path — anything else (dots,
# spaces, backticks) would change meaning when spliced into the expr string,
# so it falls through to the Column path (pyspark resolves a bare str there
# with F.col semantics, exactly what these callers always did).
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _ident(s: object) -> bool:
    return isinstance(s, str) and _IDENT.match(s) is not None

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0.0D, (acc, v) -> acc + v)"
)
_SQ = (
    "aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "0.0D, (acc, v) -> acc + v)"
)


@functools.lru_cache(maxsize=256)
def _dot_expr(a: str, b: str) -> Column:
    return F.expr(_DOT.format(a=a, b=b))


@functools.lru_cache(maxsize=256)
def _norm_expr(a: str) -> Column:
    return F.expr(f"nullif(sqrt({_SQ.format(a=a)}), 0.0D)")


@functools.lru_cache(maxsize=256)
def _l2sq_expr(a: str, b: str) -> Column:
    # Same shape as the Column form below: (dot(a,a) + dot(b,b)) - 2.0*dot(a,b)
    return F.expr(
        f"({_SQ.format(a=a)} + {_SQ.format(a=b)}) - "
        f"(2.0D * {_DOT.format(a=a, b=b)})"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    if _ident(a) and _ident(b):
        return _dot_expr(a, b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    """L2 norm, with NULL (not 0) for an all-zero or empty vector: every
    caller uses the norm as a cosine DENOMINATOR, and under ANSI mode
    (the Spark 4 default) a 0 there aborts the whole job with
    DIVIDE_BY_ZERO. With NULL the division degrades to a NULL score, so
    a degenerate vector (a common fill for a missing embedding) simply
    never matches anything instead of killing the search/dedup job."""
    if _ident(a):
        return _norm_expr(a)
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


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (NULL when either vector has zero norm — see
    ``norm``). DuckDB oracle: ``list_cosine_similarity``."""
    return dot(a, b) / (norm(a) * norm(b))


def l2sq(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance via the polarization identity
    ``|a|² + |b|² − 2·a·b`` — three dot products, the SAME arithmetic a
    DuckDB oracle can replay with ``list_inner_product`` (an elementwise
    (a−b)² fold has no DuckDB twin with matching float semantics).

    NB the str fast path folds ``dot(a,a)`` via ``transform`` (one-array
    square fold) — the identical multiply/add sequence ``zip_with(a,a)``
    performs, same left-to-right order, so values are bit-equal."""
    if _ident(a) and _ident(b):
        return _l2sq_expr(a, b)
    return dot(a, a) + dot(b, b) - 2.0 * dot(a, b)
