"""Text-analysis column helpers (north-star extensions over ``documents``).

All JVM-side built-ins — tokenization, quality features, fingerprints compile
to whole-stage-codegen expressions; no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal deterministic stopword list used by quality scoring / language-ID.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization. DuckDB: ``string_split_regex(text, '\\s+')``."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def avg_token_len(text: Column) -> Column:
    """Mean token length = (len without whitespace) / token count."""
    stripped = F.length(F.regexp_replace(text, r"\s+", ""))
    return stripped / token_count(text)


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    # token-less text has ratio 0 (an unguarded 0/0 aborts the job under
    # ANSI mode); NULL text stays NULL
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric / whitespace.
    Empty text → 0.0 (an unguarded 0/0 aborts the job under ANSI mode);
    NULL text stays NULL."""
    total = F.length(text)
    clean = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(clean / total)


def normalized(text: Column) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprinting."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (exact-dup key)."""
    return F.md5(normalized(text))


def sorted_token_fingerprint(text: Column) -> Column:
    """Bag-of-words fingerprint: md5 over the sorted distinct token set.

    Catches shuffled/reordered near-duplicates that byte-level hashing misses.
    DuckDB: ``md5(array_to_string(list_sort(list_distinct(...)), ' '))``.
    """
    toks = F.array_sort(F.array_distinct(tokens(F.lower(text))))
    return F.md5(F.array_join(toks, " "))


def bind(col: Column, fn) -> Column:
    """Let-binding for Column expressions: evaluate ``col`` ONCE per row and
    pass the bound value to ``fn``.

    PySpark has no ``let``: a Column reused k times in an expression tree is
    *inlined* and re-evaluated k times — catastrophic when it's a split or a
    transform (e.g. n-grams referencing ``split(text)`` per index re-split
    the text O(tokens) times). Wrapping in a 1-element array and going
    through ``transform`` turns the value into a bound lambda variable.
    """
    return F.element_at(F.transform(F.array(col), fn), 1)


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams as strings (shingles) — input to MinHash / Jaccard.

    Documents with fewer than ``n`` tokens yield an empty array (a bare
    ``sequence(0, k-1)`` with k<1 would generate a *descending* sequence and
    make the downstream ``slice`` throw). The token array is let-bound so the
    underlying split runs once per row, not once per output n-gram.
    """

    def _ngrams(toks: Column) -> Column:
        k = F.size(toks) - F.lit(n - 1)
        idx = F.when(k >= 1, F.sequence(F.lit(0), k - 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))

    return bind(tokens(F.lower(text)), _ngrams)


def char_ngrams(text: Column, n: int) -> Column:
    """Character n-grams of the lowercased text (sliding window of length
    ``n``). Texts shorter than ``n`` yield an empty array. Let-bound so the
    lowercasing runs once per row; ``substring`` accepts Column positions
    (Spark ≥3.4) so the whole expression stays in codegen.
    DuckDB twin: ``[substring(tx, i, n) for i in range(1, length(tx)-n+2)]``.
    """

    def _grams(t: Column) -> Column:
        k = F.length(t) - F.lit(n - 1)
        idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(idx, lambda i: F.substring(t, i, F.lit(n)))

    return bind(F.lower(text), _grams)
