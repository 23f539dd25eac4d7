"""Text analysis operators over ``documents`` (north-star).

Language-ID, quality scoring, token counting, fingerprinting — all built-in
expressions (no Python in the hot path); each is a narrow transform except the
corpus-level aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.hashing import quantize

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    # NB: the lambda must take exactly one arg — a `m=markers` default would
    # make PySpark pass the array *index* as m (HOF arity is inspected from
    # the signature, defaults included).
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = T.tokens(F.lower(text))
    return {
        lang: _marker_hits(toks, markers) for lang, markers in LANG_MARKERS.items()
    }


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax over marker-token hit counts, 'und'
    (undetermined) when no marker hits. Ties break by language code order."""
    scores = lang_scores(F.col(text_col))
    best = None
    best_lang = F.lit("und")
    for lang in sorted(scores):  # deterministic tie-break: first max wins
        s = scores[lang]
        if best is None:
            best, best_lang = s, F.when(s > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when(s > best, F.lit(lang)).otherwise(best_lang)
            best = F.greatest(best, s)
    return docs.select(F.col(id_col), best_lang.alias("pred_lang"))


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        T.token_count(t).alias("n_tokens"),
        T.distinct_token_count(t).alias("n_distinct_tokens"),
        quantize(T.avg_token_len(t), 4).alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: rewards length (to a cap), lexical
    diversity and stopword presence; penalizes punctuation density."""
    t = F.col(text_col)
    n_tok = T.token_count(t)
    diversity = T.distinct_token_count(t) / n_tok
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop = T.stopword_ratio(t)
    punct = T.punct_ratio(t)
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * diversity
        + F.lit(0.3) * F.least(stop * 5, F.lit(1.0))
    ) * (F.lit(1.0) - F.least(punct * 2, F.lit(1.0)))
    return docs.select(
        F.col(id_col),
        quantize(diversity, 4).alias("diversity"),
        quantize(stop, 4).alias("stopword_ratio"),
        quantize(punct, 4).alias("punct_ratio"),
        quantize(score, 4).alias("quality"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        T.fingerprint(t).alias("fp_exact"),
        T.sorted_token_fingerprint(t).alias("fp_tokenset"),
    )
