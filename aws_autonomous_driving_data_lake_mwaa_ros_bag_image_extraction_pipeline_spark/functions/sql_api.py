"""SQL-surface registration: the engine's scalar helpers as SQL functions.

A reference user who lives in SQL (Athena-style ad-hoc queries over the
frame/run tables) gets the same vocabulary the DataFrame API uses —
``register_sql_functions(spark)`` creates session-scoped SQL UDFs (Spark 4
``CREATE TEMPORARY FUNCTION … RETURN expr``), so they compile to the SAME
Catalyst expressions as the Python helpers in functions/text.py — pure
codegen, no Python boundary, usable from ``spark.sql`` strings and view
definitions.

Each body is kept textually parallel to its DataFrame twin (cited inline);
tests assert the SQL form and the Python form return identical results.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, RETURN expression, DataFrame twin)
_FUNCS: dict[str, tuple[str, str, str]] = {
    # text.tokens
    "aads_tokens": (
        "(s STRING)",
        r"split(trim(s), '\\s+')",
        "functions/text.py::tokens",
    ),
    # text.token_count
    "aads_token_count": (
        "(s STRING)",
        r"size(split(trim(s), '\\s+'))",
        "functions/text.py::token_count",
    ),
    # text.normalized (whitespace-collapse + lower, the exact-dedup key)
    "aads_normalized": (
        "(s STRING)",
        r"regexp_replace(lower(trim(s)), '\\s+', ' ')",
        "functions/text.py::normalized",
    ),
    # text.fingerprint (md5 of the normalized form)
    "aads_fingerprint": (
        "(s STRING)",
        r"md5(regexp_replace(lower(trim(s)), '\\s+', ' '))",
        "functions/text.py::fingerprint",
    ),
    # text.stopword_ratio (same stopword list)
    "aads_stopword_ratio": (
        "(s STRING)",
        r"size(filter(split(trim(lower(s)), '\\s+'), "
        r"t -> array_contains(array('the','a','of','and','to','in','is','it'), t)))"
        r" / CAST(size(split(trim(lower(s)), '\\s+')) AS DOUBLE)",
        "functions/text.py::stopword_ratio",
    ),
    # hashing.md5_long — the deterministic 60-bit hash used across
    # sampling/sharding (same substring/bit-range as functions/hashing.py;
    # the name says 63 for the int64 carrier, the value occupies 60 bits)
    "aads_hash63": (
        "(s STRING)",
        "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)",
        "functions/hashing.py::md5_long",
    ),
    # curation-style deterministic [0,1) sampler from the 63-bit hash
    "aads_hash_unit": (
        "(s STRING)",
        "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
        " / CAST(1152921504606846976 AS DOUBLE)",
        "functions/hashing.py (rate-sampling form, curation.hash_rate_sample)",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Create the session-scoped SQL functions; returns the names.

    Idempotent (CREATE OR REPLACE); temporary → no catalog writes, safe in
    shared metastores.
    """
    names = []
    for name, (sig, body, _twin) in _FUNCS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}"
        )
        names.append(name)
    return names
