"""Shared classification of "this path is absent" analysis failures.

Two call sites try-read a parquet path that legitimately may not exist
yet — the streaming chunk store's first tick
(``streaming.pipeline.chunk_store_writer``) and a pre-params persisted
PQ index (``operators.similarity._pq_index_geometry``). Both must treat
ONLY genuine absence as "not there yet" and re-raise everything else: a
corrupt footer or auth failure mistaken for absence would silently skip
an anti-join (re-appending the whole corpus) or downgrade a
self-describing index to caller-trusted geometry. Centralized here so
the condition tuple cannot drift between the sites.
"""

from __future__ import annotations

# The two error classes that MEAN absent: no such path, or the path
# exists but holds zero data files (schema inference has nothing to read).
_ABSENT_CONDITIONS = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")

# getCondition() can return None (non-classed analysis errors, older
# Spark); fall back to the stable message fragments those two conditions
# have carried across Spark versions.
_ABSENT_MESSAGES = (
    "PATH_NOT_FOUND",
    "UNABLE_TO_INFER_SCHEMA",
    "Path does not exist",
    "Unable to infer schema",
)


def is_absent(exc: Exception) -> bool:
    """True iff ``exc`` is an AnalysisException meaning the read path is
    absent (missing, or present but empty/schema-less). Classed errors
    are matched on ``getCondition()``; when that returns None the check
    falls back to message fragments rather than re-raising on a
    genuinely absent path."""
    get = getattr(exc, "getCondition", None)
    cond = get() if get is not None else None
    if cond is not None:
        return cond in _ABSENT_CONDITIONS
    msg = str(exc)
    return any(m in msg for m in _ABSENT_MESSAGES)
