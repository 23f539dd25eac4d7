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

Classed errors (``getCondition()`` non-None) are matched on the
condition alone. For unclassed errors the fallback is deliberately
narrow: the bracketed error-class token Spark embeds in the message
(``[PATH_NOT_FOUND]``/``[UNABLE_TO_INFER_SCHEMA]``), else the two
legacy message forms anchored at the START of the message — a substring
match would let any error that merely MENTIONS a missing path (e.g. a
stage failure quoting one) silently classify as absence. The
prefix-anchored path additionally logs a warning, so a misclassified
exotic message leaves a trace instead of a silent corpus re-append.
"""

from __future__ import annotations

import logging

_log = logging.getLogger(__name__)

# The two error classes that MEAN absent: no such path, or the path
# exists but holds zero data files (schema inference has nothing to read).
_ABSENT_CONDITIONS = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")

# Spark embeds the error class bracketed in the message even when
# getCondition() is unavailable (plain Exception wrappers, Py4J strings).
_ABSENT_CLASS_TOKENS = ("[PATH_NOT_FOUND]", "[UNABLE_TO_INFER_SCHEMA]")

# Last resort for genuinely unclassed legacy messages; anchored at the
# start of the message, never matched as substrings.
_ABSENT_MESSAGE_PREFIXES = ("Path does not exist", "Unable to infer schema")


def is_absent(exc: Exception) -> bool:
    """True iff ``exc`` is an AnalysisException meaning the read path is
    absent (missing, or present but empty/schema-less). Classed errors
    are matched on ``getCondition()``; when that returns None the check
    falls back to the bracketed error-class token in the message, then
    to the legacy message forms anchored at the message start (logged,
    since an unclassed arbitrary message is the one place a
    misclassification could hide)."""
    get = getattr(exc, "getCondition", None)
    cond = get() if get is not None else None
    if cond is not None:
        return cond in _ABSENT_CONDITIONS
    msg = str(exc)
    if any(tok in msg for tok in _ABSENT_CLASS_TOKENS):
        return True
    if msg.startswith(_ABSENT_MESSAGE_PREFIXES):
        _log.warning(
            "is_absent: unclassed %s treated as path-absence on message "
            "prefix alone: %.200s",
            type(exc).__name__,
            msg,
        )
        return True
    return False
