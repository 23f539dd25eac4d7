"""Bounded-lifetime caching for multi-consumer intermediates.

Several detectors persist an intermediate that feeds 2-4 consumers inside
one returned plan (minhash candidate pairs, banded Hamming signatures,
TF-IDF weights, winnow fingerprints). The returned DataFrame is LAZY, so
the operator cannot unpersist before returning — the caller would silently
recompute the expensive pass. Spark's cache manager dedups IDENTICAL
canonicalized plans, but a long-lived session calling these operators over
DIFFERENT inputs accumulates one MEMORY_AND_DISK entry per distinct input
with no eviction until session end.

``finish`` gives those callers a bounded variant: ``eager=True``
materializes the result with ``localCheckpoint(eager=True)`` (the
lineage-truncation idiom already used by the connected-components and HNSW
loops), then unpersists every intermediate — the dedup_index
materialize-unpersist-return pattern. The checkpointed blocks are freed by
the ContextCleaner when the returned frame is garbage-collected, unlike
cache-manager entries, which live until an explicit unpersist. The default
stays lazy: one-shot jobs (bench sweeps, oracle gates) want the plan, not
an extra materialization.

Durability caveat: ``localCheckpoint`` blocks are executor-local and
UNREPLICATED, and the eager path truncates lineage before unpersisting the
intermediates — so after an executor loss the returned frame is
unrecoverable (no lineage to recompute from). On preemptible/churning
clusters, collect or write the eager result promptly, or use reliable
``checkpoint()`` to a fault-tolerant store instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def share(df: DataFrame) -> DataFrame:
    """Per-call shared intermediate for multi-consumer plans — the
    checkpoint idiom every detector uses instead of ``persist()`` (see
    module docstring for why the CacheManager is the wrong tool).

    Durability follows the session's checkpoint configuration: when
    ``spark.sparkContext.setCheckpointDir`` has been called, the
    intermediate goes through a RELIABLE ``checkpoint(eager=False)`` —
    written to the fault-tolerant checkpoint store, so an executor loss on
    a preemptible/churning cluster re-reads it instead of killing the job.
    Without a checkpoint dir (the local/bench default) it stays
    ``localCheckpoint(eager=False)``: executor-local blocks, freed by the
    ContextCleaner on GC, no extra I/O. Both are LAZY — the first
    consumer's job materializes the blocks, so sharing costs no standalone
    job either way."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


def finish(result: DataFrame, *intermediates: DataFrame, eager: bool = False) -> DataFrame:
    """Return ``result`` as-is (lazy, default), or — ``eager=True`` —
    materialized via ``localCheckpoint(eager=True)`` with every
    ``intermediates`` frame unpersisted before returning, so nothing this
    operator persisted outlives the call. The eager result's blocks are
    executor-local and unreplicated with lineage truncated: an executor
    loss makes it unrecoverable, so on churning clusters consume it
    promptly (see module docstring)."""
    if not eager:
        return result
    out = result.localCheckpoint(eager=True)
    for df in intermediates:
        df.unpersist()
    return out
