"""Sessionization (drive segmentation) + time-window aggregation.

Batch form: the classic gap-and-island — a session break is a gap >
``gap`` from the previous event; session id = running count of breaks.
One window pass, partitioned by the entity key. (Streaming form:
``F.session_window`` in streaming/pipeline.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    # NULL-timestamp events are excluded: they have no position on the
    # time axis, and under NULLS-FIRST ordering each would register as
    # its own session break — phantom singleton sessions with NULL
    # start/end, shifting every real session_id after them
    events = events.filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    prev = F.lag(ts_col).over(w)
    is_break = (
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_s)
    ).cast("int")
    return events.withColumn(
        "session_id",
        F.sum(is_break).over(
            Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    s = sessionize(events, key_col, ts_col, gap_minutes)
    return s.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    duration: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts — the batch twin of the streaming windowed agg."""
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"), group_col)
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), group_col, "n_events")
    )


def session_window_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "6 hours",
) -> DataFrame:
    """Per-key session aggregates via Spark's NATIVE ``session_window`` —
    the built-in twin of the lag/cumsum ``sessionize`` above, and the only
    form that also runs unchanged under Structured Streaming (where the
    gap-and-island window trick is impossible because lag over an unbounded
    stream never closes).

    Semantics (verified against the islands formulation): an event extends
    the current session iff ``ts <= prev_ts + gap`` — a break requires a
    STRICTLY greater gap, exactly the ``> gap`` break rule in
    ``sessionize``. ``window.start`` is the session's min ts.

    One shuffle on (key, merged-window); Spark merges overlapping session
    candidates inside the aggregation, so state per key is the open
    sessions only — the same bounded state the streaming engine keeps.
    """
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            "last_ts",
            "n_events",
        )
    )


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of event types: for each
    observed (from_type → to_type) consecutive pair (per key, time order),
    the count and the row-normalized transition probability.

    The lead window rides the per-key partitioning (one shuffle); the
    count aggregation map-side combines down to ≤|types|² rows, and the
    row normalization is a window over that dimension-sized table — the
    probability pass never touches the event-sized data again. At 100 TB
    the output is still |types|² rows.

    Events with a NULL type (or NULL timestamp) are excluded BEFORE
    pairing: keeping them would drop transitions INTO the NULL event
    (indistinguishable from end-of-sequence) while still emitting a
    NULL from_type row — an asymmetry that deflates the real rows'
    normalization totals. With the filter, [A, NULL, B] reads as the
    A→B transition of the observable sequence.
    """
    events = events.filter(
        F.col(type_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_total = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.withColumn(
        "p", F.round(F.col("n") / row_total, 6)
    )


def event_pattern_match(
    events: DataFrame,
    pattern: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
    type_char=None,
    max_events: int = 10_000,
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: each key's events in time order become a
    character string (first letter of the type by default), and keys whose
    sequence matches ``pattern`` (a regex over those characters) are
    returned with the sequence — funnels, retries-then-success,
    abandonment, any order-sensitive behavior in one regex.

    One shuffle (groupBy key); the sort happens INSIDE each key's
    collected array (``array_sort`` on (ts, tie, char) structs —
    deterministic under same-timestamp events), so no windowed global
    sort.

    Hot-key guard: the sequence is capped at the EARLIEST ``max_events``
    events per key (``slice`` after the in-key sort, before the concat),
    so a skewed key cannot materialize an unbounded string in one task —
    the regex then evaluates over that bounded prefix, the same
    bounded-buffer contract every CEP engine carries. A key at the cap
    still holds ``max_events`` (ts, tie, char) structs in its agg buffer
    (~tens of MB at the default, well inside an executor task); for keys
    with genuinely unbounded history, sessionize first and key by
    (user, session) so the cap is never the semantics. Pass
    ``max_events=None`` to disable the cap when keys are known-bounded.
    """
    ch = type_char if type_char is not None else F.substring(F.col(type_col), 1, 1)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(tie_col), ch.alias("c")))
    )
    if max_events is not None:
        ordered = F.slice(ordered, 1, int(max_events))
    seq = F.concat_ws("", F.transform(ordered, lambda x: x["c"]))
    return (
        events.groupBy(key_col)
        .agg(seq.alias("seq"))
        .filter(F.col("seq").rlike(pattern))
    )
