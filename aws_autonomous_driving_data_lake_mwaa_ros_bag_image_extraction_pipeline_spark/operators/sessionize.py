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
