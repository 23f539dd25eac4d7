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
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: each key's events in time order become a
    character string (first letter of the type by default), and keys whose
    sequence matches ``pattern`` (a regex over those characters) are
    returned with the sequence — funnels, retries-then-success,
    abandonment, any order-sensitive behavior in one regex.

    One shuffle (groupBy key); the sort happens INSIDE each key's
    collected array (``array_sort`` on (ts, tie, char) structs —
    deterministic under same-timestamp events), so no windowed global
    sort. Sequence length = events per key: bound it upstream (e.g.
    sessionize first and key by session) when keys can have unbounded
    history — the same contract every CEP engine carries.
    """
    ch = type_char if type_char is not None else F.substring(F.col(type_col), 1, 1)
    seq = F.concat_ws(
        "",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col), F.col(tie_col), ch.alias("c"))
                )
            ),
            lambda x: x["c"],
        ),
    )
    return (
        events.groupBy(key_col)
        .agg(seq.alias("seq"))
        .filter(F.col("seq").rlike(pattern))
    )
