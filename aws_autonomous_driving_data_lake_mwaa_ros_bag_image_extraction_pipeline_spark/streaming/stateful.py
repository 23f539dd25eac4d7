"""Custom stateful streaming operators (``applyInPandasWithState``).

Two canonical shapes a training-data / telemetry pipeline needs beyond
built-in windowed aggs:

- ``streaming_dedup``: keyed exactly-once-per-id emission — an id seen in
  any earlier micro-batch (state survives batches AND restarts via the
  checkpoint) is dropped. The streaming twin of dedup.exact_dedup.
- ``running_counters``: per-key monotonically-updated counters emitted
  every batch — the streaming form of the frame_stats counter upsert (K6),
  with state instead of a re-aggregated table.

State is per-key and partitioned by the grouping key, so a 1000-executor
cluster shards state horizontally; timeouts bound state size in production
(set ``GroupStateTimeout`` when keys churn).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Emit each (key, id) exactly once across all micro-batches.

    State = the sorted list of ids already emitted for the key. At scale,
    swap the exact id list for a bloom/sketch state when cardinality
    explodes; the operator contract stays identical.
    """
    dt = dict(events.dtypes)  # schemas follow the input's actual id types
    out_schema = f"{key_col} {dt[key_col]}, {id_col} {dt[id_col]}"
    state_schema = f"ids array<{dt[id_col]}>"

    def _dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        fresh: list = []
        for pdf in pdfs:
            for i in pdf[id_col].tolist():
                # NULL/NaN ids have no identity to dedup on: NaN never
                # equals itself (re-emitted every batch) and None breaks
                # the sorted() state encoding — exclude them
                if i is None or i != i:
                    continue
                if i not in seen:
                    seen.add(i)
                    fresh.append(i)
        state.update((sorted(seen),))
        if fresh:
            yield pd.DataFrame({key_col: [key[0]] * len(fresh), id_col: fresh})

    return events.groupBy(key_col).applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_bloom(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    m_bytes: int = 1024,
    k_hashes: int = 4,
) -> DataFrame:
    """``streaming_dedup`` with BOUNDED state: a per-key Bloom filter.

    The exact variant's state grows with distinct ids; here state is a fixed
    ``m_bytes`` bit array + k md5-derived probe positions per id — the
    standard trade: zero false negatives (a seen id is always dropped), a
    tunable false-positive rate ≈ (1 - e^(-k·n/m))^k of fresh ids wrongly
    dropped. Size for the expected per-key cardinality; 1 KiB / 4 hashes
    holds ~1400 ids at <1% FP.
    """
    import hashlib

    dt = dict(events.dtypes)
    out_schema = f"{key_col} {dt[key_col]}, {id_col} {dt[id_col]}"
    state_schema = "bits binary"
    m_bits = m_bytes * 8

    def _probes(i) -> list[int]:
        h = hashlib.md5(str(i).encode()).digest()
        return [
            int.from_bytes(h[j * 4 : (j + 1) * 4], "big") % m_bits
            for j in range(k_hashes)
        ]

    def _dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        bits = bytearray(state.get[0]) if state.exists else bytearray(m_bytes)
        fresh: list = []
        for pdf in pdfs:
            for i in pdf[id_col].tolist():
                if i is None or i != i:  # NULL/NaN id: same as exact dedup
                    continue
                pos = _probes(i)
                if all(bits[p >> 3] & (1 << (p & 7)) for p in pos):
                    continue  # (probably) seen
                for p in pos:
                    bits[p >> 3] |= 1 << (p & 7)
                fresh.append(i)
        state.update((bytes(bits),))
        if fresh:
            yield pd.DataFrame({key_col: [key[0]] * len(fresh), id_col: fresh})

    return events.groupBy(key_col).applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counters(
    events: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key lifetime event count, emitted once per batch the key appears
    in — K6's counter upsert as managed state."""
    out_schema = f"{key_col} {dict(events.dtypes)[key_col]}, n_events long"
    state_schema = "n long"

    def _count(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n]})

    return events.groupBy(key_col).applyInPandasWithState(
        _count,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_transition_counts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of ``sessionize.transition_matrix``'s pair stage:
    per-key (from_type → to_type) consecutive-pair counts that keep
    accumulating ACROSS micro-batches — state is each key's last event
    (ts, tie, type), so the first event of a new batch pairs with the last
    event of the previous one, exactly as the batch lead-window would.

    Emits the pairs observed in each batch (append mode); a downstream
    `groupBy(from_type, to_type).count()` — or the persisted-rollup fold
    in pipeline.py — turns them into the running matrix. State per key is
    ONE row forever; within a batch rows are sorted by (ts, tie) inside
    the group, the same determinism contract as the quota operator.

    Out-of-order arrivals ACROSS batches are guarded, not assumed away: a
    row at or before the stored (last_us, last_tie) is a late event the
    already-emitted chain cannot be rewritten around (its pairs shipped in
    a prior trigger), so it is dropped from pairing and never overwrites
    the frontier — the same drop-late contract a watermark gives windowed
    aggregation. Within a batch, full (ts, tie) ordering still applies.
    """
    dt = dict(events.dtypes)
    out_schema = (
        f"{key_col} {dt[key_col]}, from_type {dt[type_col]}, "
        f"to_type {dt[type_col]}"
    )
    state_schema = "last_us long, last_tie long, last_type string"

    def _pairs(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        # NULL ts/tie/type rows are excluded (batch transition_matrix
        # convention): a NaT frontier would store int64-min and disable
        # late-event dropping, and a NaN tie crashes the int64 cast
        rows = rows.dropna(subset=[ts_col, tie_col, type_col])
        rows = rows.sort_values([ts_col, tie_col], kind="mergesort")
        prev_type = None
        if state.exists:
            last_us, last_tie, prev_type = state.get
            us = rows[ts_col].values.astype("int64") // 1000
            tie = rows[tie_col].values.astype("int64")
            fresh = (us > last_us) | ((us == last_us) & (tie > last_tie))
            rows = rows[fresh]
        froms, tos = [], []
        for t in rows[type_col].tolist():
            if prev_type is not None:
                froms.append(prev_type)
                tos.append(t)
            prev_type = t
        if len(rows):  # late-only batch: frontier unchanged, nothing emitted
            last = rows.iloc[-1]
            state.update(
                (
                    int(last[ts_col].value // 1000),
                    int(last[tie_col]),
                    str(last[type_col]),
                )
            )
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(froms),
                "from_type": froms,
                "to_type": tos,
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        _pairs,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_group_quota(
    events: DataFrame,
    quota: int,
    key_col: str = "user_id",
    id_col: str = "event_id",
    impl: str = "classic",
) -> DataFrame:
    """Admit at most ``quota`` events per key across ALL micro-batches —
    the streaming contribution cap (bound any one domain/source's share of
    an ingested training corpus).

    Within a batch rows are admitted in ``id_col`` order so the admitted
    set is deterministic under any input partitioning. State is one int64
    per key, sharded by the grouping key across executors.

    ``impl="tws"`` runs on the Spark 4 ``transformWithStateInPandas``
    StatefulProcessor API (typed state variables, TTL, timers — the
    successor to applyInPandasWithState; its state-server protocol needs
    the ``protobuf`` package, absent in this sandbox, so the default is
    the ``applyInPandasWithState`` form with identical semantics).
    """
    dt = dict(events.dtypes)
    out_schema = f"{key_col} {dt[key_col]}, {id_col} {dt[id_col]}"

    if impl == "tws":
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class _Quota(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._admitted = handle.getValueState("admitted", "n bigint")

            def handleInputRows(self, key, rows, timer_values):
                got = self._admitted.get()
                n = int(got[0]) if got is not None else 0
                batch = pd.concat(list(rows), ignore_index=True)
                take = batch.sort_values(id_col).head(max(0, quota - n))
                self._admitted.update((n + len(take),))
                if len(take):
                    yield take[[key_col, id_col]]

            def close(self) -> None:
                pass

        return events.groupBy(key_col).transformWithStateInPandas(
            _Quota(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="none",
        )

    def _quota(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        take = batch.sort_values(id_col).head(max(0, quota - n))
        state.update((n + len(take),))
        if len(take):
            yield take[[key_col, id_col]]

    return events.groupBy(key_col).applyInPandasWithState(
        _quota,
        outputStructType=out_schema,
        stateStructType="n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 60,
    tie_col: str | None = None,
) -> DataFrame:
    """Streaming twin of ``operators.resample.resample_ffill``: per key,
    emit ``step_seconds``-aligned grid points carrying the last observation
    forward, incrementally as the stream advances.

    A grid point ``g`` is emitted exactly once, as soon as an event with
    ``ts > g`` proves no earlier-or-equal observation can still change it
    (events are processed in (ts, tie) order inside each batch; an event
    arriving in a later batch with ``ts`` behind the emitted frontier is
    late by definition and ignored — the same contract a watermark gives
    the built-in windowed aggregates). State per key is two scalars
    (next grid tick, running value) — O(keys), never O(events).

    The emitted value column keeps the input's numeric family, matching
    the batch ``resample_ffill``: integral inputs stay ``bigint``, float
    inputs stay ``double``; any other value dtype (decimal, string) is
    coerced to double — that narrower contract is the price of the typed
    state row.
    """
    dt = dict(events.dtypes)
    integral = dt[value_col] in ("tinyint", "smallint", "int", "bigint")
    value_type = "bigint" if integral else "double"
    out_schema = (
        f"{key_col} {dt[key_col]}, grid_ts timestamp, {value_col} {value_type}"
    )
    # last_s is the event-time frontier: grid points up to it already
    # emitted with the fill value in force at that time, so an event from
    # a LATER batch at-or-before the frontier is a late arrival the
    # emitted chain cannot be rewritten around — drop it instead of
    # letting it overwrite last_val (the same drop-late contract as
    # streaming_transition_counts and a watermarked window)
    state_schema = f"next_grid long, last_val {value_type}, last_s long"
    step = int(step_seconds)

    def _fill(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts)
        pdf = pdf.dropna(subset=[ts_col])  # NULL ts: no time-axis position
        if not len(pdf):
            return
        order = [ts_col, tie_col] if tie_col else [ts_col]
        pdf = pdf.sort_values(order, kind="mergesort")
        secs = pdf[ts_col].astype("int64") // 1_000_000_000
        vals = pdf[value_col]
        if state.exists:
            next_grid, last_val, last_e = state.get
        else:
            next_grid, last_val, last_e = (
                int(secs.iloc[0]) // step * step,
                None,
                None,
            )
        out_g: list[int] = []
        out_v: list = []
        for e, v in zip(secs.tolist(), vals.tolist()):
            if last_e is not None and e < last_e:
                continue  # late (cross- or intra-batch): already emitted past it
            while next_grid < e:
                out_g.append(next_grid)
                out_v.append(last_val)
                next_grid += step
            if v is not None and v == v:  # NULL value: observation marks
                last_val = v  # time but carries no fill (batch ignorenulls)
            last_e = e
        while last_e is not None and next_grid <= last_e:
            out_g.append(next_grid)
            out_v.append(last_val)
            next_grid += step
        state.update(
            (
                int(next_grid),
                last_val,
                int(last_e) if last_e is not None else None,
            )
        )
        if out_g:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(out_g),
                    "grid_ts": pd.to_datetime(pd.Series(out_g) * 1_000_000_000),
                    value_col: out_v,
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        _fill,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
