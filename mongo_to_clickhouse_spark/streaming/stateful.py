"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-user running aggregates that survive across micro-batches.

This is the Spark-idiomatic replacement for hand-rolled stateful operators
(the reference keeps NO per-key state — its only state is the resume token
— so this is pure extension surface, SURVEY §2.8). State lives in the
executor-side state store (RocksDB-backed when configured), keyed by the
group; each micro-batch hands the operator Arrow batches of new rows plus
the group's prior state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum) — emits the updated totals
    for every user seen in each micro-batch."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Stateful CDC merge: the streaming form of queries/cdcops.cdc_apply_oplog
# ---------------------------------------------------------------------------

CDC_OUTPUT_SCHEMA = (
    "doc_id bigint, field_a double, field_b string, n_ops bigint, deleted boolean"
)
# order-robust per-doc state: the op log may arrive across micro-batches in
# any order; every element carries the seq that set it, so merge is a pure
# max/last-writer-wins lattice and the result is arrival-order invariant
# (it must equal the batch reconstruction no matter how files are split
# into triggers).
CDC_STATE_SCHEMA = (
    "base_seq bigint, base_op string, a_seq bigint, a_val double, "
    "b_seq bigint, b_val string, max_seq bigint, max_op string, n_ops bigint"
)

_BASE_OPS = ("insert", "replace", "delete")

CDC_STATE_ZERO = (0, None, -1, None, -1, None, -1, None, 0)


def fold_cdc_ops(state_tuple: tuple, ops: Iterable[tuple]) -> tuple:
    """Pure state fold: apply ``(seq, op, field_a, field_b)`` rows onto a
    state tuple. Every component is a seq-guarded max / last-writer-wins,
    so the fold is COMMUTATIVE in arrival order across (and within)
    batches — property-tested against random permutations and batch
    splits in tests/test_property.py."""
    base_seq, base_op, a_seq, a_val, b_seq, b_val, max_seq, max_op, n_ops = (
        state_tuple
    )
    for seq, op, field_a, field_b in ops:
        seq = int(seq)
        n_ops += 1
        if seq > max_seq:
            max_seq, max_op = seq, op
        if op in _BASE_OPS and seq > base_seq:
            base_seq, base_op = seq, op
        if field_a is not None and not pd.isna(field_a) and seq > a_seq:
            a_seq, a_val = seq, float(field_a)
        if isinstance(field_b, str) and seq > b_seq:
            b_seq, b_val = seq, field_b
    return (base_seq, base_op, a_seq, a_val, b_seq, b_val, max_seq, max_op, n_ops)


def emit_cdc_image(state_tuple: tuple) -> tuple:
    """(field_a, field_b, n_ops, deleted) view of a CDC state tuple."""
    base_seq, base_op, a_seq, a_val, b_seq, b_val, _max_seq, max_op, n_ops = (
        state_tuple
    )
    deleted = max_op == "delete"
    # a field assignment only survives if it happened at-or-after the last
    # base op (strictly after a delete — tombstones carry no payload)
    a_live = a_seq >= base_seq if base_op != "delete" else a_seq > base_seq
    b_live = b_seq >= base_seq if base_op != "delete" else b_seq > base_seq
    return (
        a_val if (a_live and not deleted) else None,
        b_val if (b_live and not deleted) else None,
        n_ops,
        deleted,
    )


def _merge_cdc_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (doc_id,) = key
    st = state.get if state.exists else CDC_STATE_ZERO
    for pdf in pdfs:
        st = fold_cdc_ops(
            st,
            zip(pdf["seq"], pdf["op"], pdf["field_a"], pdf["field_b"]),
        )
    state.update(st)
    field_a, field_b, n_ops, deleted = emit_cdc_image(st)
    yield pd.DataFrame(
        {
            "doc_id": [doc_id],
            "field_a": [field_a],
            "field_b": [field_b],
            "n_ops": [n_ops],
            "deleted": [deleted],
        }
    )


# ---------------------------------------------------------------------------
# Idle-timeout session eviction: sessions EMIT ONLY WHEN THEY CLOSE
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, first_us bigint, last_us bigint, "
    "closed_by string"
)
SESSION_STATE_SCHEMA = "n bigint, first_us bigint, last_us bigint"
# A session closes when no further event for its key arrives within this
# EVENT-TIME gap. Callers pick a gap; the default (1h) matches the
# sessionize_events batch operator's island gap.
SESSION_IDLE_GAP_MS = 3_600_000


def _session_close_on_idle(gap_ms: int):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "first_us": [first_us],
                    "last_us": [last_us],
                    "closed_by": ["idle_timeout"],
                }
            )
            return
        n, first_us, last_us = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            mn, mx = int(pdf["ts_us"].min()), int(pdf["ts_us"].max())
            first_us = mn if first_us is None else min(first_us, mn)
            last_us = mx if last_us is None else max(last_us, mx)
        state.update((n, first_us, last_us))
        # deadline = last event time + idle gap; fires when the WATERMARK
        # passes it, so eviction is event-time-deterministic (identical
        # results on any cluster, any wall-clock speed)
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        # nothing yielded: a live session is invisible until it closes

    return fn


def idle_session_close(
    events_stream: DataFrame, gap_ms: int = SESSION_IDLE_GAP_MS
) -> DataFrame:
    """Sessionization with STATE-TIMEOUT EVICTION: per-user sessions are
    held in the state store and emitted exactly once, when the user goes
    idle — EventTimeTimeout fires when the stream's watermark passes
    `last event + gap`. This is the reference's flush-on-idle batch
    assembler (it flushes a tenant buffer when no new docs arrive within
    the window) expressed through Spark's state lifecycle: the state
    store, not a hand-rolled timer wheel, owns deadlines, checkpointing,
    and recovery.

    EventTimeTimeout (not ProcessingTimeTimeout) is a hard requirement
    under Trigger.AvailableNow: FlatMapGroupsWithStateExec's
    shouldRunAnotherBatch() returns true UNCONDITIONALLY for
    processing-time timeouts, so an availableNow run never terminates;
    with event-time timeouts it runs exactly one extra eviction batch
    after the watermark stops advancing. Event time is also the correct
    semantics — results don't depend on wall-clock scheduling.

    `events_stream` must carry `user_id`, `ts_us` (epoch micros) and a
    watermark on an event-time column. Scale posture: state is O(open
    sessions); eviction is per-key and incremental (no scan-the-world
    sweeps); RocksDB state backend at production volumes. Sessions still
    open when the stream stops stay in the checkpoint and close on the
    next run — at-least-once hand-off, pinned by tests/test_stateful.py."""
    return (
        events_stream.select("user_id", "ts_us", "ts")
        .withWatermark("ts", "1 second")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_close_on_idle(gap_ms),
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas: the Spark 4 stateful-processor API
# ---------------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"


def _make_totals_processor():
    """Built lazily so the module imports on any Spark version; the
    StatefulProcessor base class exists from Spark 4.0."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-user running (count, sum-in-cents) via a typed ValueState.

        The Spark-4 successor to applyInPandasWithState
        (running_user_totals above is the legacy-API twin): state is a
        NAMED, SCHEMA'D variable owned by the state store — no tuple
        packing — and the same handle scales to ListState/MapState,
        TTL'd state, and registered timers. Totals are integer cents
        (see PARITY_r02.md: no float crosses an aggregation)."""

        def init(self, handle) -> None:
            self._totals = handle.getValueState(
                "totals", "n bigint, cents bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (
                self._totals.get() if self._totals.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf package for its
    state-server protocol; absent (as in this container, where installs
    are off-limits) the legacy-API twin below carries the semantics."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals_tws(events_stream: DataFrame) -> DataFrame:
    """`running_user_totals` re-expressed on transformWithStateInPandas —
    the forward API for custom stateful operators (typed state
    variables, timers, TTL), pinned equivalent to the legacy
    applyInPandasWithState path by tests/test_stateful.py.

    Requires the RocksDB state store provider (set by the caller) and
    protobuf (see tws_available); `running_user_totals_cents` is the
    exact-output legacy twin used as the environment fallback."""
    return (
        events_stream.select(
            "user_id",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_totals_processor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def _update_cents_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_cents": [cents]}
    )


def running_user_totals_cents(events_stream: DataFrame) -> DataFrame:
    """Legacy-API twin of running_user_totals_tws: identical input
    projection, state content, and output schema, on
    applyInPandasWithState — the fallback when protobuf is absent."""
    return (
        events_stream.select(
            "user_id",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_cents_state,
            TWS_OUTPUT_SCHEMA,
            "n bigint, cents bigint",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def cdc_state_merge(oplog_stream: DataFrame) -> DataFrame:
    """Streaming CDC materialization: per-doc document image maintained
    in the state store, updated by each micro-batch's patch rows —
    exactly the job the reference's change-stream consumer does, with
    Spark owning the state lifecycle (checkpointed, RocksDB-backed when
    configured). Emits the refreshed image of every doc touched by the
    batch ('update' mode)."""
    return (
        oplog_stream.select("doc_id", "seq", "op", "field_a", "field_b")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _merge_cdc_state,
            CDC_OUTPUT_SCHEMA,
            CDC_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
