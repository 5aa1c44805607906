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
