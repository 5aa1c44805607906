"""Shared streaming test/demo utilities: staging the events fixture as a
file-stream source, and drain-with-timeout handling."""

from __future__ import annotations

import os
import tempfile
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql.streaming import StreamingQuery

from mongo_to_clickhouse_spark.io import table_path

DRAIN_TIMEOUT_SEC = 300


def normalize_events_ts(table: pa.Table) -> pa.Table:
    """Normalize ``events.ts`` to ``timestamp[us]`` (no timezone) whatever
    the fixture's physical type is THIS regeneration — int64 epoch-nanos,
    parquet ``timestamp[ns]``, or ``timestamp[us]``. This is the single
    schema-adaptation seam for the whole streaming tier (the batch twin is
    ``io.load_table``): every ``readStream`` consumer declares
    ``ts TIMESTAMP_NTZ`` and never sees the raw encoding.

    Mirrors the reference's change-stream consumer, which probes field
    types at runtime instead of trusting a compiled-in schema
    (/root/reference/src/main.rs:362-397). Truncation (ns→µs) matches how
    DuckDB reads the same file, keeping oracle parity."""
    idx = table.schema.get_field_index("ts")
    if idx < 0:
        return table
    t = table.schema.field(idx).type
    us = pa.timestamp("us")
    if t == us:
        return table
    col = table.column(idx)
    if pa.types.is_integer(t):  # epoch-nanos surfaced as int64
        col = pc.divide(col, 1000).cast(us)
    else:  # timestamp[ns] or other unit; cast truncates toward zero
        col = col.cast(pa.timestamp("ns")).cast(us, safe=False)
    return table.set_column(idx, "ts", col)


def await_drained(q: StreamingQuery, timeout_sec: int = DRAIN_TIMEOUT_SEC) -> None:
    """awaitTermination that FAILS LOUDLY on timeout instead of letting the
    caller read a half-written sink (partial results are far more confusing
    than a clear timeout)."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not drain within "
            f"{timeout_sec}s"
        )


def stage_events_source(
    sf_dir: str, parts: int = 1, prefix: str = "stream"
) -> tuple[str, str]:
    """Copy the events fixture into a fresh temp source dir, optionally
    split into ``parts`` row-slice files (for multi-micro-batch and
    incremental-arrival scenarios). Returns (source_dir, work_dir)."""
    work = tempfile.mkdtemp(prefix=f"{prefix}-{uuid.uuid4().hex[:8]}-")
    src = os.path.join(work, "source")
    os.makedirs(src)
    table = normalize_events_ts(pq.read_table(table_path(sf_dir, "events")))
    n = table.num_rows
    for i in range(parts):
        lo, hi = i * n // parts, (i + 1) * n // parts
        pq.write_table(table.slice(lo, hi - lo), os.path.join(src, f"p{i}.parquet"))
    return src, work
