"""Shared streaming test/demo utilities: staging the events fixture as a
file-stream source, and drain-with-timeout handling."""

from __future__ import annotations

import os
import tempfile
import uuid

import pyarrow.parquet as pq
from pyspark.sql.streaming import StreamingQuery

from mongo_to_clickhouse_spark.io import table_path

DRAIN_TIMEOUT_SEC = 300


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
    table = pq.read_table(table_path(sf_dir, "events"))
    n = table.num_rows
    for i in range(parts):
        lo, hi = i * n // parts, (i + 1) * n // parts
        pq.write_table(table.slice(lo, hi - lo), os.path.join(src, f"p{i}.parquet"))
    return src, work
