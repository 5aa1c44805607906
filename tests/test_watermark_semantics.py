"""Watermark late-data semantics: events arriving in a later micro-batch
with timestamps older than (max event time seen − watermark) must be
DROPPED from append-mode windowed aggregation."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.streaming.pipeline import EVENTS_SCHEMA
from mongo_to_clickhouse_spark.streaming.util import await_drained


def _events_file(path: str, rows: list[tuple[int, str]]) -> None:
    """rows = [(event_id, iso_ts)] written with the fixture's column set."""
    import datetime as dt

    ids = [r[0] for r in rows]
    ts = [
        int(dt.datetime.fromisoformat(r[1]).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        for r in rows
    ]
    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["x"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(table, path)


def test_late_rows_dropped_beyond_watermark(spark, tmp_path):
    """Spark applies the watermark with a one-batch lag (the watermark used
    by batch N is derived from data through batch N-1), so the too-late row
    is staged two batches after the event that advanced the clock."""
    import time

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    # batch 0: events up to 12:00 → watermark (for batch 1+) = 11:50
    _events_file(
        os.path.join(src, "a.parquet"),
        [(1, "2024-01-01T10:05"), (2, "2024-01-01T10:20"), (3, "2024-01-01T12:00")],
    )
    time.sleep(1.05)  # file-source ordering is by modification time
    # batch 1: benign row — watermark 11:50 now definitely in force
    _events_file(os.path.join(src, "b.parquet"), [(4, "2024-01-01T12:05")])
    time.sleep(1.05)
    # batch 2: too-late row — its [10:00, 11:00) window end is below the
    # 11:50 watermark → must be dropped
    _events_file(os.path.join(src, "c.parquet"), [(5, "2024-01-01T10:30")])

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("ws"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_sem")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q)
    out = {r["ws"]: r["n"] for r in spark.table("wm_sem").collect()}

    # the late 10:30 row must NOT appear in the finalized 10:00 window
    assert out.get("2024-01-01 10:00") == 2, out
    # open windows (12:00) are never emitted in append mode
    assert "2024-01-01 12:00" not in out
