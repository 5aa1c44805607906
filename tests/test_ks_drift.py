"""Planted-distribution semantics for the two-sample KS drift test."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.statsops import sample_ks_drift

_T0 = dt.datetime(2024, 6, 1)


def _write_events(tmp_path, values):
    """values: list indexed by event_id; split A = even ids, B = odd."""
    n = len(values)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([_T0] * n, pa.timestamp("us")),
            "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_shifted_distribution_detected(spark, tmp_path):
    # A (even ids): values around 1.0; B (odd ids): shifted to ~100.0
    values = [1.0 + (i % 10) * 0.01 if i % 2 == 0 else 100.0 + (i % 10) * 0.01
              for i in range(400)]
    sf = _write_events(tmp_path, values)
    (row,) = sample_ks_drift(spark, sf).collect()
    assert row["n_a"] == 200 and row["n_b"] == 200
    assert row["ks_ppm"] == 1_000_000  # disjoint supports -> D = 1
    assert row["drift_detected"]


def test_identical_distribution_not_detected(spark, tmp_path):
    # same deterministic value pattern in both halves
    values = [float((i // 2) % 50) for i in range(800)]
    sf = _write_events(tmp_path, values)
    (row,) = sample_ks_drift(spark, sf).collect()
    assert row["ks_ppm"] == 0
    assert not row["drift_detected"]
