"""Planted gap-fill semantics + JL distortion health property."""

from __future__ import annotations

import datetime as dt
import os
import statistics

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.analytics_ext import (
    events_timeseries_gap_fill,
)
from mongo_to_clickhouse_spark.queries.vectorops import emb_jl_projection


def test_gap_fill_plants_missing_days(spark, tmp_path):
    # 'view': days 1, 4 (gap of 2 days); 'click': day 2 only (no gaps)
    rows = [
        (1, dt.datetime(2024, 6, 1, 10), "view", 1.25),
        (2, dt.datetime(2024, 6, 4, 10), "view", 2.50),
        (3, dt.datetime(2024, 6, 2, 10), "click", 9.00),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    got = {
        (r["event_type"], r["day"]): r.asDict()
        for r in events_timeseries_gap_fill(spark, str(tmp_path)).collect()
    }
    assert len(got) == 5  # view: 4 days dense; click: 1 day
    v2 = got[("view", "2024-06-02")]
    assert v2["is_filled"] and v2["n_events"] == 0 and v2["sum_cents"] == 0
    assert v2["locf_cents"] == 125  # carried forward from day 1
    v4 = got[("view", "2024-06-04")]
    assert not v4["is_filled"] and v4["sum_cents"] == 250
    assert got[("click", "2024-06-02")]["sum_cents"] == 900


def test_jl_distortion_centers_near_unity(spark, sf_dir):
    rows = emb_jl_projection(spark, sf_dir).collect()
    ratios = [r["ratio_ppm"] for r in rows if r["ratio_ppm"] is not None]
    assert len(ratios) >= 10
    med = statistics.median(ratios)
    # E[proj_d2] = k * orig_d2; the median ratio must sit near 1e6
    assert 500_000 <= med <= 2_000_000
