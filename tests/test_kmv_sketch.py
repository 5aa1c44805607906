"""Planted-input semantics for the KMV/theta sketch: distinct groups with
known overlap — exact columns must be exactly right, estimates must land
within the KMV error envelope (~1/sqrt(K-1) ≈ 18% at K=32; bound 40%)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.sketchops import agg_kmv_theta_sketch


def test_kmv_set_estimates_on_planted_overlap(spark, tmp_path):
    # signup: users 0..99; purchase: users 50..149; click: users 200..259
    # union = 210 distinct, signup ∩ purchase = 50
    rows = (
        [("signup", u) for u in range(100)]
        + [("purchase", u) for u in range(50, 150)]
        + [("click", u) for u in range(200, 260)]
    ) * 3  # repetition: distinctness must come from the sketch, not luck
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([u for _, u in rows], pa.int64()),
            "event_type": pa.array([t for t, _ in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    sf = str(tmp_path)
    pq.write_table(table, os.path.join(sf, "events.parquet"))
    got = {r["scope"]: r for r in agg_kmv_theta_sketch(spark, sf).collect()}
    assert got["signup"]["exact_distinct"] == 100
    assert got["purchase"]["exact_distinct"] == 100
    assert got["click"]["exact_distinct"] == 60
    assert got["__UNION__"]["exact_distinct"] == 210
    assert got["__INTER__"]["exact_distinct"] == 50
    for scope in ("signup", "purchase", "click", "__UNION__", "__INTER__"):
        exact = got[scope]["exact_distinct"]
        est = got[scope]["est_distinct"]
        assert abs(est - exact) <= max(4, 0.4 * exact), (scope, exact, est)
