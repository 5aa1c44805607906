"""Microsecond-precision boundary semantics of join_asof_tolerance.

Round-4 ADVICE repro: the freshness bound used to be computed with
second-truncating unix_timestamp, so a view lying up to ~1 s PAST the
tolerance boundary was still attributed by Spark while the DuckDB
oracle (`r.t >= e.ts - INTERVAL n DAY`, µs precision) returned NULL.
These planted events pin the µs-exact contract on both sides of the
boundary.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.joinops import (
    ASOF_TOLERANCE_DAYS,
    join_asof_tolerance,
)

_PURCHASE = dt.datetime(2024, 6, 10, 12, 0, 0, 500000)
_TOL = dt.timedelta(days=ASOF_TOLERANCE_DAYS)


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_view_just_past_tolerance_is_null(spark, tmp_path):
    # user 1: view 50 ms OLDER than the bound -> NULL (second-truncated
    # arithmetic wrongly kept it); user 2: view exactly AT the bound ->
    # attributed (inclusive); user 3: view 1 µs inside -> attributed.
    sf = _write_events(
        tmp_path,
        [
            (101, _PURCHASE - _TOL - dt.timedelta(milliseconds=50), 1, "view"),
            (102, _PURCHASE, 1, "purchase"),
            (201, _PURCHASE - _TOL, 2, "view"),
            (202, _PURCHASE, 2, "purchase"),
            (301, _PURCHASE - _TOL + dt.timedelta(microseconds=1), 3, "view"),
            (302, _PURCHASE, 3, "purchase"),
        ],
    )
    got = {
        r["user_id"]: r["attributed_view_event"]
        for r in join_asof_tolerance(spark, sf).collect()
    }
    assert got == {1: None, 2: 201, 3: 301}


def test_asof_nearest_tie_goes_backward(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.joinops import (
        join_asof_forward,
        join_asof_nearest,
    )

    T = dt.datetime(2024, 6, 10, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    sf = _write_events(
        tmp_path,
        [
            # user 1: views equidistant (±10 s) -> tie -> backward (11)
            (11, T - 10 * s, 1, "view"),
            (12, T + 10 * s, 1, "view"),
            (10, T, 1, "purchase"),
            # user 2: forward view (+5 s) nearer than backward (-20 s)
            (21, T - 20 * s, 2, "view"),
            (22, T + 5 * s, 2, "view"),
            (20, T, 2, "purchase"),
            # user 3: only a forward view
            (31, T + 60 * s, 3, "view"),
            (30, T, 3, "purchase"),
            # user 4: no views at all
            (40, T, 4, "purchase"),
        ],
    )
    near = {
        r["user_id"]: (r["nearest_view_event"], r["direction"])
        for r in join_asof_nearest(spark, sf).collect()
    }
    assert near == {
        1: (11, "backward"),
        2: (22, "forward"),
        3: (31, "forward"),
        4: (None, None),
    }
    fwd = {
        r["user_id"]: r["next_view_event"]
        for r in join_asof_forward(spark, sf).collect()
    }
    assert fwd == {1: 12, 2: 22, 3: 31, 4: None}
