"""Property-based invariants for the round-8 operators, checked through
the DuckDB oracle side (Spark ≡ oracle is separately pinned by the
driver compare at every sf; these pin the ALGORITHMS' invariants on
arbitrary generated inputs, fast and in-process)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
from hypothesis import given, settings, strategies as st

from mongo_to_clickhouse_spark.queries.analytics import (
    FUNNEL_TIME_TO_CONVERT_SQL,
    TTC_PCTS,
)
from mongo_to_clickhouse_spark.queries.bizops import (
    EVENTS_TOPK_SLIDING_SQL,
    TOPK_SLIDE_K,
    _TOPK_SLIDE_HOURS,
)
from mongo_to_clickhouse_spark.queries.sketchops import (
    AGG_SLIDING_WINDOW_QUANTILE_SQL,
    _HDR_QS,
    _SLIDE_HOURS,
)

_T0 = dt.datetime(2024, 3, 1)


def _events_con(rows):
    """rows: (event_id, hour, user_id, event_type, value)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
                " user_id BIGINT, event_type VARCHAR, value DOUBLE)")
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?, ?)",
        [(eid, _T0 + dt.timedelta(hours=h), u, et, v)
         for eid, h, u, et, v in rows],
    )
    return con


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20),                 # hour offset
                  st.integers(1, 9999)),              # value cents
        min_size=1, max_size=80,
    )
)
def test_sliding_quantile_hdr_bound_and_window_count(spec):
    rows = [(i, h, 1, "view", c / 100.0) for i, (h, c) in enumerate(spec)]
    con = _events_con(rows)
    out = con.execute(AGG_SLIDING_WINDOW_QUANTILE_SQL).fetchall()
    # brute force per observed hour: values in (hour-5, hour]
    by_hour = {}
    for _, h, _, _, v in rows:
        by_hour.setdefault(h, []).append(round(v * 100))
    observed = sorted(by_hour)
    base = min(observed)
    got_hours = sorted({r[0] for r in out})
    assert [h - got_hours[0] for h in got_hours] == [h - base
                                                     for h in observed]
    for hour_idx, q_ppm, _idx, est_lower, n_window in out:
        h = hour_idx - got_hours[0] + base
        window = sorted(
            v for hh, vs in by_hour.items()
            if h - _SLIDE_HOURS < hh <= h for v in vs
        )
        assert n_window == len(window)
        # type-1 lower-rank quantile the cumulative walk selects
        rank = None
        for i in range(1, len(window) + 1):
            if i * 1_000_000 >= q_ppm * len(window):
                rank = i
                break
        true_val = window[rank - 1]
        # the estimate is the BUCKET lower bound of the selected value:
        # lower <= true <= lower * (1 + 2^-4)  (idx < 16 is exact)
        assert est_lower <= true_val
        assert true_val <= math.ceil(est_lower * (1 + 2 ** -4))
    assert {r[1] for r in out} == set(_HDR_QS)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15),                 # hour offset
                  st.integers(1, 6)),                 # user id
        min_size=1, max_size=80,
    )
)
def test_topk_sliding_matches_bruteforce(spec):
    rows = [(i, h, u, "view", 1.0) for i, (h, u) in enumerate(spec)]
    con = _events_con(rows)
    out = con.execute(EVENTS_TOPK_SLIDING_SQL).fetchall()
    by_hu = {}
    hours = set()
    for _, h, u, _, _ in rows:
        hours.add(h)
        by_hu[(h, u)] = by_hu.get((h, u), 0) + 1
    base_abs = min(r[0] for r in out)
    base = min(hours)
    for h in sorted(hours):
        counts = {}
        for (hh, u), c in by_hu.items():
            if h - _TOPK_SLIDE_HOURS < hh <= h:
                counts[u] = counts.get(u, 0) + c
        expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expect = expect[:TOPK_SLIDE_K]
        got = sorted([r for r in out if r[0] == base_abs + (h - base)],
                     key=lambda r: r[1])
        assert [(u, c) for _, _, u, c in got] == expect
        assert [rk for _, rk, _, _ in got] == list(
            range(1, len(expect) + 1))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=40),  # delays (h)
    st.integers(0, 5),                                       # non-converters
)
def test_time_to_convert_is_exact_type1_percentile(delays, extra):
    rows = []
    eid = 0
    for u, d in enumerate(delays, start=1):
        rows.append((eid, 0, u, "signup", 0.0)); eid += 1
        rows.append((eid, d, u, "purchase", 1.0)); eid += 1
    for u in range(1000, 1000 + extra):   # signups that never convert
        rows.append((eid, 0, u, "signup", 0.0)); eid += 1
    con = _events_con(rows)
    out = {p: (v, n) for p, v, n in
           con.execute(FUNNEL_TIME_TO_CONVERT_SQL).fetchall()}
    srt = sorted(delays)
    n = len(srt)
    for p in TTC_PCTS:
        rank = math.ceil(p * n / 100)
        assert out[p][0] == srt[rank - 1] * 3_600_000_000
        assert out[p][1] == n  # non-converters never enter the frame
