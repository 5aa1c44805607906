"""Planted-semantics tests for the ClickHouse-signature operators
(sequenceMatch, retention, CollapsingMergeTree FINAL, URL functions).

The oracle-parity gate proves Spark == DuckDB; these tests prove both
equal the INTENDED semantics on hand-computed inputs.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.cdcops import cdc_apply_oplog
from mongo_to_clickhouse_spark.queries.clickhouseops import (
    cdc_collapsing_merge,
    events_retention_conditions,
    events_sequence_match,
    scalar_url_parse,
)

_T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


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


def test_sequence_match_planted(spark, tmp_path):
    # user 1: signup -> view -> purchase (with click noise) => match, 1 vp
    # user 2: purchase -> view -> signup (reverse) => no match, 0 vp
    # user 3: v p v p => no signup => no match, 2 vp pairs
    rows = [
        (1, _T0, 1, "signup"),
        (2, _T0 + dt.timedelta(minutes=1), 1, "click"),
        (3, _T0 + dt.timedelta(minutes=2), 1, "view"),
        (4, _T0 + dt.timedelta(minutes=3), 1, "purchase"),
        (5, _T0, 2, "purchase"),
        (6, _T0 + dt.timedelta(minutes=1), 2, "view"),
        (7, _T0 + dt.timedelta(minutes=2), 2, "signup"),
        (8, _T0, 3, "view"),
        (9, _T0 + dt.timedelta(minutes=1), 3, "purchase"),
        (10, _T0 + dt.timedelta(minutes=2), 3, "view"),
        (11, _T0 + dt.timedelta(minutes=3), 3, "purchase"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        r["user_id"]: r.asDict()
        for r in events_sequence_match(spark, sf).collect()
    }
    assert got[1]["seq_str"] == "scvp"
    assert (got[1]["match_svp"], got[1]["count_vp"]) == (1, 1)
    assert got[2]["seq_str"] == "pvs"
    assert (got[2]["match_svp"], got[2]["count_vp"]) == (0, 0)
    assert got[3]["seq_str"] == "vpvp"
    assert (got[3]["match_svp"], got[3]["count_vp"]) == (0, 2)


def test_sequence_order_is_ts_then_event_id(spark, tmp_path):
    # same-second events must order by event_id: s(1) v(2) p(3) at one ts
    rows = [
        (3, _T0, 1, "purchase"),
        (1, _T0, 1, "signup"),
        (2, _T0, 1, "view"),
    ]
    sf = _write_events(tmp_path, rows)
    (row,) = events_sequence_match(spark, sf).collect()
    assert row["seq_str"] == "svp"
    assert row["match_svp"] == 1


def test_retention_planted(spark, tmp_path):
    # anchor = day 0. cohort (week 0): users 1,2,3.
    # week 1: users 1,2 (both cohort) + user 4 (NOT cohort -> active only)
    # week 2: user 1 only.  week 3: nobody.
    d = lambda days: _T0 + dt.timedelta(days=days)
    rows = [
        (1, d(0), 1, "view"),
        (2, d(1), 2, "view"),
        (3, d(2), 3, "view"),
        (4, d(7), 1, "view"),
        (5, d(8), 2, "view"),
        (6, d(9), 4, "view"),
        (7, d(14), 1, "view"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["week"]: r.asDict() for r in events_retention_conditions(spark, sf).collect()}
    assert (got[0]["active_users"], got[0]["retained_users"]) == (3, 3)
    assert (got[1]["active_users"], got[1]["retained_users"]) == (3, 2)
    assert (got[2]["active_users"], got[2]["retained_users"]) == (1, 1)
    # a week with no activity still reports (zero counts), like summing
    # ClickHouse retention() arrays over the cohort
    assert (got[3]["active_users"], got[3]["retained_users"]) == (0, 0)
    assert got[0]["retention_ppm"] == 1_000_000
    assert got[1]["retention_ppm"] == 666_666  # 2 * 1e6 DIV 3, truncating
    assert got[2]["retention_ppm"] == 333_333


def test_collapsing_final_equals_direct_reconstruction(spark, sf_dir):
    """CollapsingMergeTree FINAL over the sign stream must telescope to
    exactly cdc_apply_oplog's direct final state: net +1 per live doc,
    same payload, nothing else surviving."""
    final = cdc_collapsing_merge(spark, sf_dir).collect()
    assert final, "collapse produced no rows"
    assert all(r["net_sign"] == 1 for r in final)
    # one surviving row per doc
    docs = [r["doc_id"] for r in final]
    assert len(docs) == len(set(docs))
    direct = {
        r["doc_id"]: (
            -1 if r["field_a"] is None else round(r["field_a"] * 100),
            r["field_b"] if r["field_b"] is not None else "__none__",
        )
        for r in cdc_apply_oplog(spark, sf_dir).collect()
    }
    got = {r["doc_id"]: (r["a_cents"], r["field_b"]) for r in final}
    assert got == direct


def test_url_parse_component_conventions(spark, sf_dir):
    rows = {
        r["doc_id"]: r.asDict()
        for r in scalar_url_parse(spark, sf_dir).collect()
    }
    # doc 6: even (no www, trailing /), %3==0 (query), not %7 (no frag)
    r6 = rows[6]
    assert r6["protocol"] == "https"
    assert not r6["host"].startswith("www.")
    assert r6["path"] == "/articles/6/"
    assert r6["query_string"] == "utm_source=feed&ref=x"
    assert r6["utm_source"] == "feed"
    assert r6["fragment"] == ""
    assert r6["tld"] == "com"
    # doc 7: odd (WWW., mixed case), %7==0 (fragment), no query
    r7 = rows[7]
    assert r7["protocol"] == "HTTPS"
    assert r7["host"].startswith("WWW.")
    assert not r7["domain_norm"].startswith("www.")
    assert r7["domain_norm"] == r7["domain_norm"].lower()
    assert r7["query_string"] == ""
    assert r7["utm_source"] == ""
    assert r7["fragment"] == "section2"
