"""Planted-fixture semantics for the round-7 wave-3 batch: ORC source
round-trip, topKWeighted ranking, LPA modularity, the daily correlation
matrix, and curriculum stage assignment."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.io import clear_scan_cache
from mongo_to_clickhouse_spark.queries.bizops import agg_daily_corr_matrix
from mongo_to_clickhouse_spark.queries.clickhouseops import agg_topk_weighted
from mongo_to_clickhouse_spark.queries.core import source_orc_scan
from mongo_to_clickhouse_spark.queries.graphops import graph_modularity
from mongo_to_clickhouse_spark.queries.pipelineops import (
    pipeline_curriculum_order,
)

_T0 = dt.datetime(2024, 3, 1)


def _events(rows, path):
    """rows: (event_id, ts, user_id, event_type, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(path, "events.parquet"))


def _docs(texts, path):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s0"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(path, "documents.parquet"))


def test_orc_roundtrip_preserves_tricky_strings(spark, tmp_path):
    # embedded newline, quotes, commas, unicode — the characters that
    # break row formats must survive the ORC round-trip byte-for-byte
    # (signature equality against the parquet-side original)
    texts = [
        'line one\nline two',
        'quote " and , comma',
        'unicode éß中文',
        'plain',
    ]
    _docs(texts, str(tmp_path))
    clear_scan_cache()
    got = source_orc_scan(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.source, r.n_docs) == ("s0", 4)
    assert r.sum_chars == sum(len(t) for t in texts)
    # cross-check the signature against a direct parquet-side compute
    direct = spark.read.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    ).selectExpr(
        "SUM(CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)"
        " % 1000000000000) AS sig"
    ).collect()[0].sig
    assert r.text_sig == direct


def test_topk_weighted_rank_and_tiebreak(spark, tmp_path):
    # user 2 outweighs user 1 in clicks; users 3 and 4 TIE at 300 cents
    # -> rank order 2,(3,4 by user_id),1
    rows = [
        (0, _T0, 1, "click", 1.00),
        (1, _T0, 2, "click", 9.00),
        (2, _T0, 3, "click", 2.00),
        (3, _T0, 3, "click", 1.00),
        (4, _T0, 4, "click", 3.00),
    ]
    _events(rows, str(tmp_path))
    got = [
        (r.rk, r.user_id, r.weight_cents)
        for r in agg_topk_weighted(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 2, 900), (2, 3, 300), (3, 4, 300), (4, 1, 100)]


def test_modularity_two_triangles(spark, tmp_path):
    # two disconnected supplier triangles {1,2,3} and {4,5,6}: LPA
    # converges each to its min label; with m2 = 12 adjacency rows,
    # Q = 2 * (6*12 - 6^2)/12^2 = 0.5 exactly
    pairs = []
    oid = 0
    for clique in ([1, 2, 3], [4, 5, 6]):
        for s in clique:
            pairs.append((oid, s))
        oid += 1
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([o for o, _ in pairs], pa.int64()),
            "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        }
    )
    pq.write_table(lineitem, os.path.join(str(tmp_path), "lineitem.parquet"))
    got = [
        (r.community_id, r.n_members, r.internal_rows, r.deg_sum, r.q_micro)
        for r in graph_modularity(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 3, 6, 6, 500000), (4, 3, 6, 6, 500000)]


def test_corr_matrix_perfect_and_anti(spark, tmp_path):
    # click and purchase rise together (corr 1); error moves opposite
    # (corr -1 vs both) over 3 days; dollars 1..3 per series
    rows = []
    eid = 0
    for d, (c, p, e) in enumerate([(1, 2, 3), (2, 4, 2), (3, 6, 1)]):
        for ty, v in (("click", c), ("purchase", p), ("error", e)):
            rows.append((eid, _T0 + dt.timedelta(days=d), 1, ty, float(v)))
            eid += 1
    _events(rows, str(tmp_path))
    got = {
        (r.type_a, r.type_b): r.corr_micro
        for r in agg_daily_corr_matrix(spark, str(tmp_path)).collect()
    }
    assert got[("click", "purchase")] == 1_000_000
    assert got[("click", "error")] == -1_000_000
    assert got[("error", "purchase")] == -1_000_000


def test_curriculum_stages_easy_to_hard(spark, tmp_path):
    # 8 docs whose mean token length strictly increases: stages are the
    # rank quartiles, 2 docs each, difficulty ranges non-overlapping
    texts = [" ".join(["a" * (k + 1)] * 3) for k in range(8)]
    _docs(texts, str(tmp_path))
    clear_scan_cache()
    got = [
        (r.stage, r.n_docs, r.sum_tokens,
         r.min_difficulty_milli, r.max_difficulty_milli)
        for r in pipeline_curriculum_order(spark, str(tmp_path)).collect()
    ]
    assert [g[0] for g in got] == [1, 2, 3, 4]
    assert all(g[1] == 2 and g[2] == 6 for g in got)
    assert got == sorted(got)
    # doc k has mean token length exactly (k+1) -> milli = (k+1)*1000
    assert got[0][3] == 1000 and got[3][4] == 8000
