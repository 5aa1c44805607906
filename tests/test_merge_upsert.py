"""Planted MERGE semantics: each WHEN clause exercised by one key."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.joinops import sink_merge_upsert


def test_merge_clauses(spark, tmp_path):
    # key 2: target-only -> keep; key 6: matched, no flag -> update;
    # key 18: matched + delete flag (18%9==0) -> deleted;
    # key 3: source-only, no flag -> insert;
    # key 9: source-only + delete flag -> no-op (absent);
    orders = pa.table(
        {
            "o_orderkey": pa.array([2, 6, 18, 3, 9], pa.int64()),
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
        }
    )
    sf = str(tmp_path)
    pq.write_table(orders, os.path.join(sf, "orders.parquet"))
    got = {r["o_orderkey"]: r for r in sink_merge_upsert(spark, sf).collect()}
    assert set(got) == {2, 6, 3}
    assert got[2]["action"] == "keep" and got[2]["price_cents"] == 1000
    assert got[6]["action"] == "update" and got[6]["price_cents"] == 2000 + 5000
    assert got[3]["action"] == "insert" and got[3]["price_cents"] == 4000 + 5000
