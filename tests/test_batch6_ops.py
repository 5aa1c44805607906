"""Planted semantics: BFS depth layers and exact weighted percentiles."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.graphops import graph_bfs_depth
from mongo_to_clickhouse_spark.queries.statsops import agg_weighted_percentile


def test_bfs_depth_layers_on_path_graph(spark, tmp_path):
    # path 1-2-3-4-5-6-7 plus isolated pair 20-21: BFS from node 1 with
    # 4 rounds reaches depth 4 (node 5); 6,7 stay unreached (-1), and
    # the 20-21 component is unreachable entirely.
    pairs = []
    oid = 0
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (20, 21)]
    for _rep in range(5):  # repeat so mutual-kNN keeps every edge
        for a, b in edges:
            pairs.append((oid, a))
            pairs.append((oid, b))
            oid += 1
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([o for o, _ in pairs], pa.int64()),
            "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        }
    )
    pq.write_table(lineitem, os.path.join(str(tmp_path), "lineitem.parquet"))
    got = {r["depth"]: r.asDict() for r in graph_bfs_depth(spark, str(tmp_path)).collect()}
    assert got[0]["n_nodes"] == 1 and got[0]["min_node"] == 1
    for d in (1, 2, 3, 4):
        assert got[d]["n_nodes"] == 1
        assert got[d]["min_node"] == d + 1
    assert got[-1]["n_nodes"] == 4  # nodes 6, 7, 20, 21
    assert got[-1]["min_node"] == 6 and got[-1]["max_node"] == 21


def test_weighted_percentile_hand_computed(spark, tmp_path):
    # one event type; values 1..4 with weights (4,1,1,4) via user_id%5+1.
    # W=10: p50 -> smallest v with cw*100 >= 50*W=500: cw(1)=400,
    # cw(2)=500 -> p50=2; p95 -> cw >= 950: cw(3)=600, cw(4)=1000 -> 4.
    rows = [  # (event_id, user_id -> weight=user_id%5+1, value)
        (1, 3, 1.0),   # w=4
        (2, 0, 2.0),   # w=1
        (3, 0, 3.0),   # w=1
        (4, 3, 4.0),   # w=4
    ]
    t0 = dt.datetime(2024, 6, 1)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    (row,) = agg_weighted_percentile(spark, str(tmp_path)).collect()
    assert row["total_weight"] == 10
    assert row["p50_w"] == 2.0
    assert row["p95_w"] == 4.0
    assert row["p100"] == 4.0
