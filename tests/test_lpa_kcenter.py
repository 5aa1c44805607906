"""Planted-graph / planted-geometry semantics for the round-5b iterative
operators: label propagation communities and greedy k-center selection.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.graphops import graph_label_propagation
from mongo_to_clickhouse_spark.queries.vectorops import (
    KCENTER_K,
    sample_coreset_kcenter,
)

_M = 1_000_000  # micro scale


def test_lpa_clique_converges_to_one_community(spark, tmp_path):
    # 4-clique via repeated co-purchases + a 3-node path (10-11-12).
    pairs = []
    oid = 0
    clique = [1, 2, 3, 4]
    for _rep in range(5):
        for i in range(len(clique)):
            for j in range(i + 1, len(clique)):
                pairs.append((oid, clique[i]))
                pairs.append((oid, clique[j]))
                oid += 1
    for _rep in range(5):
        for a, b in [(10, 11), (11, 12)]:
            pairs.append((oid, a))
            pairs.append((oid, b))
            oid += 1
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([o for o, _ in pairs], pa.int64()),
            "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(lineitem, os.path.join(sf, "lineitem.parquet"))
    rows = graph_label_propagation(spark, sf).collect()
    by_id = {r["community_id"]: r for r in rows}
    # the clique collapses onto label 1 (min-label mode tie-break)
    assert by_id[1]["n_members"] == 4
    assert by_id[1]["min_member"] == 1 and by_id[1]["max_member"] == 4
    # communities partition the 7-node graph
    assert sum(r["n_members"] for r in rows) == 7


def _write_embeddings(tmp_path, xs):
    dim = 64
    vecs = [[float(x)] + [0.0] * (dim - 1) for x in xs]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(xs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(xs), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "embeddings.parquet"))
    return str(tmp_path)


def test_kcenter_farthest_point_traversal(spark, tmp_path):
    # points on a line; hand-traced Gonzalez traversal with min-id ties
    xs = [0, 100, 1, 2, 50, 99, 3, 4]
    sf = _write_embeddings(tmp_path, xs)
    rows = sample_coreset_kcenter(spark, sf).collect()
    assert [r["round"] for r in rows] == list(range(KCENTER_K))
    assert [r["center_vec_id"] for r in rows] == [0, 1, 4, 7, 3, 2]
    assert [r["radius_after_d2"] for r in rows] == [
        (100 * _M) ** 2,
        (50 * _M) ** 2,
        (4 * _M) ** 2,
        (2 * _M) ** 2,
        (1 * _M) ** 2,
        (1 * _M) ** 2,
    ]


def test_kcenter_radius_monotone_on_fixture(spark, sf_dir):
    rows = sample_coreset_kcenter(spark, sf_dir).collect()
    radii = [r["radius_after_d2"] for r in rows]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    centers = [r["center_vec_id"] for r in rows]
    assert len(set(centers)) == len(centers)
