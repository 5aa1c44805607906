"""Semantic pins for the fixed-round iterative operators on planted
inputs (oracle parity checks the fixtures; these check the algorithms do
what they claim on hand-constructed cases)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.graphops import _SUPP_BASE, graph_pagerank
from mongo_to_clickhouse_spark.queries.vectorops import emb_kmeans_lloyd


def test_kmeans_separates_two_tight_groups(spark, tmp_path):
    # 40 vectors in two far-apart tight groups (A around +1, B around -1,
    # per-vector deterministic jitter ~1e-3). Initial centroids vec_id<8
    # alternate groups, so clusters never mix groups and per-cluster WSS
    # stays tiny relative to the inter-group distance.
    dim = 64
    vecs = []
    for i in range(40):
        base = 1.0 if i % 2 == 0 else -1.0
        vecs.append([base + (i % 7) * 1e-3] * dim)
    table = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 2 for i in range(40)], pa.int32()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(table, os.path.join(sf, "embeddings.parquet"))
    rows = emb_kmeans_lloyd(spark, sf).collect()
    assert sum(r["n_points"] for r in rows) == 40
    # inter-group squared distance is 64 * (2e6)^2 = 2.56e14 micro²; a
    # mixed cluster would carry at least one point at ~that distance.
    # tight-group WSS is bounded by jitter: 64 dims * (6e3)^2 * points.
    for r in rows:
        assert r["wss"] < r["n_points"] * dim * (7_000**2), r


def test_kmeans_empty_cluster_drops_out(spark, tmp_path):
    # ADVICE r11 (round 12): a cluster that receives no points must drop
    # out of the competition exactly as the oracle's cent{r} CTE drops
    # it — the old kernel kept a dense K×D matrix, so an emptied cluster
    # persisted as a phantom zero-vector centroid and could capture
    # points near the origin in later rounds. This planted 2-D config
    # (found by brute-force search over the exact integer semantics)
    # empties cluster 4 after round 1; with the phantom it would come
    # back and steal 2 points by round 3.
    import duckdb

    from mongo_to_clickhouse_spark.queries.vectorops import (
        EMB_KMEANS_LLOYD_SQL,
    )

    pts = {
        0: (35, -15), 1: (-20, -15), 2: (-15, 5), 3: (15, -25),
        4: (15, -15), 5: (-30, 5), 6: (20, -15), 7: (-15, -25),
        8: (10, 5), 9: (15, 40), 10: (-10, 0), 11: (20, 25),
    }
    dim = 64
    vecs = [
        [pts[v][0] * 1e-6, pts[v][1] * 1e-6] + [0.0] * (dim - 2)
        for v in sorted(pts)
    ]
    table = pa.table(
        {
            "vec_id": pa.array(sorted(pts), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(pts), pa.int32()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(table, os.path.join(sf, "embeddings.parquet"))
    rows = emb_kmeans_lloyd(spark, sf).collect()
    got = {r["cluster"]: r["n_points"] for r in rows}
    # oracle semantics: cluster 4 emptied in round 2 and stays gone
    assert got == {0: 1, 1: 1, 2: 2, 3: 3, 5: 1, 6: 3, 7: 1}, got
    # and the full result (counts + wss) hash-matches the DuckDB oracle
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf, 'embeddings.parquet')}')"
    )
    duck = con.sql(EMB_KMEANS_LLOYD_SQL).fetchall()
    assert [tuple(r) for r in rows] == duck


def test_kmeans_missing_seed_never_fabricates_a_centroid(spark, tmp_path):
    # fewer than K vectors → the oracle's cent0 has only the seeds that
    # exist; a dense matrix would add phantom zero-vector centroids that
    # capture points near the origin. vec_id 5 sits next to the origin
    # and must be claimed by a REAL cluster.
    import duckdb

    from mongo_to_clickhouse_spark.queries.vectorops import (
        EMB_KMEANS_LLOYD_SQL,
    )

    dim = 64
    vals = [5.0, 6.0, 7.0, 8.0, 9.0, 1e-6]  # vec 5 ≈ origin
    vecs = [[v] * dim for v in vals]
    table = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * 6, pa.int32()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(table, os.path.join(sf, "embeddings.parquet"))
    rows = emb_kmeans_lloyd(spark, sf).collect()
    assert {r["cluster"] for r in rows} <= set(range(6))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf, 'embeddings.parquet')}')"
    )
    duck = con.sql(EMB_KMEANS_LLOYD_SQL).fetchall()
    assert [tuple(r) for r in rows] == duck


def test_pagerank_ranks_the_hub_supplier_highest(spark, tmp_path):
    # star graph: customers 1..6 all buy from supplier 1; customer 1 also
    # buys from suppliers 2..3. Supplier 1 is the hub and must outrank
    # every other supplier; customer 1 outranks customers 2..6.
    pairs = [(c, 1) for c in range(1, 7)] + [(1, 2), (1, 3)]
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(len(pairs)), pa.int64()),
            "o_custkey": pa.array([c for c, _ in pairs], pa.int64()),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(range(len(pairs)), pa.int64()),
            "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(orders, os.path.join(sf, "orders.parquet"))
    pq.write_table(lineitem, os.path.join(sf, "lineitem.parquet"))
    ranks = {
        r["node_id"]: r["rank_micro"] for r in graph_pagerank(spark, sf).collect()
    }
    hub = ranks[_SUPP_BASE + 1]
    assert all(
        hub > v for k, v in ranks.items() if k != _SUPP_BASE + 1
    ), ranks
    assert ranks[1] > ranks[2]  # customer 1 (degree 3) above customer 2


def test_pca_matfree_agrees_with_moment_form(spark, sf_dir):
    # Two independent exact-integer formulations of the same power
    # iteration (elementwise-truncated moment matrix vs per-round
    # truncated matrix-free matvec) must converge to the same dominant
    # direction on the fixture embeddings — cosine ≈ 1 up to the
    # truncation noise each form's own oracle mirrors exactly.
    import math

    from mongo_to_clickhouse_spark.queries.vectorops import (
        emb_pca_power_iteration,
        emb_pca_power_matfree,
    )

    a = {r["i"]: r["dir_micro"] for r in emb_pca_power_iteration(spark, sf_dir).collect()}
    b = {r["i"]: r["dir_micro"] for r in emb_pca_power_matfree(spark, sf_dir).collect()}
    assert set(a) == set(b) and len(a) == 64
    dot = sum(a[i] * b[i] for i in a)
    cos = dot / math.sqrt(sum(x * x for x in a.values()) * sum(x * x for x in b.values()))
    assert abs(cos) > 0.999, cos
    # rayleigh quotients are on different scales by construction, but
    # both must be positive for a dominant variance direction
    ray_a = emb_pca_power_iteration(spark, sf_dir).collect()[0]["rayleigh"]
    ray_b = emb_pca_power_matfree(spark, sf_dir).collect()[0]["rayleigh"]
    assert ray_a > 0 and ray_b > 0
