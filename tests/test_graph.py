"""Connected-components correctness: hand-built graphs + the planted
near-dup corpus end-to-end (minhash pairs → clusters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def test_cc_hand_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20}-singleton excluded (no edge)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["a_id", "b_id"]
    )
    got = {
        r["node_id"]: r["component_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_long_chain_converges(spark):
    # path graph 0-1-2-...-9: worst-case diameter for label propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["a_id", "b_id"]
    )
    got = connected_components(edges)
    assert got.select("component_id").distinct().count() == 1
    assert got.agg(F.min("component_id")).first()[0] == 0


def test_dedup_clusters_from_minhash_pairs(spark, sf_dir):
    from mongo_to_clickhouse_spark.queries.dedupops import dedup_minhash_lsh_pairs

    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    clusters = dedup_clusters(pairs)
    rows = clusters.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["keeper_doc_id"] == min(r["members"])
        assert r["cluster_size"] == len(r["members"]) >= 2
        assert r["component_id"] == r["keeper_doc_id"]
    # planted pairs (doc, doc+1000000) must share a component
    planted = [r for r in rows if any(m >= 1_000_000 for m in r["members"])]
    assert planted, "planted duplicates should form clusters"
    for r in planted:
        assert any(
            m + 1_000_000 in r["members"] for m in r["members"] if m < 1_000_000
        )


def test_triangle_count_on_planted_clique_plus_chain(spark, tmp_path):
    # Orders wire suppliers {1,2,3,4} into a 4-clique (every pair shares
    # many orders) and suppliers {10,11,12} into a path 10-11-12 (no
    # 10-12 co-occurrence). 4-clique = C(4,3) = 4 triangles; the path
    # contributes none. Co-occurrence counts are high enough that every
    # clique pair survives mutual k-NN selection.
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mongo_to_clickhouse_spark.queries.graphops import graph_triangle_count

    pairs = []
    oid = 0
    clique = [1, 2, 3, 4]
    for rep in range(5):
        for i in range(len(clique)):
            for j in range(i + 1, len(clique)):
                pairs.append((oid, clique[i]))
                pairs.append((oid, clique[j]))
                oid += 1
    for rep in range(5):
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
    got = {r["node_id"]: r["n_triangles"] for r in
           graph_triangle_count(spark, sf).collect()}
    assert got[-1] == 4                      # global count
    for n in clique:
        assert got[n] == 3                   # each clique node in C(3,2)=3
    for n in (10, 11, 12):
        assert got.get(n, 0) == 0
