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
