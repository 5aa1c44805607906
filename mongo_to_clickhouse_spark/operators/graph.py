"""Connected components over near-duplicate pair edges — the clustering
step that turns pairwise dedup matches into groups with one canonical
keeper per group.

Algorithm: iterative label propagation (hash-min). Each node starts with
label = its own id; every round each node takes the min label among itself
and its neighbors; stop when no label changes. Rounds are O(diameter) —
near-dup clusters are tiny (diameter ≤ 3-4 in practice), so this converges
in a handful of Spark jobs, each a join + groupBy on uniformly-hashed ids.
This is the standard large-graph CC formulation (hash-to-min, Rastogi et
al.), bounded-shuffle per round and resilient to 100 TB edge lists —
unlike driver-side union-find, which would need the whole edge set on one
machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.operators.materialize import barrier, reliable_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iterations: int = 20,
) -> DataFrame:
    """(src, dst) undirected edges → (node_id, component_id) with
    component_id = min node id in the component."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("node_id"))
        .distinct()
        .withColumn("component_id", F.col("node_id"))
    )
    sym = barrier(sym)
    labels = reliable_checkpoint(labels)

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node_id)
            .groupBy("u")
            .agg(F.min("component_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.node_id == neighbor_min.u, "left")
            .select(
                "node_id",
                F.least(
                    F.col("component_id"), F.coalesce(F.col("nbr_min"), F.col("component_id"))
                ).alias("component_id"),
                (F.coalesce(F.col("nbr_min"), F.col("component_id"))
                 < F.col("component_id")).alias("__changed"),
            )
        )
        # reliable checkpoint once per round: fault-tolerant files AND
        # lineage truncation (persist alone nests per-round plans until
        # driver analysis OOMs on long chains); the same materialization
        # serves the convergence check
        updated = reliable_checkpoint(updated)
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    return labels


def dedup_clusters(edges: DataFrame, src: str = "a_id", dst: str = "b_id") -> DataFrame:
    """Edges → (component_id, member doc ids, keeper = min id, size)."""
    cc = connected_components(edges, src, dst)
    return cc.groupBy("component_id").agg(
        F.sort_array(F.collect_list("node_id")).alias("members"),
        F.min("node_id").alias("keeper_doc_id"),
        F.count("*").alias("cluster_size"),
    )
