"""Round-12 pins for the ADVICE r11 hardening items: degenerate-input
guards on the Arrow-kernel vector operators and the single-bucket
literal_bounds short-circuit. (The kmeans live-cluster fix has its own
planted-fixture tests in test_iterative_ops.py.)"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_empty_embeddings(sf: str) -> None:
    table = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
            "label": pa.array([], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(sf, "embeddings.parquet"))


def test_pca_matfree_empty_relation_returns_empty(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.vectorops import (
        emb_pca_power_matfree,
    )

    _write_empty_embeddings(str(tmp_path))
    df = emb_pca_power_matfree(spark, str(tmp_path))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "i", "dir_micro", "rayleigh",
    ]


def test_kcenter_empty_relation_returns_empty(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.vectorops import (
        sample_coreset_kcenter,
    )

    _write_empty_embeddings(str(tmp_path))
    df = sample_coreset_kcenter(spark, str(tmp_path))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "round", "center_vec_id", "radius_after_d2",
    ]


def test_kmeans_empty_relation_returns_empty(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.vectorops import emb_kmeans_lloyd

    _write_empty_embeddings(str(tmp_path))
    df = emb_kmeans_lloyd(spark, str(tmp_path))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "cluster", "n_points", "wss",
    ]


def test_literal_bounds_single_partition_short_circuits(spark):
    # n=1 used to build percentile_approx(key, array(), ...) — a
    # degenerate aggregate; now it returns empty boundary lists (every
    # row lands in bucket 0) and still serves extra_aggs in one action.
    from mongo_to_clickhouse_spark.operators.rank import (
        distributed_global_rank,
        literal_bounds,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    out = literal_bounds(
        df, {"k": (F.col("k"), F.col("id"))}, 1,
        extra_aggs={"n": F.count("*")},
    )
    assert out["k"] == ([], {})
    assert out["__extras__"]["n"] == 100
    ranked = distributed_global_rank(
        df, [F.col("k"), F.col("id")], "rk", num_partitions=1,
        bucket_key=F.col("k"), bucket_tiebreak=F.col("id"),
    ).collect()
    expect = sorted(((r["k"], r["id"]) for r in ranked))
    got = {(r["k"], r["id"]): r["rk"] for r in ranked}
    assert [got[key] for key in expect] == list(range(1, 101))
