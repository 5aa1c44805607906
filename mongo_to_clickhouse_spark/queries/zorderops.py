"""Z-order clustered parquet sink (multi-dimensional file skipping).

The reference's sink tier writes append-only inserts
(`src/main.rs` batch insert path); data layout for read-side pruning is
left to ClickHouse's ORDER BY key, which clusters ONE dimension. This ID
is the lakehouse-side answer for ≥2 filter dimensions: Morton-key
clustering before the parquet write, so min/max footer stats prune files
for BOTH `user_id` and `value` predicates. See operators/zorder.py for
the scale argument and tests/test_zorder.py for the layout pin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.io import cached_work_dir, load_table
from mongo_to_clickhouse_spark.operators.zorder import (
    ZBITS,
    dense_bucket,
    dense_bucket_sql,
    interleave_bits,
    interleave_bits_sql,
)

ZORDER_FILES = 16  # range partitions = parquet files in the clustered layout


def _with_zkey(ev: DataFrame) -> DataFrame:
    """events + Morton key over (user_id, floor(value*100)) buckets."""
    v100 = F.floor(F.col("value") * 100).cast("bigint")
    ev = ev.select("event_id", "user_id", v100.alias("v100"))
    bounds = ev.agg(
        F.min("user_id").alias("mu"),
        F.max("user_id").alias("xu"),
        F.min("v100").alias("mv"),
        F.max("v100").alias("xv"),
    )
    return ev.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "user_id",
        "v100",
        interleave_bits(
            dense_bucket(F.col("user_id"), F.col("mu"), F.col("xu")),
            dense_bucket(F.col("v100"), F.col("mv"), F.col("xv")),
        ).alias("zkey"),
    )


def zorder_write(ev: DataFrame, out: str, n_files: int = ZORDER_FILES) -> None:
    """Cluster by Morton key and write: one range exchange, sorted files,
    bounded per-file min/max spread on BOTH dimensions."""
    (
        _with_zkey(ev)
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.parquet(out)
    )


def sink_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the z-order clustered layout, read it back, and return the
    per-row Morton key assignment — the oracle-checkable contract of the
    write (the file-level clustering property itself is pinned by
    tests/test_zorder.py, which Spark alone can observe)."""
    def _build(root: str) -> None:
        zorder_write(
            load_table(spark, sf_dir, "events"), os.path.join(root, "events_z")
        )

    out = os.path.join(
        cached_work_dir("zsink", sf_dir, ("events",), _build), "events_z"
    )
    return (
        spark.read.parquet(out)
        .select("event_id", "zkey")
        .orderBy("event_id")
    )


_XB = dense_bucket_sql("user_id", "mu", "xu")
_YB = dense_bucket_sql("v100", "mv", "xv")

SINK_ZORDER_CLUSTER_SQL = f"""
    WITH ev AS (
        SELECT event_id, user_id,
               CAST(floor(value * 100) AS BIGINT) AS v100
        FROM events
    ),
    bounds AS (
        SELECT MIN(user_id) AS mu, MAX(user_id) AS xu,
               MIN(v100) AS mv, MAX(v100) AS xv
        FROM ev
    )
    SELECT event_id, {interleave_bits_sql(f"({_XB})", f"({_YB})", ZBITS)} AS zkey
    FROM ev, bounds
    ORDER BY event_id
"""


COMPACT_SMALL_FILES = 64       # synthesized small-files problem
COMPACT_ADVISORY = "4MB"       # AQE rebalance target per output file


def compact_binpack(spark: SparkSession, src_dir: str, out_dir: str) -> None:
    """Bin-pack compaction of a small-files layout: one AQE REBALANCE
    exchange sized to ``COMPACT_ADVISORY`` per post-shuffle partition →
    one right-sized parquet file each.

    Spark-first shape: REBALANCE is the purpose-built operator — AQE
    both COALESCES undersized partitions and SPLITS oversized
    (skew-safe, unlike coalesce(n) which can only merge and keeps any
    giant partition giant). The advisory size is the one knob; no
    hand-computed file counts, so the same code is correct at 64 files
    or 64 million. This is the maintenance job every append-heavy
    ingest (the reference's insert pattern) needs to keep scans from
    dying of per-file open/footer overhead."""
    conf_key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    saved = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, COMPACT_ADVISORY)
    try:
        df = spark.read.parquet(src_dir)
        df.createOrReplaceTempView("compact_src")
        # plans are optimized at action time — write inside the conf window
        spark.sql("SELECT /*+ REBALANCE */ * FROM compact_src").write.mode(
            "overwrite"
        ).parquet(out_dir)
    finally:
        if saved is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, saved)


def sink_compaction_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the small-files problem (events scattered across
    ``COMPACT_SMALL_FILES`` parquet files — the natural output of many
    micro-batch appends), compact with ``compact_binpack``, and return
    per-type accounting read FROM THE COMPACTED LAYOUT — the
    oracle-checkable contract that compaction is content-preserving.
    The file-count collapse itself is pinned by
    tests/test_zorder.py::test_compaction_binpacks_small_files."""
    def _build(root: str) -> None:
        small = os.path.join(root, "small")
        load_table(spark, sf_dir, "events").repartition(
            COMPACT_SMALL_FILES
        ).write.parquet(small)
        compact_binpack(spark, small, os.path.join(root, "packed"))

    packed = os.path.join(
        cached_work_dir("compact", sf_dir, ("events",), _build), "packed"
    )
    return (
        spark.read.parquet(packed)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


SINK_COMPACTION_BINPACK_SQL = """
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES: dict[str, tuple] = {
    "sink_zorder_cluster": (sink_zorder_cluster, SINK_ZORDER_CLUSTER_SQL),
    "sink_compaction_binpack": (
        sink_compaction_binpack,
        SINK_COMPACTION_BINPACK_SQL,
    ),
}
