"""SparkSession factory.

Design notes (100 TB posture): everything here is per-session tuning that
holds on a real cluster — AQE on (runtime coalesce + skew-join), UTC
session timezone (the reference formats wall-clock strings in
container-local Asia/Tokyo, /root/reference/Dockerfile:11-12 — a hazard we
deliberately do NOT copy; see SURVEY §7.4), Arrow for the few Pandas-UDF
paths. ``shuffle_partitions`` defaults to the local core count; on a real
cluster you would size it to ~2-3× total executor cores or let AQE coalesce
from a higher initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    raw = os.environ.get("SPARK_GRAFT_CPUS", "")
    try:
        return max(1, int(raw))
    except ValueError:
        return os.cpu_count() or 4


# Runtime-settable confs every query entry depends on, applied defensively
# to WHATEVER session the caller provides (the driver harness builds its own
# plain SparkSession): ns-parquet handling, deterministic UTC timestamp
# rendering, AQE, Arrow for the Pandas-UDF paths.
_REQUIRED_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def shuffle_partition_count(spark: SparkSession, default: int = 32) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating the
    non-numeric values some platforms set (e.g. 'auto' under
    auto-optimized shuffle) — callers use it only to size explicit
    repartition() calls ahead of checkpoints, where any sane positive
    number works."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions",
                                  str(default)))
    except ValueError:
        return default


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Verify-and-repair the required confs on EVERY call: a caller that
    mutates one mid-session (e.g. flips the session timezone) would
    otherwise put every later query into a silent wrong-results mode. The
    check is 4 conf.get round-trips (~1 ms) — noise next to any query; the
    set() only fires on actual drift."""
    for k, v in _REQUIRED_RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — static conf in some deployment
            pass
    return spark


def get_spark(
    app_name: str = "mongo-to-clickhouse-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with scale-aware defaults."""
    n = cpus if cpus is not None else default_cpus()
    sp = shuffle_partitions if shuffle_partitions is not None else n
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # Parquet TIMESTAMP(NANOS) (events.ts) is illegal in vanilla Spark;
        # read as epoch-nanos long, converted to a µs timestamp in io.py
        # (truncation — matching DuckDB's ns→µs read behavior).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # reliable checkpoints (operators/materialize.py): delete files
        # once their RDD is GC'd so long sessions don't accrete temp data
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Streaming state-store backend. The reference checkpoints batches to
    # RocksDB (its resume-token store); Spark's equivalent posture at
    # 100 TB state volumes is the RocksDB state store provider — state
    # lives off-heap/on-disk per executor instead of in the JVM heap.
    # Toggle: SPARK_GRAFT_STATE_STORE=rocksdb (the stateful test suite
    # runs green under it; HDFSBackedStateStore remains the default
    # because fixture-scale state fits comfortably in heap).
    if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
