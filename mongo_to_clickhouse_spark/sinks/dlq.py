"""Dead-letter queue as a parquet table + replay job.

Reference: failed batches serialized to RocksDB under key
``failed_batch:{tenant}:{db}:{table}:{opt_out}`` and retried every 60 s
(/root/reference/src/main.rs:918-939, 941-1017). Spark shape: an
append-only parquet DLQ partitioned by (tenant, batch_id); the replay job
re-runs the insert path and rewrites the DLQ without the drained batches
(delete-on-success = overwrite of a partitioned table).

NOTE the live binary's DLQ key parsing panics on every retry
(``splitn(4,':')`` then ``parts[4]``, src/main.rs:952-961); we follow the
fixed historical variant (historical_data/src/main.rs:808-817) — SURVEY
§7.4 item 6.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.config import TenantConfig


def _partition_path(tenant: TenantConfig, batch_id: int) -> str:
    return os.path.join(
        tenant.dlq_path, f"tenant={tenant.name}", f"batch_id={batch_id}"
    )


def append_failed_batch(
    batch_df: DataFrame, batch_id: int, tenant: TenantConfig
) -> None:
    """Queue a failed batch, idempotently: the write targets the
    (tenant, batch_id) partition directory directly with overwrite, so a
    batch that fails repeatedly (e.g. replayed after checkpoint loss while
    the sink is still down) is queued exactly once — an appending write
    would double the rows and break the effectively-once sink contract."""
    batch_df.write.mode("overwrite").parquet(_partition_path(tenant, batch_id))


def retry_failed_batches(
    spark: SparkSession,
    tenant: TenantConfig,
    active_dim: DataFrame,
    fail_injector=None,
) -> int:
    """Replay every queued batch through the insert path; drop drained
    batches from the DLQ. Returns the number of batches drained. A batch
    that fails again simply stays queued (the reference's 60 s retry loop
    picks it up next cycle)."""
    from mongo_to_clickhouse_spark.sinks.writers import insert_batch

    if not os.path.isdir(tenant.dlq_path):
        return 0
    dlq = spark.read.parquet(tenant.dlq_path).filter(
        F.col("tenant") == tenant.name
    )
    batch_ids = [r[0] for r in dlq.select("batch_id").distinct().collect()]
    drained = 0
    for bid in sorted(batch_ids):
        rows = dlq.filter(F.col("batch_id") == bid).drop("tenant", "batch_id")
        try:
            insert_batch(
                rows,
                int(bid),
                tenant,
                active_dim,
                fail_injector,
                max_retries=1,  # the 60s loop is the retry cadence here
            )
        except Exception:  # noqa: BLE001 — still failing: keep queued
            continue
        _drop_partition(tenant, int(bid))
        drained += 1
    return drained


def _drop_partition(tenant: TenantConfig, batch_id: int) -> None:
    import shutil

    part = _partition_path(tenant, batch_id)
    if os.path.isdir(part):
        shutil.rmtree(part)
