"""Sink writers: the ``foreachBatch`` body of the streaming pipeline.

Reference behavior being reproduced (Spark-idiomatically):

- dual-table routing + bulk insert (/root/reference/src/main.rs:874-913)
  → two filtered writes per micro-batch
- chunked insert with retry (src/main.rs:688-743)
  → Spark task retries handle transient task failure; sink-level errors
    are caught once here and routed to the DLQ
- on persistent failure, the batch is serialized to the DLQ keyed by
  (tenant, db, table, opt_out) (src/main.rs:918-939)
  → DLQ parquet table with the same key columns
- error PROPAGATION follows the historical binary
  (historical_data/src/main.rs:540-545), not the live binary which
  swallows insert errors (src/main.rs:598-609) — SURVEY §7.4 item 6.

Idempotence: writes land under ``batch_id=N`` subdirectories, so a replayed
micro-batch overwrites its own output instead of duplicating it — this is
the strengthening from the reference's at-least-once (resume token saved
after insert, src/main.rs:427-439) to effectively-once, documented per
SURVEY §7.4 item 1.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.config import TenantConfig
from mongo_to_clickhouse_spark.sinks import dlq as dlq_mod
from mongo_to_clickhouse_spark.plans.pipeline import route_split

# Reference retry policy (src/main.rs:40-41, 736-740): 5 attempts,
# 1000 ms initial delay, exponential doubling. The delay is configurable so
# tests don't sleep.
MAX_RETRIES = 5
INITIAL_RETRY_DELAY_SEC = 1.0


def _write(df: DataFrame, base: str, batch_id: int) -> None:
    # created_at = sink-side now() (reference: ClickHouse now(),
    # src/main.rs:864-866)
    out = df.withColumn("created_at", F.current_timestamp())
    out.write.mode("overwrite").parquet(os.path.join(base, f"batch_id={batch_id}"))


def insert_batch(
    batch_df: DataFrame,
    batch_id: int,
    tenant: TenantConfig,
    active_dim: DataFrame,
    fail_injector=None,
    max_retries: int = MAX_RETRIES,
    initial_delay_sec: float = INITIAL_RETRY_DELAY_SEC,
) -> int:
    """Route rows by opt-out membership and write both sinks, retrying with
    exponential backoff (attempts ≤ ``max_retries``, delay doubling from
    ``initial_delay_sec`` — the reference's per-chunk policy,
    src/main.rs:692-743). Raises after exhausting retries (the historical
    binary's propagating semantics). Returns the number of attempts used.

    ``fail_injector(batch_df, batch_id)`` is a test hook that may raise to
    simulate sink unavailability."""
    main, optout = route_split(batch_df, active_dim)
    delay = initial_delay_sec
    for attempt in range(1, max_retries + 1):
        try:
            if fail_injector is not None:
                fail_injector(batch_df, batch_id)
            _write(main, tenant.sink_main_path, batch_id)
            _write(optout, tenant.sink_optout_path, batch_id)
            return attempt
        except Exception:  # noqa: BLE001
            if attempt == max_retries:
                raise
            time.sleep(delay)
            delay *= 2
    raise AssertionError("unreachable")


def dual_write_batch(
    batch_df: DataFrame,
    batch_id: int,
    tenant: TenantConfig,
    active_dim: DataFrame,
    fail_injector=None,
) -> None:
    """foreachBatch body: ``insert_batch``, with any failure (after the
    retry budget) captured to the tenant's DLQ (the stream keeps running;
    the replay job drains later)."""
    try:
        insert_batch(
            batch_df,
            batch_id,
            tenant,
            active_dim,
            fail_injector,
            max_retries=tenant.max_retries,
            initial_delay_sec=tenant.initial_retry_delay_sec,
        )
    except Exception:  # noqa: BLE001 — any sink error → DLQ, then continue
        dlq_mod.append_failed_batch(batch_df, batch_id, tenant)
