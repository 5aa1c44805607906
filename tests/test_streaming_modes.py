"""Streaming runtime modes beyond availableNow: the live 5-second
micro-batch cadence, and checkpoint-loss recovery (the reference's
token-expired error 280 path: clear and restart — src/main.rs:323-341)."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.config import TenantConfig
from mongo_to_clickhouse_spark.streaming.pipeline import run_tenant_stream
from mongo_to_clickhouse_spark.io import load_table

SRC = "/root/testdata/sf0.001"


def _tenant(tmp, name="live") -> TenantConfig:
    base = os.path.join(str(tmp), name)
    return TenantConfig(
        name=name,
        source_path=os.path.join(base, "source"),
        sink_main_path=os.path.join(base, "main"),
        sink_optout_path=os.path.join(base, "optout"),
        checkpoint_path=os.path.join(base, "checkpoint"),
        dlq_path=os.path.join(base, "dlq"),
        flush_seconds=1,
        max_retries=2,
        initial_retry_delay_sec=0.01,
    )


def _stage(t: TenantConfig):
    os.makedirs(t.source_path, exist_ok=True)
    shutil.copy(os.path.join(SRC, "events.parquet"), t.source_path)


def test_live_trigger_mode_processes_and_stops(spark, tmp_path):
    """processingTime cadence (the reference's flush timer): data flows
    without draining-and-stopping; graceful stop() completes the batch."""
    t = _tenant(tmp_path)
    _stage(t)
    customer = load_table(spark, SRC, "customer")
    q = run_tenant_stream(spark, t, customer, available_now=False)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.isdir(t.sink_main_path):
            time.sleep(0.5)
        assert os.path.isdir(t.sink_main_path), "live stream produced no output"
    finally:
        q.stop()
    assert spark.read.parquet(t.sink_main_path).count() > 0


def test_checkpoint_loss_recovery_is_idempotent(spark, tmp_path):
    """Checkpoint wiped (the 280 clear-and-restart path): reprocessing from
    scratch rewrites the same batch_id partitions — deterministic
    batch-keyed overwrite writes keep the sink exactly-once even though
    delivery degraded to at-least-once."""
    t = _tenant(tmp_path, name="ckloss")
    _stage(t)
    customer = load_table(spark, SRC, "customer")

    q1 = run_tenant_stream(spark, t, customer, available_now=True)
    q1.awaitTermination(120)
    first = spark.read.parquet(t.sink_main_path).count()
    first_ids = spark.read.parquet(t.sink_main_path).select("id").distinct().count()

    shutil.rmtree(t.checkpoint_path)  # token expired / checkpoint lost
    q2 = run_tenant_stream(spark, t, customer, available_now=True)
    q2.awaitTermination(120)

    main = spark.read.parquet(t.sink_main_path)
    assert main.count() == first
    assert main.select("id").distinct().count() == first_ids
