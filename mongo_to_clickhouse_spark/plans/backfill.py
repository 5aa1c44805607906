"""Historical backfill — parity with the ``historical_data`` binary
(/root/reference/historical_data/src/main.rs).

CLI contract being reproduced (README.MD:4-5, main.rs:900-919):
``backfill <tenant> <startT> <endT>`` with ``%Y-%m-%dT%H:%M`` timestamps,
``end >= start`` validation (main.rs:915-919), the timestamp-range filter
pushed to the source (main.rs:349-365), the same
extract/anonymize/route/insert path as live, and processed/failed counters
reported at the end (main.rs:501-513). Error propagation follows this
binary (fails the job), not the live binary's swallowing — SURVEY §7.4.

Spark shape: one batch job; the $gte/$lte filter is a pushed-down parquet
predicate (row-group pruning); counters are ``observe()`` metrics, not
driver-side loops.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.config import TenantConfig
from mongo_to_clickhouse_spark.io import load_table
from mongo_to_clickhouse_spark.plans.pipeline import (
    anonymized_statements,
    optout_active,
    optout_dim,
    statements_from_events,
)
from mongo_to_clickhouse_spark.sinks.writers import insert_batch

TIME_FMT = "%Y-%m-%dT%H:%M"


@dataclass(frozen=True)
class BackfillStats:
    processed_docs: int
    failed_docs: int
    duration_sec: float


def parse_cli_timestamp(raw: str) -> datetime:
    """Strict ``%Y-%m-%dT%H:%M`` validation (main.rs:875-878, 912-913)."""
    try:
        return datetime.strptime(raw, TIME_FMT)
    except ValueError as exc:
        raise ValueError(
            f"invalid timestamp {raw!r}; expected format {TIME_FMT}"
        ) from exc


def run_backfill(
    spark: SparkSession,
    tenant: TenantConfig,
    sf_dir: str,
    start: str,
    end: str,
) -> BackfillStats:
    """Batch backfill for one tenant over [start, end]."""
    start_dt, end_dt = parse_cli_timestamp(start), parse_cli_timestamp(end)
    if end_dt < start_dt:
        raise ValueError("end timestamp must be >= start timestamp")

    t0 = time.time()
    events = load_table(
        spark,
        sf_dir,
        "events",
        ts_range=(start_dt.strftime("%Y-%m-%d %H:%M:%S"),
                  end_dt.strftime("%Y-%m-%d %H:%M:%S")),
    )
    customer = load_table(spark, sf_dir, "customer")

    # LEFT join so the counters see every scanned event: an event whose
    # user_id has no customer match must land in failed_docs (the
    # reference counts per document, historical_data/src/main.rs:501-513);
    # the anonymize step's validation filter then drops it.
    stmts = statements_from_events(events, customer, how="left")
    obs = Observation("backfill")
    observed = stmts.observe(
        obs,
        F.count(F.lit(1)).alias("scanned"),
        F.sum(
            (
                F.col("event_id").isNull()
                | F.col("ts").isNull()
                | F.col("props").isNull()
                | F.col("actor_name").isNull()
                | (F.length(F.split(F.col("actor_name"), "@").getItem(0)) == 0)
            ).cast("long")
        ).alias("skipped"),
    )
    anon = anonymized_statements(observed)
    active = optout_active(optout_dim(customer))
    insert_batch(
        anon,
        0,
        tenant,
        active,
        max_retries=tenant.max_retries,
        initial_delay_sec=tenant.initial_retry_delay_sec,
    )

    metrics = obs.get
    scanned = metrics["scanned"] or 0
    skipped = metrics["skipped"] or 0
    return BackfillStats(
        processed_docs=int(scanned - skipped),
        failed_docs=int(skipped),
        duration_sec=round(time.time() - t0, 3),
    )


def backfill_output(
    spark: SparkSession, sf_dir: str, start: str, end: str
) -> DataFrame:
    """The backfill's main-table relation (query-entry form, no side
    effects): range-filtered transform → anti-join routing."""
    events = load_table(spark, sf_dir, "events", ts_range=(start, end))
    customer = load_table(spark, sf_dir, "customer")
    anon = anonymized_statements(statements_from_events(events, customer))
    active = optout_active(optout_dim(customer))
    dim = active.select(F.col("hashed_moodle_id").alias("hashed_value"))
    return anon.join(F.broadcast(dim), "hashed_value", "left_anti")
