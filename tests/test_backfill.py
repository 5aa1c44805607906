"""Backfill (historical-binary parity) + multimodal plumbing tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.config import TenantConfig
from mongo_to_clickhouse_spark.io import load_table
from mongo_to_clickhouse_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    media_table,
)
from mongo_to_clickhouse_spark.plans.backfill import (
    parse_cli_timestamp,
    run_backfill,
)

SRC = "/root/testdata/sf0.001"


def _tenant(tmp) -> TenantConfig:
    base = str(tmp)
    return TenantConfig(
        name="bf",
        source_path=SRC,
        sink_main_path=os.path.join(base, "main"),
        sink_optout_path=os.path.join(base, "optout"),
        checkpoint_path=os.path.join(base, "ckpt"),
        dlq_path=os.path.join(base, "dlq"),
    )


def test_cli_timestamp_validation():
    assert parse_cli_timestamp("2024-01-03T00:00").year == 2024
    with pytest.raises(ValueError, match="expected format"):
        parse_cli_timestamp("2024-01-03 00:00")
    with pytest.raises(ValueError, match="expected format"):
        parse_cli_timestamp("not-a-time")


def test_backfill_end_before_start(spark, tmp_path):
    with pytest.raises(ValueError, match="end timestamp"):
        run_backfill(spark, _tenant(tmp_path), SRC, "2024-01-10T00:00", "2024-01-01T00:00")


def test_backfill_runs_and_counts(spark, tmp_path):
    t = _tenant(tmp_path)
    stats = run_backfill(spark, t, SRC, "2024-01-03T00:00", "2024-01-27T00:00")
    assert stats.failed_docs == 0  # fixture rows are all well-formed
    main = spark.read.parquet(t.sink_main_path)
    optout = spark.read.parquet(t.sink_optout_path)
    assert main.count() + optout.count() == stats.processed_docs
    # range actually applied
    events = load_table(spark, SRC, "events", ts_range=("2024-01-03 00:00:00", "2024-01-27 00:00:00"))
    assert stats.processed_docs == events.join(
        load_table(spark, SRC, "customer"),
        events.user_id == F.col("c_custkey"),
    ).count()


def test_multimodal_decode_deterministic(spark):
    docs = load_table(spark, SRC, "documents").limit(50)
    decoded = decode_media(media_table(docs))
    a = {r["doc_id"]: (r["width"], r["height"], r["n_frames"]) for r in decoded.collect()}
    b = {r["doc_id"]: (r["width"], r["height"], r["n_frames"]) for r in decoded.collect()}
    assert a == b and len(a) == 50
    assert all(64 <= w <= 255 and 64 <= h <= 255 and 1 <= f <= 4 for w, h, f in a.values())


def test_multimodal_frame_sample_stride(spark):
    docs = load_table(spark, SRC, "documents").limit(30)
    decoded = decode_media(media_table(docs))
    frames = frame_sample(decoded, stride=2)
    got = frames.groupBy("doc_id").count().collect()
    expected = {r["doc_id"]: (r["n_frames"] + 1) // 2 for r in decoded.collect()}
    assert {r["doc_id"]: r["count"] for r in got} == expected


def test_backfill_counts_unmatched_events_as_failed(spark, tmp_path):
    """An event whose user_id has no customer row must be counted in
    failed_docs (per-document accounting like the historical binary), not
    silently excluded by the actor join."""
    import shutil

    src2 = os.path.join(str(tmp_path), "src2")
    os.makedirs(src2)
    shutil.copy(os.path.join(SRC, "customer.parquet"),
                os.path.join(src2, "customer.parquet"))
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    # pick planted rows from INSIDE the backfill window, building the bounds
    # in whatever physical type THIS fixture generation uses for ts
    if dict(ev.dtypes)["ts"] == "bigint":  # epoch-nanos encoding
        bound = lambda s: F.unix_micros(F.lit(s).cast("timestamp")) * 1000  # noqa: E731
    else:  # timestamp / timestamp_ntz encoding
        bound = lambda s: F.lit(s).cast(dict(ev.dtypes)["ts"])  # noqa: E731
    bogus = (
        ev.filter(F.col("ts").between(bound("2024-01-05 00:00:00"),
                                      bound("2024-01-20 00:00:00")))
        .limit(3)
        .withColumn("user_id", F.lit(-999999).cast(ev.schema["user_id"].dataType))
        .withColumn("event_id", F.col("event_id") + 10_000_000)
    )
    ev.unionByName(bogus).write.parquet(os.path.join(src2, "events.parquet"))

    base = run_backfill(spark, _tenant(tmp_path), SRC, "2024-01-03T00:00", "2024-01-27T00:00")
    stats = run_backfill(spark, _tenant(tmp_path), src2, "2024-01-03T00:00", "2024-01-27T00:00")
    assert stats.failed_docs == base.failed_docs + 3
    assert stats.processed_docs == base.processed_docs
