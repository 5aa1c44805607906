"""CLI surface (the reference's two binaries as subcommands) + the
live-tail encoding probe.

``cmd_live`` runs unbounded (Ctrl-C semantics), so the streaming body it
shares with tests is covered by tests/test_streaming.py; here the
CLI-specific logic is pinned: config loading, tenant lookup, fixture-dir
source narrowing, argv handling — and the runtime ts-encoding probe that
keeps the live tail correct across fixture regenerations.
"""

from __future__ import annotations

import json
import os

import pytest

from mongo_to_clickhouse_spark.cli import (
    _effective_source,
    _find_tenant,
    _sf_dir_of,
    load_config,
    main,
)

SRC = "/root/testdata/sf0.001"


def _write_cfg(tmp_path, **overrides) -> str:
    base = str(tmp_path)
    tenant = {
        "name": "t1",
        "source_path": SRC,
        "sink_main_path": os.path.join(base, "main"),
        "sink_optout_path": os.path.join(base, "optout"),
        "checkpoint_path": os.path.join(base, "ckpt"),
        "dlq_path": os.path.join(base, "dlq"),
        **overrides,
    }
    path = os.path.join(base, "config.json")
    with open(path, "w") as fh:
        json.dump({"tenants": [tenant]}, fh)
    return path


def test_load_config_and_tenant_lookup(tmp_path):
    cfg = load_config(_write_cfg(tmp_path))
    assert [t.name for t in cfg.tenants] == ["t1"]
    assert _find_tenant(cfg, "t1").source_path == SRC
    with pytest.raises(SystemExit, match="unknown tenant"):
        _find_tenant(cfg, "nope")


def test_example_config_parses():
    cfg = load_config("config.example.json")
    assert cfg.tenants, "shipped example config must define tenants"


def test_effective_source_narrows_fixture_dir(tmp_path):
    cfg = load_config(_write_cfg(tmp_path))
    t = cfg.tenants[0]
    # a whole fixture dir (contains customer.parquet) must narrow to the
    # events files, or the stream ingests dimension tables as garbage
    assert _effective_source(t).endswith("events*.parquet")
    assert _sf_dir_of(cfg) == SRC


def test_main_usage_errors():
    assert main([]) != 0
    assert main(["not-a-command", "x"]) != 0


def test_live_probe_handles_raw_nanos_source(spark, tmp_path):
    """A live tail pointed at a RAW int64-epoch-nanos source (the
    round-1/2 fixture encoding) must probe the physical type and still
    produce 2024-dated statements — the CLI path does not go through the
    staged-source normalizer."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from mongo_to_clickhouse_spark.config import TenantConfig
    from mongo_to_clickhouse_spark.io import load_table
    from mongo_to_clickhouse_spark.streaming.pipeline import run_tenant_stream

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    table = pq.read_table(os.path.join(SRC, "events.parquet"))
    idx = table.schema.get_field_index("ts")
    nanos = pc.multiply(
        table.column(idx).cast(pa.timestamp("us")).cast(pa.int64()),
        pa.scalar(1000, pa.int64()),
    )
    pq.write_table(
        table.set_column(idx, "ts", nanos), os.path.join(src, "p0.parquet")
    )

    base = str(tmp_path)
    tenant = TenantConfig(
        name="nanos",
        source_path=src,
        sink_main_path=os.path.join(base, "main"),
        sink_optout_path=os.path.join(base, "optout"),
        checkpoint_path=os.path.join(base, "ckpt"),
        dlq_path=os.path.join(base, "dlq"),
    )
    customer = load_table(spark, SRC, "customer")
    q = run_tenant_stream(spark, tenant, customer, available_now=True)
    q.awaitTermination(120)
    row = spark.read.parquet(tenant.sink_main_path).select("timestamp").first()
    assert row["timestamp"].startswith("2024"), row
