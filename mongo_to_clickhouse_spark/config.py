"""Tenant configuration model, mirroring the reference's ``AppConfig`` /
``TenantConfig`` (/root/reference/src/main.rs:163-181) minus its drift bugs
(SURVEY §0: required fields missing from the shipped examples, ENV vs
RUST_ENV mismatch — semantics we deliberately do not copy).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TenantConfig:
    """One unit of isolation: own source, own sink tables, own checkpoint
    and DLQ paths (reference: own Mongo URI/collection + ClickHouse pool,
    src/main.rs:163-173)."""

    name: str
    source_path: str                 # stand-in for mongo_uri + collection
    sink_main_path: str              # stand-in for clickhouse db.table
    sink_optout_path: str            # stand-in for db.table_opt_out
    checkpoint_path: str
    dlq_path: str
    # Directory holding the dimension fixtures (customer.parquet etc.);
    # defaults to source_path when that is itself a fixture directory.
    fixtures_path: str | None = None
    encryption_salt: str = "fixture-salt"
    batch_size: int = 10_000         # reference MAX_BATCH_SIZE, src/main.rs:39
    flush_seconds: int = 5           # reference flush timeout, src/main.rs:407
    max_retries: int = 5             # reference MAX_RETRIES, src/main.rs:40
    initial_retry_delay_sec: float = 1.0  # src/main.rs:41 (ms → sec)


@dataclass(frozen=True)
class AppConfig:
    tenants: list[TenantConfig] = field(default_factory=list)

    @staticmethod
    def from_dict(d: dict) -> "AppConfig":
        return AppConfig(
            tenants=[TenantConfig(**t) for t in d.get("tenants", [])]
        )
