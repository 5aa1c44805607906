"""CLI — the two binaries of the reference as subcommands.

    python -m mongo_to_clickhouse_spark.cli live <config.yml>
    python -m mongo_to_clickhouse_spark.cli backfill <config.yml> \
        <tenant> <startT> <endT>          # %Y-%m-%dT%H:%M, end >= start
    python -m mongo_to_clickhouse_spark.cli query <id> [sf_dir] [n]
                                          # run any registry operator;
                                          # `query list` prints all ids

Mirrors ``mongo-to-clickhouse`` (live CDC, all tenants) and
``historical_data <tenant> <start> <end>`` (/root/reference/README.MD:4-5).
Config selection is explicit — no ENV/RUST_ENV drift (SURVEY §0).
Fixture mode (parquet paths in the config) runs end-to-end in this
container; Mongo/ClickHouse URIs require the connector jars (sources/).
"""

from __future__ import annotations

import sys

from mongo_to_clickhouse_spark.config import AppConfig, TenantConfig
from mongo_to_clickhouse_spark.session import get_spark


def load_config(path: str) -> AppConfig:
    import json

    text = open(path).read()
    if path.endswith((".yml", ".yaml")):
        try:
            import yaml

            return AppConfig.from_dict(yaml.safe_load(text))
        except ImportError:
            pass  # fall through: YAML subset that is valid JSON
    return AppConfig.from_dict(json.loads(text))


def _find_tenant(cfg: AppConfig, name: str) -> TenantConfig:
    for t in cfg.tenants:
        if t.name == name:
            return t
    raise SystemExit(f"unknown tenant {name!r}; known: {[t.name for t in cfg.tenants]}")


def _effective_source(t: TenantConfig) -> str:
    """If source_path is a whole fixture directory (contains the other
    tables), narrow the stream to the events files — otherwise streaming
    would ingest customer/lineitem/... through the events schema as
    null-filled garbage rows."""
    import os

    if os.path.isfile(os.path.join(t.source_path, "customer.parquet")):
        return os.path.join(t.source_path, "events*.parquet")
    return t.source_path


def cmd_live(cfg_path: str) -> int:
    import dataclasses

    from mongo_to_clickhouse_spark.io import load_table
    from mongo_to_clickhouse_spark.streaming.pipeline import run_multi_tenant

    cfg = load_config(cfg_path)
    spark = get_spark(app_name="mongo-to-clickhouse-live")
    customer = load_table(spark, _sf_dir_of(cfg), "customer")
    tenants = [
        dataclasses.replace(t, source_path=_effective_source(t))
        for t in cfg.tenants
    ]
    queries = run_multi_tenant(spark, tenants, customer, available_now=False)
    print(f"started {len(queries)} tenant stream(s); Ctrl-C to stop")
    try:
        for q in queries:
            q.awaitTermination()
    except KeyboardInterrupt:
        for q in queries:
            q.stop()
    return 0


def cmd_backfill(cfg_path: str, tenant: str, start: str, end: str) -> int:
    from mongo_to_clickhouse_spark.plans.backfill import run_backfill

    cfg = load_config(cfg_path)
    t = _find_tenant(cfg, tenant)
    spark = get_spark(app_name="mongo-to-clickhouse-backfill")
    stats = run_backfill(spark, t, _sf_dir_of(cfg), start, end)
    print(
        f"backfill complete: processed={stats.processed_docs} "
        f"failed={stats.failed_docs} duration={stats.duration_sec}s"
    )
    return 0


def _sf_dir_of(cfg: AppConfig) -> str:
    """Directory holding the dimension fixtures: explicit ``fixtures_path``
    wins; otherwise source_path (fixture mode points it at a testdata
    dir)."""
    import os

    t = cfg.tenants[0]
    if t.fixtures_path:
        return t.fixtures_path
    src = t.source_path
    return src if os.path.isdir(src) else os.path.dirname(src)


def cmd_query(qid: str, sf_dir: str, n: int) -> int:
    """Run one registry operator against a fixture dir and show rows —
    the ad-hoc entry point for every SURVEY §2 id (the reference has no
    equivalent; its dataflow is fixed)."""
    from mongo_to_clickhouse_spark import queries as registry

    reg = registry.registry()
    if qid == "list":
        for k, (_fn, sql) in sorted(reg.items()):
            print(f"{k}\t{'oracle' if sql is not None else 'rows-only'}")
        return 0
    if qid not in reg:
        import difflib

        close = difflib.get_close_matches(qid, reg, n=3)
        raise SystemExit(f"unknown query id {qid!r}; close: {close}")
    spark = get_spark(app_name=f"query-{qid}")
    reg[qid][0](spark, sf_dir).show(n, truncate=False)
    return 0


def main(argv: list[str]) -> int:
    if len(argv) >= 2 and argv[0] == "live":
        return cmd_live(argv[1])
    if len(argv) >= 5 and argv[0] == "backfill":
        return cmd_backfill(argv[1], argv[2], argv[3], argv[4])
    if len(argv) >= 2 and argv[0] == "query":
        sf = argv[2] if len(argv) > 2 else "/root/testdata/sf0.01"
        n = int(argv[3]) if len(argv) > 3 else 20
        return cmd_query(argv[1], sf, n)
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
