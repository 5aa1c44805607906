"""Schema-drift canary: the round-2 fixture regeneration silently changed
``events.ts`` from int64 epoch-nanos to parquet ``timestamp[us]``, and the
streaming tier emitted 1970-dated garbage for a whole round before anyone
noticed. This test makes the NEXT regeneration fail loudly in one obvious
place.

Two layers:

- the NORMALIZED schema contract: whatever the physical encoding,
  ``load_table`` must present each table with these exact column names and
  logical types (``ts`` as a timestamp type, never a bare int64). Every
  query in the registry is written against this contract.
- a physical-encoding probe for ``events.ts``: not an assertion that the
  encoding never changes (it may), but that it is one of the encodings the
  adaptation seams (io.load_table, streaming/util.normalize_events_ts)
  know how to normalize.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from mongo_to_clickhouse_spark.io import TABLES, load_table, table_path
from mongo_to_clickhouse_spark.streaming.util import normalize_events_ts

SRC = "/root/testdata/sf0.001"

# load_table's normalized dtype contract, (column, dtype) in order.
# TIMESTAMP-kind columns may surface as timestamp or timestamp_ntz
# depending on the fixture's physical encoding — both format/compare
# identically under the pinned UTC session — so they are pinned to the
# SET of admissible dtypes.
TS = {"timestamp", "timestamp_ntz"}
EXPECTED: dict[str, list[tuple[str, object]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"), ("c_name", "string"), ("c_nationkey", "int"),
        ("c_acctbal", "double"), ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"), ("s_name", "string"), ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"), ("p_name", "string"), ("p_brand", "string"),
        ("p_type", "string"), ("p_size", "int"), ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"), ("o_custkey", "bigint"),
        ("o_orderstatus", "string"), ("o_totalprice", "double"),
        ("o_orderdate", TS), ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"), ("l_partkey", "bigint"), ("l_suppkey", "bigint"),
        ("l_linenumber", "int"), ("l_quantity", "double"),
        ("l_extendedprice", "double"), ("l_discount", "double"),
        ("l_tax", "double"), ("l_returnflag", "string"),
        ("l_linestatus", "string"), ("l_shipdate", TS),
    ],
    "events": [
        ("event_id", "bigint"), ("ts", TS), ("user_id", "bigint"),
        ("event_type", "string"), ("value", "double"), ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"), ("embedding", "array<float>"), ("label", "int"),
    ],
}


@pytest.mark.parametrize("name", TABLES)
def test_load_table_normalized_schema(spark, name):
    got = load_table(spark, SRC, name).dtypes
    exp = EXPECTED[name]
    assert [c for c, _ in got] == [c for c, _ in exp], (
        f"{name}: column set/order drifted — fixture regenerated? "
        f"got {got}"
    )
    for (col, dtype), (ecol, edtype) in zip(got, exp):
        ok = dtype in edtype if isinstance(edtype, set) else dtype == edtype
        assert ok, (
            f"{name}.{col}: normalized dtype {dtype!r} not in contract "
            f"{edtype!r} — if the fixture encoding changed, teach "
            f"io.load_table/_scan to normalize it, don't patch consumers"
        )


def test_events_ts_physical_encoding_is_known():
    """The staging normalizer must recognize the CURRENT physical encoding
    of events.ts; if this fails, a regeneration introduced an encoding the
    seams don't handle yet."""
    import pyarrow as pa

    field = pq.read_schema(table_path(SRC, "events")).field("ts")
    t = field.type
    known = (
        pa.types.is_integer(t)       # epoch-nanos as int64
        or pa.types.is_timestamp(t)  # timestamp[ns]/[us]/[ms]
    )
    assert known, f"events.ts physical type {t} unknown to the seams"
    # and normalization actually lands on timestamp[us]
    table = normalize_events_ts(pq.read_table(table_path(SRC, "events")))
    assert table.schema.field("ts").type == pa.timestamp("us")


def test_events_ts_values_are_2024_dated(spark):
    """Magnitude canary: a unit-confusion bug (the round-2 failure mode)
    lands decades away from the fixture's 2024 time range."""
    row = load_table(spark, SRC, "events").selectExpr(
        "CAST(MIN(ts) AS STRING) AS lo", "CAST(MAX(ts) AS STRING) AS hi"
    ).first()
    assert row["lo"].startswith("2024"), row
    assert row["hi"].startswith("2024"), row


def test_scan_cache_keys_by_sf_dir(spark):
    """The resolved-scan cache must key by (session, sf_dir, table) — a
    hit for one scale factor must never serve another."""
    a = load_table(spark, "/root/testdata/sf0.001", "events").count()
    b = load_table(spark, "/root/testdata/sf0.01", "events").count()
    a2 = load_table(spark, "/root/testdata/sf0.001", "events").count()
    assert a == a2 == 1000
    assert b == 10_000


def test_cached_barrier_rebuilds_on_fixture_rewrite(spark, tmp_path):
    """cached_barrier must key by the source table's (mtime_ns, size):
    an in-place rewrite of the fixture serves fresh data, never the
    stale checkpoint (the silent-wrong-results mode the round-3 review
    flagged for caches)."""
    import os
    import shutil
    import time

    from mongo_to_clickhouse_spark.operators.materialize import cached_barrier

    sf = str(tmp_path)
    shutil.copy(table_path("/root/testdata/sf0.001", "events"),
                os.path.join(sf, "events.parquet"))

    def build():
        return load_table(spark, sf, "events").selectExpr("COUNT(*) AS n")

    args = (spark, sf, "canary_ev", build)
    n1 = cached_barrier(*args, tables=("events",)).first()["n"]
    # hit: same stats → same checkpointed relation
    assert cached_barrier(*args, tables=("events",)).first()["n"] == n1
    assert n1 == 1000

    # in-place rewrite with the sf0.01 table (different size & mtime)
    time.sleep(0.01)
    shutil.copy(table_path("/root/testdata/sf0.01", "events"),
                os.path.join(sf, "events.parquet"))
    n2 = cached_barrier(*args, tables=("events",)).first()["n"]
    assert n2 == 10_000
