"""Every declared (query, oracle) pair must match on sf0.01 — the local
replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

from mongo_to_clickhouse_spark.queries import registry
from tests.oracle_harness import compare, duck_connection

REG = registry()
ORACLE_IDS = sorted(k for k, (_f, sql) in REG.items() if sql is not None)
ROWS_ONLY_IDS = sorted(k for k, (_f, sql) in REG.items() if sql is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("qid", ORACLE_IDS)
def test_oracle_parity(qid, spark, sf_dir, duck):
    fn, sql = REG[qid]
    problems = compare(fn(spark, sf_dir), duck, sql)
    assert not problems, f"{qid}: " + "; ".join(problems)


@pytest.mark.parametrize("qid", ROWS_ONLY_IDS)
def test_rows_only_nonempty(qid, spark, sf_dir):
    fn, _ = REG[qid]
    assert fn(spark, sf_dir).count() > 0, f"{qid}: returned 0 rows"


def test_harness_flags_declared_type_drift(spark, duck):
    """The harness must reject results whose DECLARED types differ even when
    the values stringify identically (the driver's value hash is
    type-sensitive: decimal precision/scale, BIGINT vs HUGEINT)."""
    df = spark.range(1).selectExpr("CAST(42.50 AS DECIMAL(12,2)) AS v")
    ok = compare(df, duck, "SELECT CAST(42.50 AS DECIMAL(12,2)) AS v")
    assert not ok
    drift = compare(df, duck, "SELECT CAST(42.50 AS DECIMAL(38,2)) AS v")
    assert any("declared type differs" in p for p in drift)
    hugeint = compare(
        spark.range(1).selectExpr("CAST(7 AS BIGINT) AS v"),
        duck,
        "SELECT CAST(7 AS HUGEINT) AS v",
    )
    assert any("declared type differs" in p for p in hugeint)
