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
