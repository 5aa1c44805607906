"""ClickHouse sink/source over JDBC — production path for the reference's
bulk INSERT (/root/reference/src/main.rs:890-913) and dimension query
(src/main.rs:771-793).

The ClickHouse JDBC driver is not in this container; call-time gated like
the Mongo connector. Batch inserts map to ``df.write.jdbc`` with
``batchsize`` tuned to the reference's max batch (10k rows,
src/main.rs:39); the opt-out dimension query maps to a pushdown subquery
read. No string-spliced SQL anywhere — the reference's escaping hazard
(src/main.rs:890-895) does not exist on this path by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def _props(user: str | None, password: str | None) -> dict[str, str]:
    props = {"driver": DRIVER, "batchsize": "10000"}
    if user:
        props["user"] = user
    if password:
        props["password"] = password
    return props


def write_table(
    df: DataFrame,
    jdbc_url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
) -> None:
    """Bulk append — the reference's chunked INSERT path; Spark handles
    chunking (batchsize) and task retries."""
    df.write.mode("append").jdbc(jdbc_url, table, properties=_props(user, password))


def read_query(
    spark: SparkSession,
    jdbc_url: str,
    query: str,
    user: str | None = None,
    password: str | None = None,
) -> DataFrame:
    """Pushdown subquery read — used for the opt-out dimension
    (``SELECT email, hashed_moodle_id FROM moodle_ids WHERE (email, version)
    IN (...)``, src/main.rs:774)."""
    return spark.read.jdbc(
        jdbc_url, f"({query}) AS dim", properties=_props(user, password)
    )
