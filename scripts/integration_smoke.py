"""Gated live-connector integration lane: Mongo change stream →
anonymize/route transform → ClickHouse JDBC, run for real WHEN the
environment provides jars + servers, and reported SKIPPED (exit 77,
the autotools convention) — never silently green — otherwise.

What it proves that the in-container suites cannot (they have no
connector jars and no network): the reference's actual serving loop —
``collection.watch`` (/root/reference/src/main.rs:313-360) feeding
anonymized dual-table INSERTs (src/main.rs:874-913) — executes
end-to-end through sources/mongo.py, plans/pipeline.py, and
sources/clickhouse.py against live servers.

Environment contract (see docs/INTEGRATION.md for the docker-compose
recipe):

  SPARK_GRAFT_MONGO_URI        e.g. mongodb://localhost:27017
                               (must be a replica set — change streams
                               require one; the compose file handles it)
  SPARK_GRAFT_CLICKHOUSE_URL   e.g. jdbc:clickhouse://localhost:8123/default
  SPARK_GRAFT_IT_JARS          optional spark.jars.packages coordinates;
                               default pins mongo-spark-connector +
                               clickhouse-jdbc (needs network on first run)

Exit codes: 0 = PASS, 77 = SKIPPED (environment not present, with the
reason printed), 1 = FAIL (environment present but the path broke).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP = 77

DEFAULT_PACKAGES = ",".join(
    [
        "org.mongodb.spark:mongo-spark-connector_2.13:10.4.1",
        "com.clickhouse:clickhouse-jdbc:0.6.5",
    ]
)


def skip(reason: str) -> "NoReturn":  # noqa: F821
    print(f"SKIPPED: {reason}")
    sys.exit(SKIP)


def main() -> int:
    mongo_uri = os.environ.get("SPARK_GRAFT_MONGO_URI")
    ch_url = os.environ.get("SPARK_GRAFT_CLICKHOUSE_URL")
    if not mongo_uri or not ch_url:
        skip(
            "SPARK_GRAFT_MONGO_URI / SPARK_GRAFT_CLICKHOUSE_URL not set "
            "(no live servers declared; see docs/INTEGRATION.md)"
        )

    from pyspark.sql import SparkSession

    packages = os.environ.get("SPARK_GRAFT_IT_JARS", DEFAULT_PACKAGES)
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("integration-smoke")
        .config("spark.jars.packages", packages)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )

    # jar presence is proven by Class.forName (lazy JavaPackage attribute
    # access lies) — the same gate the source builders use
    for cls, what in [
        ("com.mongodb.spark.sql.connector.MongoTableProvider",
         "MongoDB Spark Connector"),
        ("com.clickhouse.jdbc.ClickHouseDriver", "ClickHouse JDBC driver"),
    ]:
        try:
            spark._jvm.java.lang.Class.forName(cls)
        except Exception:  # noqa: BLE001
            skip(f"{what} not on the classpath ({cls})")

    import pymongo  # optional dep, only needed by this lane

    from mongo_to_clickhouse_spark.plans.pipeline import (
        anonymized_statements,
        statements_from_events,
    )
    from mongo_to_clickhouse_spark.sources.clickhouse import (
        read_query,
        write_table,
    )
    from mongo_to_clickhouse_spark.sources.mongo import read_change_stream

    run_id = uuid.uuid4().hex[:8]
    db, coll = "it_smoke", f"events_{run_id}"
    ch_table = f"it_statements_{run_id}"

    client = pymongo.MongoClient(mongo_uri, serverSelectionTimeoutMS=5000)
    try:
        client.admin.command("ping")
    except Exception as exc:  # noqa: BLE001
        skip(f"mongod not reachable at {mongo_uri}: {exc}")

    # ---- seed + tail the change stream ---------------------------------
    import datetime as dt

    stream = read_change_stream(spark, mongo_uri, db, coll)
    ckpt = f"/tmp/it-smoke-ckpt-{run_id}"
    rows_seen: list[int] = []

    def handle(batch_df, batch_id):  # noqa: ARG001
        events = batch_df.selectExpr(
            "fullDocument.event_id AS event_id",
            "fullDocument.ts AS ts",
            "fullDocument.user_id AS user_id",
            "fullDocument.event_type AS event_type",
            "fullDocument.props AS props",
        )
        customer = batch_df.sparkSession.createDataFrame(
            [(i, f"customer#{i:09d}") for i in range(8)],
            "c_custkey LONG, c_name STRING",
        )
        out = anonymized_statements(
            statements_from_events(events, customer)
        )
        # persist so the sink write and the progress count evaluate the
        # change-stream batch ONCE — a second evaluation could diverge
        # from what actually landed in ClickHouse (ADVICE r9)
        out = out.persist()
        try:
            write_table(out, ch_url, ch_table)
            rows_seen.append(out.count())
        finally:
            out.unpersist()

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .start()
    )
    n_docs = 20
    now = dt.datetime.now(dt.timezone.utc)
    client[db][coll].insert_many(
        [
            {
                "event_id": f"{i:024x}",
                "ts": now,
                "user_id": i % 8,
                "event_type": "completed",
                "props": json.dumps({"score": i}),
            }
            for i in range(n_docs)
        ]
    )
    deadline = time.time() + 60
    try:
        while time.time() < deadline and sum(rows_seen) < n_docs:
            time.sleep(1)
    finally:
        q.stop()

    got = read_query(
        spark, ch_url, f"SELECT COUNT(*) AS n FROM {ch_table}"
    ).collect()[0]["n"]
    client[db][coll].drop()
    shutil.rmtree(ckpt, ignore_errors=True)  # ADVICE r9: don't leak /tmp
    print(f"change-stream docs: {n_docs}; transformed rows landed: {got}")
    if int(got) != n_docs:
        print("FAIL: row count mismatch")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
