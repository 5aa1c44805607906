"""MongoDB source — production path for the reference's two read modes.

The reference tails a change stream (/root/reference/src/main.rs:320) and
runs filtered ``find`` cursors (historical_data/src/main.rs:362-365). On
Spark both map to the MongoDB Spark Connector v10+ (``format("mongodb")``),
which pushes aggregation pipelines down to mongod (the same $match
pushdown the reference builds by hand) and exposes the change stream as a
micro-batch streaming source with checkpointable offsets (replacing the
hand-rolled RocksDB resume tokens).

The connector jar is not in this container, so these builders raise a
clear error at call time unless the jar is on the classpath; everything
else in the engine consumes plain DataFrames and does not care which
source produced them (fixtures use parquet).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def _require_connector(spark: SparkSession) -> None:
    # NB: plain attribute access on spark._jvm returns a lazy JavaPackage
    # even for classes that don't exist — only Class.forName actually
    # proves the connector is on the classpath.
    try:
        spark._jvm.java.lang.Class.forName(
            "com.mongodb.spark.sql.connector.MongoTableProvider"
        )
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            "MongoDB Spark Connector not on the classpath; add "
            "org.mongodb.spark:mongo-spark-connector (v10+) via "
            "spark.jars.packages, or read fixtures with io.load_table"
        ) from exc


def range_pipeline(ts_field: str, lo: str, hi: str) -> str:
    """The server-side ``$match`` aggregation pipeline as JSON — the same
    ``doc!{"$match": {ts: {"$gte", "$lte"}}}`` the historical binary builds
    (historical_data/src/main.rs:349-365). Pure function so the pushdown
    shape is unit-testable without a connector jar or a live mongod."""
    return json.dumps(
        [{"$match": {ts_field: {"$gte": {"$date": lo}, "$lte": {"$date": hi}}}}]
    )


def batch_read_options(
    uri: str,
    database: str,
    collection: str,
    ts_field: str | None = None,
    ts_range: tuple[str, str] | None = None,
) -> dict[str, str]:
    """Connector options for a batch ``find`` scan."""
    opts = {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
    }
    if ts_field and ts_range:
        opts["aggregation.pipeline"] = range_pipeline(ts_field, *ts_range)
    return opts


def change_stream_options(uri: str, database: str, collection: str) -> dict[str, str]:
    """Connector options for the change-stream micro-batch source
    (full-document lookup, matching ``FullDocumentType::UpdateLookup``,
    /root/reference/src/main.rs:316-319)."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "change.stream.publish.full.document.only": "true",
    }


def read_collection(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    ts_field: str | None = None,
    ts_range: tuple[str, str] | None = None,
) -> DataFrame:
    """Batch scan with optional server-side timestamp-range pushdown — the
    historical binary's ``find({ts: {$gte, $lte}})``
    (historical_data/src/main.rs:349-365)."""
    _require_connector(spark)
    opts = batch_read_options(uri, database, collection, ts_field, ts_range)
    return spark.read.format("mongodb").options(**opts).load()


def read_change_stream(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
) -> DataFrame:
    """Change-stream micro-batch source (full-document lookup), the live
    binary's ``collection.watch`` (/root/reference/src/main.rs:313-360).
    Resume/checkpointing comes from the query's ``checkpointLocation``."""
    _require_connector(spark)
    opts = change_stream_options(uri, database, collection)
    return spark.readStream.format("mongodb").options(**opts).load()
