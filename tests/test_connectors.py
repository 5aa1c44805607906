"""Connector-logic tests that need no connector jar and no live server:
pipeline-JSON construction, URI/option assembly, and the classpath guard —
the parts of the production Mongo/ClickHouse paths that can be verified in
this sandbox (VERDICT.md round 1, 'What's missing' item 1)."""

from __future__ import annotations

import json

import pytest

from mongo_to_clickhouse_spark.sources.clickhouse import _props
from mongo_to_clickhouse_spark.sources.mongo import (
    _require_connector,
    batch_read_options,
    change_stream_options,
    range_pipeline,
)

URI = "mongodb://user:pw@host1:27017,host2:27017/?replicaSet=rs0"


def test_range_pipeline_matches_reference_match_shape():
    """Mirrors the historical binary's find filter
    (historical_data/src/main.rs:349-365): one $match stage, inclusive
    $gte/$lte on the timestamp field, extended-JSON dates."""
    got = json.loads(range_pipeline("timestamp", "2024-01-03T00:00:00Z",
                                    "2024-01-27T00:00:00Z"))
    assert got == [
        {
            "$match": {
                "timestamp": {
                    "$gte": {"$date": "2024-01-03T00:00:00Z"},
                    "$lte": {"$date": "2024-01-27T00:00:00Z"},
                }
            }
        }
    ]


def test_batch_read_options_assembly():
    opts = batch_read_options(URI, "moodle", "statements")
    assert opts == {
        "connection.uri": URI,
        "database": "moodle",
        "collection": "statements",
    }
    ranged = batch_read_options(
        URI, "moodle", "statements", "ts", ("2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z")
    )
    stages = json.loads(ranged["aggregation.pipeline"])
    assert len(stages) == 1 and "$match" in stages[0]
    # no pipeline unless BOTH field and range are given
    assert "aggregation.pipeline" not in batch_read_options(
        URI, "moodle", "statements", "ts", None
    )
    assert "aggregation.pipeline" not in batch_read_options(
        URI, "moodle", "statements", None, ("a", "b")
    )


def test_change_stream_options_full_document():
    """Full-document lookup matches the live binary's
    FullDocumentType::UpdateLookup (src/main.rs:316-319)."""
    opts = change_stream_options(URI, "moodle", "statements")
    assert opts["change.stream.publish.full.document.only"] == "true"
    assert opts["connection.uri"] == URI
    assert opts["database"] == "moodle"
    assert opts["collection"] == "statements"


def test_require_connector_raises_actionable_error(spark):
    with pytest.raises(RuntimeError, match="mongo-spark-connector"):
        _require_connector(spark)


def test_clickhouse_jdbc_props():
    """Driver class + the reference's 10k max batch (src/main.rs:39);
    credentials only when provided."""
    base = _props(None, None)
    assert base == {
        "driver": "com.clickhouse.jdbc.ClickHouseDriver",
        "batchsize": "10000",
    }
    full = _props("u", "p")
    assert full["user"] == "u" and full["password"] == "p"
