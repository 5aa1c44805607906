"""Query registry: every declared operator ID from SURVEY §2 maps to a
``(spark_fn, oracle_sql | None)`` pair. ``__spark_entry__.py`` re-exports
this as the driver contract."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mongo_to_clickhouse_spark.queries import (
    analytics,
    analytics_ext,
    bizops,
    cdcops,
    clickhouseops,
    core,
    corpusops,
    dedupops,
    evalops,
    graphops,
    joinops,
    pipelineops,
    relational_ext,
    sampleops,
    sketchops,
    statsops,
    streamops,
    streamruntime,
    textops,
    tokenizerops,
    tpch,
    tpch_ext,
    vectorops,
    zorderops,
)

_MODULES = [
    analytics,
    analytics_ext,
    bizops,
    cdcops,
    clickhouseops,
    core,
    corpusops,
    dedupops,
    evalops,
    graphops,
    joinops,
    pipelineops,
    relational_ext,
    sampleops,
    sketchops,
    statsops,
    streamops,
    streamruntime,
    textops,
    tokenizerops,
    tpch,
    tpch_ext,
    vectorops,
    zorderops,
]


def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    merged: dict[str, tuple] = {}
    for mod in _MODULES:
        for key, pair in mod.QUERIES.items():
            if key in merged:
                raise KeyError(f"duplicate query id {key!r}")
            merged[key] = pair
    return merged


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: fn for k, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {k: sql for k, (_fn, sql) in registry().items() if sql is not None}
