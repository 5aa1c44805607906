"""Backfill + multimodal query entries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mongo_to_clickhouse_spark.io import load_table
from mongo_to_clickhouse_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    media_table,
)
from mongo_to_clickhouse_spark.plans.backfill import backfill_output
from mongo_to_clickhouse_spark.queries.core import ACTIVE_DIM_SQL, STMTS_SQL

BF_LO = "2024-01-03 00:00:00"
BF_HI = "2024-01-27 00:00:00"


def backfill_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The historical binary's whole dataflow as a relation: pushed-down
    $gte/$lte range scan → anonymize → opt-out anti-join
    (historical_data/src/main.rs:326-546)."""
    return backfill_output(spark, sf_dir, BF_LO, BF_HI)


BACKFILL_TIMERANGE_SQL = f"""
    WITH anon AS (
        SELECT printf('%024x', event_id) AS id,
               to_json(struct_pack(
                   actor := struct_pack(account := struct_pack(name := hashed_value)),
                   verb := event_type,
                   object := props)) AS statement,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS "timestamp",
               hashed_value
        FROM (
            SELECT s.*,
                   sha256('fixture-salt' || 't1' || split_part(actor_name, '@', 1))
                       AS hashed_value
            FROM ({STMTS_SQL}) s
            WHERE ts BETWEEN TIMESTAMP '{BF_LO}' AND TIMESTAMP '{BF_HI}'
              AND event_id IS NOT NULL AND props IS NOT NULL
              AND actor_name IS NOT NULL
              AND length(split_part(actor_name, '@', 1)) > 0
        )
    )
    SELECT a.* FROM anon a
    ANTI JOIN ({ACTIVE_DIM_SQL}) d ON a.hashed_value = d.hashed_moodle_id
"""


def multimodal_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: payload bytes + typed metadata (format,
    byte length, content digest) — all JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    return media_table(docs).drop("payload")


MULTIMODAL_META_EXTRACT_SQL = """
    SELECT doc_id,
           ['png', 'jpeg', 'webp'][CAST(doc_id % 3 AS INT) + 1] AS media_format,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS content_sha256
    FROM documents
"""


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched Pandas-UDF decode (stubbed deterministic decoder —
    no image libs in this container; the Spark plumbing is real)."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(media_table(docs))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → frame explosion → stride sampling (JVM-side explode)."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(decode_media(media_table(docs)), stride=2)


def pandas_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-user median/MAD in Arrow-batched
    pandas, oracle-checked against DuckDB's quantile_cont (median is
    order-insensitive, so the Python round-trip must match exactly)."""
    from mongo_to_clickhouse_spark.operators.grouped import grouped_robust_stats

    return grouped_robust_stats(load_table(spark, sf_dir, "events"))


PANDAS_GROUPED_STATS_SQL = """
    SELECT user_id, COUNT(*) AS n,
           round(median(value), 6) AS median_value,
           round(median(abs(value - med)), 6) AS mad
    FROM (
        SELECT user_id, value,
               median(value) OVER (PARTITION BY user_id) AS med
        FROM events
    )
    GROUP BY user_id
"""


QUERIES: dict[str, tuple] = {
    "backfill_timerange": (backfill_timerange, BACKFILL_TIMERANGE_SQL),
    "pandas_grouped_stats": (pandas_grouped_stats, PANDAS_GROUPED_STATS_SQL),
    "multimodal_meta_extract": (multimodal_meta_extract, MULTIMODAL_META_EXTRACT_SQL),
    "multimodal_decode_stub": (multimodal_decode_stub, None),
    "multimodal_frame_sample": (multimodal_frame_sample, None),
}
