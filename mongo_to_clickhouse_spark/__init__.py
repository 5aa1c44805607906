"""PySpark-native analytics engine with the query/data-processing
capabilities of the ``isankadn/mongo-to-clickhouse`` reference pipeline,
re-expressed Spark-first (DataFrame / SQL / Catalyst / Structured
Streaming) and extended with large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``   — SparkSession factory tuned for the driver harness.
- ``io``        — fixture parquet loaders (stand-ins for Mongo/ClickHouse).
- ``config``    — tenant config model (mirrors reference ``AppConfig``).
- ``functions`` — scalar/text/vector column expression builders.
- ``operators`` — relational + dedup + similarity + multimodal operators.
- ``plans``     — composed pipelines (flagship CDC transform, backfill).
- ``streaming`` — Structured Streaming pipeline, DLQ, multi-tenant fanout.
- ``sinks``     — dual-table split writer, dead-letter queue.
"""

__version__ = "0.1.0"
