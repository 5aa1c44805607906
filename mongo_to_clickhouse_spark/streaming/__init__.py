from mongo_to_clickhouse_spark.streaming.pipeline import (  # noqa: F401
    run_tenant_stream,
    run_multi_tenant,
    streaming_statements,
)
