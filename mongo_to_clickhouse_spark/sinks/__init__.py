from mongo_to_clickhouse_spark.sinks.dlq import (  # noqa: F401
    append_failed_batch,
    retry_failed_batches,
)
from mongo_to_clickhouse_spark.sinks.writers import dual_write_batch  # noqa: F401
