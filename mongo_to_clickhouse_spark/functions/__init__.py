from mongo_to_clickhouse_spark.functions.scalars import (  # noqa: F401
    email_localpart,
    objectid_hex,
    regex_escape_statement,
    sha256_anonymize,
    timestamp_format,
)
