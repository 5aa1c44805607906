"""Stream-stream join correctness: with the whole source in one batch the
streaming inner join must produce exactly the batch join's result."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.io import load_table
from mongo_to_clickhouse_spark.queries.streamruntime import stream_stream_join


def test_stream_stream_join_matches_batch(spark, smoke_sf_dir):
    got = stream_stream_join(spark, smoke_sf_dir).count()

    ev = load_table(spark, smoke_sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").selectExpr(
        "event_id AS purchase_id", "user_id", "ts AS purchase_ts"
    )
    clicks = ev.filter(
        F.col("event_type").isin("click", "view", "signup", "error")
    ).selectExpr("event_id AS click_id", "user_id AS c_user", "ts AS click_ts")
    expected = (
        purchases.join(
            clicks,
            (purchases.user_id == clicks.c_user)
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("click_ts") <= F.col("purchase_ts")),
        )
    ).count()
    assert got == expected > 0
