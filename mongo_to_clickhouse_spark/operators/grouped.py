"""Grouped-map Pandas operator (``applyInPandas``): per-group robust
statistics computed in Arrow-batched pandas.

This is the escape hatch for per-group logic the built-ins can't express
(model scoring, per-group curve fitting, merge_asof, ...). The example
kernel computes median / MAD — deliberately chosen because median is
exactly order-insensitive (sort-based), so the result is oracle-checkable
against DuckDB's quantile_cont, proving the Arrow round-trip preserves
values bit-for-bit.

Scale notes: one shuffle on the group key; each group must fit in one
executor's memory as a pandas DataFrame — fine for per-user/per-entity
groups, NOT for whole-table groups (use built-in aggregates there).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id bigint, n bigint, median_value double, mad double"
)


def _robust_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"]
    med = float(v.median())
    mad = float((v - med).abs().median())
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n": [len(pdf)],
            "median_value": [round(med, 6)],
            "mad": [round(mad, 6)],
        }
    )


def grouped_robust_stats(events: DataFrame) -> DataFrame:
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandas(_robust_stats, OUTPUT_SCHEMA)
    )
