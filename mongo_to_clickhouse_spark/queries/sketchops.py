"""Sketch-backed exact operators: plans that use a bounded-memory sketch
for CANDIDATE PRUNING but still return exactly the plain-SQL answer —
the pattern that keeps frequency queries off the full-cardinality
shuffle path at 100 TB while staying DuckDB-oracle-checkable.

See operators/heavyhitters.py for the Misra-Gries kernel and the
no-false-negative argument that makes the oracle comparison exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.io import load_table
from mongo_to_clickhouse_spark.operators.heavyhitters import misra_gries_candidates
from mongo_to_clickhouse_spark.operators.materialize import barrier

# Report tokens with frequency >= 1/SUPPORT_DEN of the stream. The MG
# no-false-negative guarantee needs capacity >= SUPPORT_DEN; headroom
# above that only shrinks the false-positive set the recount discards.
SUPPORT_DEN = 50
MG_CAPACITY = 64


def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact support-threshold heavy hitters over document tokens via
    Misra-Gries candidates + broadcast-semi-join recount.

    Plan shape (the part that matters at scale): the token stream is
    materialized ONCE (explode barrier, same discipline as dedupops),
    the MG pass is a narrow mapInPandas (no shuffle, O(capacity) state
    per partition), and the only exchange keyed by token carries
    candidate keys alone — the full vocabulary never shuffles. The
    HAVING filter recomputes support exactly, so false positives from
    the sketch tier are dropped and the result equals the plain
    GROUP BY/HAVING the oracle runs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = barrier(docs.select(F.explode(F.split("text", " ")).alias("tok")))
    cands = misra_gries_candidates(toks, "tok", MG_CAPACITY)
    total = toks.agg(F.count("*").cast("bigint").alias("total"))
    return (
        toks.join(F.broadcast(cands), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * SUPPORT_DEN >= F.col("total"))
        .select("tok", "cnt")
        .orderBy("tok")
    )


AGG_HEAVY_HITTERS_SQL = f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks)
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks, tot
    GROUP BY tok, total
    HAVING CAST(COUNT(*) AS BIGINT) * {SUPPORT_DEN} >= total
    ORDER BY tok
"""


QUERIES: dict[str, tuple] = {
    "agg_heavy_hitters": (agg_heavy_hitters, AGG_HEAVY_HITTERS_SQL),
}
