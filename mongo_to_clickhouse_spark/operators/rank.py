"""Distributed global ranking without a single-partition window.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY forces every
row through ONE task — fine on a laptop, a serialization point at 100 TB
(a vocabulary- or corpus-sized partition). The scale-correct form is the
classic distributed sort-rank (the same decomposition as RDD
``zipWithIndex`` and the two-pass prefix sum in
queries/pipelineops.py::pipeline_pack_sequences):

1. range-partition by the sort key (skew-safe: equal-prefix runs are
   split across partitions by the tiebreaker columns),
2. per-partition ``row_number`` (parallel, partitioned window),
3. per-partition counts -> running offsets (a window over a
   partition-count-sized relation, i.e. ~dozens of rows),
4. broadcast the offsets back: global_rank = offset + local_rank.

The result is EXACTLY the global row_number whenever the sort key is
total (unique per row) — which the oracle checks verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _default_partitions(spark: SparkSession, df: DataFrame) -> int:
    """shuffle.partitions, degrading gracefully where the conf is
    non-numeric (e.g. "auto" on some managed platforms) — fall back to
    the source's current partition count rather than crashing."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        return max(1, int(raw))
    except (TypeError, ValueError):
        try:
            return max(1, df.rdd.getNumPartitions())
        except Exception:  # noqa: BLE001 — e.g. Connect, no RDD access
            return 200


def _stable_parted(df: DataFrame, n: int, order_by: list[Column]) -> DataFrame:
    """Range-partition + tag ``__pid`` — CHECKPOINTED.

    The barrier is load-bearing, not an optimization: the tagged
    relation is consumed by TWO subtrees (local ranks and per-partition
    counts/totals), and ``repartitionByRange`` derives its boundaries
    from a RANDOM sample (``rangeExchange.sampleSizePerPartition``, 100
    rows/partition) — once the input exceeds the sample capacity, two
    independent evaluations draw different samples, the two subtrees
    disagree about ``__pid``, and ranks silently corrupt (observed at
    5 000 rows × 8 partitions: duplicate/gapped global ranks,
    run-to-run nondeterminism). Materializing the tagged rows once
    makes both consumers read the SAME partitioning."""
    from mongo_to_clickhouse_spark.operators.materialize import barrier

    return barrier(
        df.repartitionByRange(n, *order_by).withColumn(
            "__pid", F.spark_partition_id()
        )
    )


def _partition_offsets(per_pid: DataFrame, value_col: str) -> DataFrame:
    """offset(p) = Σ value over partitions before p, as a triangular
    self-join over the partition-count-sized relation (n rows == shuffle
    partition count, not data size; n² pairs at n≈32 is free). A window
    would also be cheap here, but the join keeps the whole plan free of
    no-partition WindowExec nodes — so a log/plan grep for that
    scale-killer stays a real signal."""
    prior = per_pid.select(
        F.col("__pid").alias("__qid"), F.col(value_col).alias("__prior")
    )
    return (
        per_pid.join(prior, F.col("__qid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__prior"), F.lit(0)).alias("__off"))
    )


def distributed_global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = 1-based global row_number under ``order_by``.

    ``order_by`` must be a TOTAL order (include a unique tiebreaker);
    otherwise ranks among ties depend on partitioning. Columns may carry
    ``.desc()`` — they are passed to both the range partitioner and the
    local window, so partition order and intra-partition order agree by
    construction.
    """
    spark = df.sparkSession
    n = num_partitions or _default_partitions(spark, df)
    parted = _stable_parted(df, n, order_by)
    local = parted.withColumn(
        "__lrank",
        F.row_number().over(Window.partitionBy("__pid").orderBy(*order_by)),
    )
    counts = local.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    offsets = _partition_offsets(counts, "__cnt")
    return (
        local.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__lrank")).cast("bigint"))
        .drop("__pid", "__lrank", "__off")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str,
    exclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = running sum of ``value_col`` under ``order_by``
    (exclusive by default: the sum of all STRICTLY PRIOR rows — the form
    offset computations need). Same two-pass shape as
    ``distributed_global_rank``: range-partition, per-partition local
    running sum (partitioned window), partition subtotals -> triangular
    offsets, broadcast back. Equals the naive global running-sum window
    exactly whenever ``order_by`` is a total order."""
    spark = df.sparkSession
    n = num_partitions or _default_partitions(spark, df)
    parted = _stable_parted(df, n, order_by)
    hi = -1 if exclusive else Window.currentRow
    local = parted.withColumn(
        "__lsum",
        F.coalesce(
            F.sum(value_col).over(
                Window.partitionBy("__pid")
                .orderBy(*order_by)
                .rowsBetween(Window.unboundedPreceding, hi)
            ),
            F.lit(0),
        ),
    )
    totals = parted.groupBy("__pid").agg(F.sum(value_col).alias("__ptot"))
    offsets = _partition_offsets(totals, "__ptot")
    return (
        local.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lsum")).cast("bigint"))
        .drop("__pid", "__lsum", "__off")
    )
