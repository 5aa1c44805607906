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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parted = df.repartitionByRange(n, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = parted.withColumn(
        "__lrank",
        F.row_number().over(Window.partitionBy("__pid").orderBy(*order_by)),
    )
    # Running offsets over the partition-count-sized relation (n rows ==
    # shuffle partition count, not data size). Computed as a triangular
    # self-join (offset(p) = Σ counts of partitions before p) instead of a
    # global running-sum window: n² pairs at n≈32 is free, and it keeps
    # the whole plan free of no-partition WindowExec nodes — so a log
    # grep for that scale-killer stays meaningful.
    counts = local.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    prior = counts.select(
        F.col("__pid").alias("__qid"), F.col("__cnt").alias("__prior_cnt")
    )
    offsets = (
        counts.join(prior, F.col("__qid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__prior_cnt"), F.lit(0)).alias("__off"))
    )
    return (
        local.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__lrank")).cast("bigint"))
        .drop("__pid", "__lrank", "__off")
    )
