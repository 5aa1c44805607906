"""Regression: distributed_global_rank above the range-sampler capacity.

``repartitionByRange`` draws its boundaries from a random sample
(``rangeExchange.sampleSizePerPartition`` = 100 rows/partition). The
tagged ``__pid`` relation feeds two subtrees (local ranks and
per-partition counts); before the checkpoint in
operators/rank.py::_stable_parted, each subtree re-evaluated the
shuffle with a FRESH sample once the input exceeded the capacity —
the two disagreed about partition boundaries and global ranks silently
corrupted (duplicates/gaps, run-to-run nondeterminism; first observed
through corpus_perplexity_buckets at sf0.1: 5 000 rows × 8 partitions
produced a phantom 4th NTILE bucket). These inputs are sized well past
the sample capacity so the class cannot regress.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mongo_to_clickhouse_spark.operators.rank import (
    distributed_global_rank,
    distributed_prefix_sum,
)

_N = 20_000  # >> 100 rows/partition × 8 shuffle partitions


def test_global_rank_is_a_permutation_above_sample_capacity(spark):
    df = spark.range(_N).select(
        (F.col("id") * 2_654_435_761 % 1_000_003).alias("k"),
        F.col("id").alias("tie"),
    )
    for _trial in range(2):
        ranked = distributed_global_rank(
            df, [F.col("k"), F.col("tie")], rank_col="r"
        )
        agg = ranked.agg(
            F.count("*").alias("n"),
            F.countDistinct("r").alias("d"),
            F.min("r").alias("lo"),
            F.max("r").alias("hi"),
        ).collect()[0]
        assert (agg["n"], agg["d"], agg["lo"], agg["hi"]) == (
            _N,
            _N,
            1,
            _N,
        )


def test_prefix_sum_matches_rank_arithmetic(spark):
    # value 1 per row -> exclusive prefix sum == rank - 1 for every row
    df = spark.range(_N).select(
        (F.col("id") * 40_503 % 99_991).alias("k"),
        F.col("id").alias("tie"),
        F.lit(1).alias("one"),
    )
    summed = distributed_prefix_sum(
        df, [F.col("k"), F.col("tie")], "one", "psum"
    )
    ranked = distributed_global_rank(
        df, [F.col("k"), F.col("tie")], rank_col="r"
    )
    joined = summed.join(ranked, ["k", "tie"])
    bad = joined.filter(F.col("psum") != F.col("r") - 1).count()
    assert bad == 0
