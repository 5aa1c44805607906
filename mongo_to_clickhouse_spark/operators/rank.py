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

Round 11 (optimization): the checkpoint barrier in ``_stable_parted``
exists only because ``repartitionByRange`` draws partition boundaries
from a RANDOM sample, so two consumers of the tagged relation could
disagree about ``__pid``. When the caller can name a NUMERIC expression
that is monotone non-decreasing in the sort order (``bucket_key``; pass
the negated column for a DESC primary), the boundaries are instead
collected ONCE on the driver (a percentile aggregate — control-plane:
at most ``n_partitions - 1`` scalars, the same payload
``repartitionByRange`` itself ships to the driver when it samples) and
baked into the plan as LITERALS. ``__pid`` then becomes a pure
deterministic expression, every consumer agrees by construction, and
the whole barrier disappears: no checkpoint write/read, no sampling
job, and ONE exchange instead of two (the legacy path range-exchanged
into the checkpoint and then hash-exchanged again for the partitioned
window). Heavy keys (a single value spanning multiple quantile widths —
Zipf frequency tables) are sub-split by ``bucket_tiebreak`` percentiles
so no window task inherits a corpus-sized tie run.
"""

from __future__ import annotations

from collections import Counter
from functools import reduce

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


def _literal_range_parted(
    df: DataFrame,
    bucket_key: Column,
    n: int,
    bucket_tiebreak: Column | None,
) -> DataFrame:
    """Tag ``__pid`` as a PURE EXPRESSION over literal quantile
    boundaries — the barrier-free replacement for ``_stable_parted``.

    ``bucket_key`` must be numeric, non-null, and monotone
    NON-DECREASING in the caller's total order (negate a DESC primary).
    Boundaries come from one ``percentile_approx`` aggregate collected
    on the driver (``first()`` — control-plane: ≤ n-1 scalars, exactly
    the payload repartitionByRange's own sampler collects). Ties on a
    boundary value all land in one bucket, which is rank-correct for
    ANY monotone assignment; a value spanning ≥2 quantile widths is
    sub-split by ``bucket_tiebreak`` percentiles (second tiny driver
    aggregate over just the heavy values) so Zipf heads cannot
    serialize a window task."""
    bounds = literal_bounds(
        df, {"k": (bucket_key, bucket_tiebreak)}, n
    )["k"]
    return df.withColumn(
        "__pid", _pid_expr(bounds, bucket_key, bucket_tiebreak)
    )


def literal_bounds(
    df: DataFrame,
    specs: dict[str, tuple[Column, Column | None]],
    n: int,
    extra_aggs: dict[str, Column] | None = None,
) -> dict:
    """Collect literal range-bucket boundaries for SEVERAL sort keys of
    the same relation in ONE driver action (a second one only when some
    key has heavy values AND a tiebreak to sub-split them by).

    ``specs``: name -> (bucket_key, bucket_tiebreak | None). Returns
    name -> (boundaries ascending, {heavy value -> tiebreak
    sub-boundaries}); when ``extra_aggs`` is given (name -> aggregate
    Column), their scalar results ride the SAME action and come back
    under the returned dict's ``"__extras__"`` key — callers fold their
    1-row lookups (horizon, total count) into this pass instead of
    paying another serial job (each driver action costs ~0.3-1 s of
    fixed scheduling/codegen latency regardless of data size, which is
    exactly what the old per-rank checkpoint barrier paid)."""
    if n < 2:
        # single-bucket degenerate case (spark.sql.shuffle.partitions=1
        # or num_partitions=1): percentile_approx over an EMPTY
        # probability array is an analysis error, and the legacy sampled
        # path simply put everything in one partition — mirror that with
        # empty boundary lists (⇒ _pid_expr yields lit(0)); extra_aggs
        # still need their one driver action.
        out: dict = {name: ([], {}) for name in specs}
        if extra_aggs:
            row = df.agg(
                *(acol.alias(f"__x_{a}") for a, acol in extra_aggs.items())
            ).first()
            out["__extras__"] = {a: row[f"__x_{a}"] for a in extra_aggs}
        return out
    probs = [i / n for i in range(1, n)]
    aggs = [
        F.percentile_approx(key, F.lit(probs), F.lit(10_000)).alias(
            f"__b_{name}"
        )
        for name, (key, _tb) in specs.items()
    ]
    for aname, acol in (extra_aggs or {}).items():
        aggs.append(acol.alias(f"__x_{aname}"))
    row = df.agg(*aggs).first()  # control-plane: ≤ |specs|·(n-1) scalars
    out: dict = {}
    heavy_aggs = []
    heavy_slots = []
    for name, (key, tb) in specs.items():
        bs = [b for b in (row[f"__b_{name}"] or []) if b is not None]
        mult = Counter(bs)
        out[name] = (sorted(mult), {})
        if tb is None:
            continue
        for v in sorted(mult):
            if mult[v] < 2:
                continue
            sprobs = [j / (mult[v] + 1) for j in range(1, mult[v] + 1)]
            heavy_aggs.append(
                F.percentile_approx(
                    F.when(key == F.lit(v), tb),
                    F.lit(sprobs),
                    F.lit(10_000),
                ).alias(f"__s_{len(heavy_slots)}")
            )
            heavy_slots.append((name, v))
    if heavy_aggs:
        # control-plane: one row of ≤ |heavy|·n sub-boundary scalars
        row2 = df.agg(*heavy_aggs).first()
        for i, (name, v) in enumerate(heavy_slots):
            out[name][1][v] = sorted(
                {t for t in (row2[f"__s_{i}"] or []) if t is not None}
            )
    if extra_aggs:
        out["__extras__"] = {
            aname: row[f"__x_{aname}"] for aname in extra_aggs
        }
    return out


def _pid_expr(
    bounds: tuple, bucket_key: Column, bucket_tiebreak: Column | None
) -> Column:
    """Pure deterministic bucket id over literal boundaries — monotone
    non-decreasing in (bucket_key, bucket_tiebreak)."""
    dedup, subs = bounds
    terms = []
    for v in dedup:
        tsub = subs.get(v) or []
        if tsub:
            sub = reduce(
                lambda a, b: a + b,
                [
                    F.when(bucket_tiebreak > F.lit(t), 1).otherwise(0)
                    for t in tsub
                ],
            )
            terms.append(
                F.when(bucket_key > F.lit(v), F.lit(len(tsub) + 1))
                .when(bucket_key == F.lit(v), sub)
                .otherwise(F.lit(0))
            )
        else:
            terms.append(F.when(bucket_key > F.lit(v), 1).otherwise(0))
    return reduce(lambda a, b: a + b, terms) if terms else F.lit(0)


def _parted(
    df: DataFrame,
    n: int,
    order_by: list[Column],
    bucket_key: Column | None,
    bucket_tiebreak: Column | None,
    bounds: tuple | None = None,
) -> DataFrame:
    if bounds is not None and bucket_key is not None:
        return df.withColumn(
            "__pid", _pid_expr(bounds, bucket_key, bucket_tiebreak)
        )
    if bucket_key is not None:
        return _literal_range_parted(df, bucket_key, n, bucket_tiebreak)
    return _stable_parted(df, n, order_by)


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
    bucket_key: Column | None = None,
    bucket_tiebreak: Column | None = None,
    bounds: tuple | None = None,
) -> DataFrame:
    """Append ``rank_col`` = 1-based global row_number under ``order_by``.

    ``order_by`` must be a TOTAL order (include a unique tiebreaker);
    otherwise ranks among ties depend on partitioning. Columns may carry
    ``.desc()`` — they are passed to both the range partitioner and the
    local window, so partition order and intra-partition order agree by
    construction.

    ``bucket_key`` (optional fast path, round 11): a numeric NON-NULL
    expression monotone non-decreasing in ``order_by`` (negate a DESC
    primary). Partitioning then uses literal quantile boundaries instead
    of the sampled range exchange, which removes the checkpoint barrier
    and one exchange — see ``_literal_range_parted``. ``bucket_tiebreak``
    (numeric, monotone within equal ``bucket_key``) enables heavy-value
    sub-splitting and should be supplied whenever the primary can carry
    corpus-scale tie runs.
    """
    spark = df.sparkSession
    n = num_partitions or _default_partitions(spark, df)
    parted = _parted(df, n, order_by, bucket_key, bucket_tiebreak, bounds)
    local = parted.withColumn(
        "__lrank",
        F.row_number().over(Window.partitionBy("__pid").orderBy(*order_by)),
    )
    counts = parted.groupBy("__pid").agg(F.count("*").alias("__cnt"))
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
    bucket_key: Column | None = None,
    bucket_tiebreak: Column | None = None,
    bounds: tuple | None = None,
) -> DataFrame:
    """Append ``out_col`` = running sum of ``value_col`` under ``order_by``
    (exclusive by default: the sum of all STRICTLY PRIOR rows — the form
    offset computations need). Same two-pass shape as
    ``distributed_global_rank``: range-partition, per-partition local
    running sum (partitioned window), partition subtotals -> triangular
    offsets, broadcast back. Equals the naive global running-sum window
    exactly whenever ``order_by`` is a total order. ``bucket_key`` /
    ``bucket_tiebreak`` select the barrier-free literal-bounds
    partitioner exactly as in ``distributed_global_rank``."""
    spark = df.sparkSession
    n = num_partitions or _default_partitions(spark, df)
    parted = _parted(df, n, order_by, bucket_key, bucket_tiebreak, bounds)
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
