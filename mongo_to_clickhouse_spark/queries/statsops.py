"""Statistical / sequence analytics: exact single-pass moments
(variance, stddev, correlation), argmax-by-struct aggregation, event
path-transition matrices, and full-frame value windows.

The reference has no statistical surface (its only aggregate is
``MAX(version) GROUP BY email``, src/main.rs:774); these are north-star
extensions a profiling / training-data pipeline needs over the fixtures.

Exactness notes (oracle parity): every moment is derived from *integer*
power sums (``l_quantity`` is an integral double → BIGINT, ``l_linenumber``
is INT), so n, Σx, Σx², Σxy are exact BIGINTs in both engines; the final
variance/stddev/corr is a single double expression over those exact
integers, evaluated in the same order on both sides, then ``round(…, 6)``
(half-up in both). The BIGINT products stay ≤ ~1.3e12 ≪ 2^53 at sf0.1 and
the only cross-term that could overflow (the product of the two variance
numerators inside corr's sqrt) is cast to double *before* multiplying on
both sides — one identical IEEE rounding each.

Scale notes: ``agg_stats_moments`` is the canonical single-pass trick —
all five moments come out of ONE partial-aggregated shuffle (map-side
combine on the power sums), where the naive mean-then-deviation form
needs two passes over 100 TB. ``agg_argmax_struct`` replaces the
row_number()-window argmax (full sort per group) with ``max(struct)`` —
again one partial-aggregated shuffle, no sort, no window state; ties
break on the struct's second field so it stays deterministic.
``events_path_transitions`` shuffles once by ``user_id`` for the lag
relation, then re-aggregates by the (from, to) pair — transition counts
are integers and the share joins a broadcast 1-row total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongo_to_clickhouse_spark.io import load_table


def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag sample variance/stddev of quantity and the
    quantity↔linenumber correlation, all from one pass of exact integer
    power sums (no built-in ``var_samp``/``corr`` — those accumulate
    doubles in partition order and would not hash-match the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    ln = F.col("l_linenumber").cast("long")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s_q"),
        F.sum(q * q).alias("s_qq"),
        F.sum(ln).alias("s_l"),
        F.sum(ln * ln).alias("s_ll"),
        F.sum(q * ln).alias("s_ql"),
    )
    n = F.col("n")
    var_num_q = n * F.col("s_qq") - F.col("s_q") * F.col("s_q")
    var_num_l = n * F.col("s_ll") - F.col("s_l") * F.col("s_l")
    cov_num = n * F.col("s_ql") - F.col("s_q") * F.col("s_l")
    denom = (n * (n - F.lit(1))).cast("double")
    var_q = var_num_q.cast("double") / denom
    return sums.select(
        "l_returnflag",
        n.alias("n"),
        F.col("s_q").alias("sum_qty"),
        F.round(var_q, 6).alias("var_qty"),
        F.round(F.sqrt(var_q), 6).alias("stddev_qty"),
        F.round(
            cov_num.cast("double")
            / F.sqrt(var_num_q.cast("double") * var_num_l.cast("double")),
            6,
        ).alias("corr_qty_line"),
    )


AGG_STATS_MOMENTS_SQL = """
    WITH sums AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(CAST(l_quantity AS BIGINT)) AS s_q,
               sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                   AS s_qq,
               sum(CAST(l_linenumber AS BIGINT)) AS s_l,
               sum(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT))
                   AS s_ll,
               sum(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT))
                   AS s_ql
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, CAST(s_q AS BIGINT) AS sum_qty,
           round(CAST(n * s_qq - s_q * s_q AS DOUBLE)
                 / CAST(n * (n - 1) AS DOUBLE), 6) AS var_qty,
           round(sqrt(CAST(n * s_qq - s_q * s_q AS DOUBLE)
                      / CAST(n * (n - 1) AS DOUBLE)), 6) AS stddev_qty,
           round(CAST(n * s_ql - s_q * s_l AS DOUBLE)
                 / sqrt(CAST(n * s_qq - s_q * s_q AS DOUBLE)
                        * CAST(n * s_ll - s_l * s_l AS DOUBLE)), 6)
               AS corr_qty_line
    FROM sums
"""


def agg_argmax_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmax/argmin per event type via ``max(struct)`` /
    ``min(struct)`` — the shuffle-minimal alternative to the
    row_number()-window pattern (`dedup_latest_version`): partial
    aggregation combines map-side, so no per-group sort ever happens."""
    ev = load_table(spark, sf_dir, "events")
    top = F.max(F.struct(F.col("value"), F.col("event_id"))).alias("top")
    bot = F.min(F.struct(F.col("value"), F.col("event_id"))).alias("bot")
    return (
        ev.groupBy("event_type")
        .agg(top, bot)
        .select(
            "event_type",
            F.col("top.value").alias("top_value"),
            F.col("top.event_id").alias("top_event_id"),
            F.col("bot.value").alias("min_value"),
            F.col("bot.event_id").alias("min_event_id"),
        )
    )


AGG_ARGMAX_STRUCT_SQL = """
    WITH ranked AS (
        SELECT event_type, value, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id DESC)
                   AS rn_top,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value ASC, event_id ASC) AS rn_bot
        FROM events
    )
    SELECT t.event_type,
           t.value AS top_value, t.event_id AS top_event_id,
           b.value AS min_value, b.event_id AS min_event_id
    FROM (SELECT * FROM ranked WHERE rn_top = 1) t
    JOIN (SELECT * FROM ranked WHERE rn_bot = 1) b USING (event_type)
"""


def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: (event_type → next event_type) counts and their share of
    all transitions. One shuffle by ``user_id`` for the lead() relation,
    one re-aggregation by the pair, broadcast 1-row total for the share."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count("*").alias("cnt"))
    )
    total = pairs.agg(F.sum("cnt").alias("total"))
    return (
        pairs.join(F.broadcast(total))
        .select(
            "from_type",
            "to_type",
            "cnt",
            F.round(F.lit(100) * F.col("cnt") / F.col("total"), 4).alias(
                "pct"
            ),
        )
    )


EVENTS_PATH_TRANSITIONS_SQL = """
    WITH pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    counted AS (
        SELECT from_type, to_type, count(*) AS cnt
        FROM pairs WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, cnt,
           round(100 * cnt / CAST((SELECT sum(cnt) FROM counted) AS DOUBLE),
                 4) AS pct
    FROM counted
"""


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-frame analytic windows per order: first/last/2nd ship date
    over the whole partition (explicit unbounded ROWS frame — the default
    frame would silently truncate ``last_value`` at CURRENT ROW) plus
    ``percent_rank`` by line number.

    The fixture's lineitem carries duplicate ``(l_orderkey,
    l_linenumber)`` pairs, so the window order is extended to a TOTAL
    key — otherwise first/last/nth tie-break differently per engine."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_partkey", "l_suppkey"
    )
    order = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_shipdate", "l_partkey", "l_suppkey"
    )
    full = order.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    day = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return li.select(
        "l_orderkey",
        "l_linenumber",
        day(F.first_value("l_shipdate").over(full)).alias("first_ship"),
        day(F.last_value("l_shipdate").over(full)).alias("last_ship"),
        day(F.nth_value("l_shipdate", 2).over(full)).alias("second_ship"),
        F.round(F.percent_rank().over(order), 6).alias("pos_rank"),
    )


WINDOW_FIRST_LAST_SQL = """
    SELECT l_orderkey, l_linenumber,
           strftime(first_value(l_shipdate) OVER f, '%Y-%m-%d') AS first_ship,
           strftime(last_value(l_shipdate) OVER f, '%Y-%m-%d') AS last_ship,
           strftime(nth_value(l_shipdate, 2) OVER f, '%Y-%m-%d')
               AS second_ship,
           round(percent_rank() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber, l_shipdate,
                                               l_partkey, l_suppkey),
                 6) AS pos_rank
    FROM lineitem
    WINDOW f AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_shipdate, l_partkey, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


ZSCORE_FLAG = 3.0


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier detection: standardize each event's
    value against its type's mean/stddev and flag |z| > 3 — the metric-
    anomaly tier of a monitoring pipeline (the reference's health checks
    are process-level only, src/main.rs:745-805; this is the data-level
    analogue).

    Exactness: group moments come from integer milli-unit power sums
    (round(value·10³) as BIGINT — exact sums, order-independent), then
    one identical double expression per row on both engines.  mi² sums
    stay < 2^53 through ~10^9 rows per type at this value range; beyond
    that, widen the power sums to DECIMAL(38,0) (int64→double and
    decimal→double casts are both IEEE round-to-nearest, so parity
    holds).

    Scale posture: one partial-aggregated shuffle on event_type (5 keys
    → a broadcastable stats dim), then a broadcast join back onto the
    scan — the per-row standardization is a narrow map; no window over
    the full fact table."""
    ev = load_table(spark, sf_dir, "events")
    mi = F.round(F.col("value") * 1000).cast("bigint")
    stats = (
        ev.select("event_type", mi.alias("mi"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("mi").alias("s"),
            F.sum(F.col("mi") * F.col("mi")).alias("ss"),
        )
        .select(
            "event_type",
            "n",
            (F.col("s").cast("double") / F.col("n")).alias("mean_milli"),
            F.sqrt(
                (
                    F.col("ss").cast("double")
                    - F.col("s").cast("double")
                    * F.col("s").cast("double")
                    / F.col("n")
                )
                / (F.col("n") - 1)
            ).alias("std_milli"),
        )
    )
    z = (mi.cast("double") - F.col("mean_milli")) / F.col("std_milli")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).alias("zscore"),
            (F.abs(z) > ZSCORE_FLAG).alias("is_anomaly"),
        )
    )


EVENTS_ANOMALY_ZSCORE_SQL = f"""
    WITH milli AS (
        SELECT event_id, event_type, value,
               CAST(round(value * 1000) AS BIGINT) AS mi
        FROM events
    ),
    stats AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(mi) AS BIGINT) AS s,
               CAST(SUM(mi * mi) AS BIGINT) AS ss
        FROM milli GROUP BY event_type
    ),
    dim AS (
        SELECT event_type, n,
               CAST(s AS DOUBLE) / n AS mean_milli,
               sqrt((CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                    / (n - 1)) AS std_milli
        FROM stats
    )
    SELECT m.event_id, m.event_type, m.value,
           round((CAST(m.mi AS DOUBLE) - d.mean_milli) / d.std_milli, 4)
               AS zscore,
           abs((CAST(m.mi AS DOUBLE) - d.mean_milli) / d.std_milli)
               > {ZSCORE_FLAG} AS is_anomaly
    FROM milli m JOIN dim d ON m.event_type = d.event_type
"""


def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal event type per user (MODE() WITHIN GROUP semantics with a
    deterministic alphabetical tie-break): two partial-aggregated
    groupBys — (user, type) counts, then a user-partitioned rank-1 pick.
    Both shuffles keyed by the uniform user id; the window is
    PARTITIONED (WindowGroupLimit prunes to the per-user top row before
    the exchange at scale)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_event"),
            F.col("cnt").alias("n_events"),
        )
        .orderBy("user_id")
    )


AGG_MODE_PER_GROUP_SQL = """
    SELECT user_id, event_type AS modal_event, cnt AS n_events FROM (
        SELECT user_id, event_type, cnt,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type) AS rn
        FROM (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM events GROUP BY user_id, event_type)
    ) WHERE rn = 1
    ORDER BY user_id
"""


QUERIES: dict[str, tuple] = {
    "agg_mode_per_group": (agg_mode_per_group, AGG_MODE_PER_GROUP_SQL),
    "agg_stats_moments": (agg_stats_moments, AGG_STATS_MOMENTS_SQL),
    "events_anomaly_zscore": (events_anomaly_zscore, EVENTS_ANOMALY_ZSCORE_SQL),
    "agg_argmax_struct": (agg_argmax_struct, AGG_ARGMAX_STRUCT_SQL),
    "events_path_transitions": (
        events_path_transitions,
        EVENTS_PATH_TRANSITIONS_SQL,
    ),
    "window_first_last": (window_first_last, WINDOW_FIRST_LAST_SQL),
}
