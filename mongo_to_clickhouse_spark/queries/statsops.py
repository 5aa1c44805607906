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


def _regr_sql(engine: str) -> str:
    """Per-group OLS (the SQL REGR_SLOPE/REGR_INTERCEPT/REGR_R2 family)
    of extendedprice-cents on quantity, computed from ONE pass of exact
    integer power sums — the built-in REGR_* aggregates accumulate
    doubles in partition order and would not hash-match across engines;
    the closed forms below do all algebra on exact BIGINTs and perform
    three final double divisions, rounded 6 dp."""
    del engine  # identical text both engines
    return """
        WITH sums AS (
            -- DECIMAL(38,0) accumulators: the closed forms multiply
            -- whole sums together (n·syy, sy·sy ≈ 5e22 at sf0.01 —
            -- far past BIGINT), and cents² per-row terms overrun BIGINT
            -- SUM at ~1e6 rows; decimal keeps every term exact in both
            -- engines (the EngineTuning.exact_sum_decimal recipe,
            -- unconditional here because the algebra ALWAYS overflows)
            SELECT l_returnflag,
                   CAST(COUNT(*) AS DECIMAL(38, 0)) AS n,
                   SUM(CAST(l_quantity AS DECIMAL(38, 0))) AS sx,
                   SUM(CAST(CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)
                            AS DECIMAL(38, 0))) AS sxx,
                   SUM(CAST(round(l_extendedprice * 100)
                            AS DECIMAL(38, 0))) AS sy,
                   SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round(l_extendedprice * 100) AS BIGINT)
                            AS DECIMAL(38, 0))) AS syy,
                   SUM(CAST(CAST(l_quantity AS BIGINT)
                            * CAST(round(l_extendedprice * 100) AS BIGINT)
                            AS DECIMAL(38, 0))) AS sxy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6)
                   AS slope_cents_per_qty,
               round((CAST(sy AS DOUBLE)
                      - CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4)
                   AS intercept_cents,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     * CAST(n * sxy - sx * sy AS DOUBLE)
                     / (CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
        FROM sums ORDER BY l_returnflag
    """


def agg_regr_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL REGR_* surface as exact-sum closed forms — see _regr_sql.
    Scale posture: one partial-aggregated groupBy; nothing else."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_regr_sql("spark"))


AGG_REGR_OLS_SQL = _regr_sql("duck")


def _cusum_sql(engine: str) -> str:
    """CUSUM change-point scan per event_type: daily counts, cumulative
    sum of deviations from the per-type mean (exact integers: deviation
    is n·days_total − total, i.e. the comparison is scaled by the day
    count so no division happens before the flag), and the max-|CUSUM|
    day reported as the candidate change point. Windows run over the
    per-type DAILY ROLLUP (bounded), partitioned by type."""
    intdiv = "DIV" if engine == "spark" else "//"
    fmt = (
        "date_format(date_trunc('day', ts), 'yyyy-MM-dd')"
        if engine == "spark"
        else "strftime(date_trunc('day', ts), '%Y-%m-%d')"
    )
    return f"""
        WITH daily AS (
            SELECT event_type, {fmt} AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, {fmt}
        ),
        stats AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(n) AS BIGINT) AS total
            FROM daily GROUP BY event_type
        ),
        cus AS (
            SELECT d.event_type, d.day,
                   SUM(d.n * s.n_days - s.total) OVER (
                       PARTITION BY d.event_type ORDER BY d.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cusum_scaled
            FROM daily d JOIN stats s ON d.event_type = s.event_type
        ),
        ranked AS (
            SELECT event_type, day, cusum_scaled,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY ABS(cusum_scaled) DESC, day) AS rk
            FROM cus
        )
        SELECT r.event_type, r.day AS change_point_day,
               CAST(r.cusum_scaled AS BIGINT) AS cusum_scaled,
               CAST((ABS(r.cusum_scaled) * 1000)
                    {intdiv} (s.total * s.n_days) AS BIGINT)
                   AS cusum_rel_milli
        FROM ranked r JOIN stats s ON r.event_type = s.event_type
        WHERE r.rk = 1
        ORDER BY r.event_type
    """


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point candidate per event type — see _cusum_sql."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_cusum_sql("spark"))


EVENTS_CUSUM_CHANGEPOINT_SQL = _cusum_sql("duck")


# ---------------------------------------------------------------------------
# sample_ks_drift — two-sample Kolmogorov–Smirnov distribution drift
# ---------------------------------------------------------------------------

KS_BIN_INV = 10       # ECDF grid: 0.1-wide value bins
KS_CRIT_COEFF = 1.358  # c(alpha = 0.05) for the two-sample KS bound


def _ks_body(events_rel: str) -> str:
    """Engine-shared two-sample KS: split A/B by event_id parity, build
    both ECDFs on a quantized value grid, take the max gap. The grid
    makes the statistic a deterministic integer (exact cross-multiplied
    counts, floor to ppm) AND bounds the sort: the cumulative window
    runs over ≤ range·{KS_BIN_INV} bins, not over every row — the same
    trick the histogram/quantile tier uses to keep a global order
    scalable. Grid-KS lower-bounds exact KS (gaps inside a bin are
    invisible), which is the standard production trade."""
    return f"""
        WITH pts AS (
            SELECT CAST(floor(value * {KS_BIN_INV}) AS BIGINT) AS bin,
                   CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS a
            FROM {events_rel} WHERE value IS NOT NULL
        ),
        binned AS (
            SELECT bin,
                   CAST(SUM(a) AS BIGINT) AS ca_i,
                   CAST(SUM(1 - a) AS BIGINT) AS cb_i
            FROM pts GROUP BY bin
        ),
        totals AS (
            SELECT CAST(SUM(ca_i) AS BIGINT) AS na,
                   CAST(SUM(cb_i) AS BIGINT) AS nb
            FROM binned
        ),
        ecdf AS (
            SELECT SUM(ca_i) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS ca,
                   SUM(cb_i) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cb
            FROM binned
        ),
        stat AS (
            SELECT MAX(CAST(floor(ABS(ca * nb - cb * na) * 1e6
                                  / CAST(na * nb AS DOUBLE)) AS BIGINT))
                       AS ks_ppm
            FROM ecdf CROSS JOIN totals
        )
        SELECT na AS n_a, nb AS n_b, ks_ppm,
               CAST(round({KS_CRIT_COEFF}
                    * sqrt((na + nb) / CAST(na * nb AS DOUBLE)) * 1e6)
                    AS BIGINT) AS crit_ppm,
               ks_ppm > CAST(round({KS_CRIT_COEFF}
                    * sqrt((na + nb) / CAST(na * nb AS DOUBLE)) * 1e6)
                    AS BIGINT) AS drift_detected
        FROM stat CROSS JOIN totals
    """


def sample_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test between the A/B halves
    of the event stream (the train-vs-eval / yesterday-vs-today
    distribution check a data-validation stage runs before training):
    KS statistic over a quantized value grid, compared to the
    alpha=0.05 critical bound.

    Exactness: counts are exact integers; the statistic is an exact
    cross-multiplication floored to ppm; the only floats are one
    correctly-rounded sqrt and IEEE double divisions below 2^53 — both
    engines agree bit-for-bit (see _ks_body for the floor-vs-round cast
    pin).

    Scale posture: one scan + one bin groupBy (bounded keys) + a window
    over the BIN relation (≤ range·{KS_BIN_INV} rows however large the
    corpus), two 1-row broadcasts. The parity split is hash-style
    deterministic, so the test is reproducible across cluster sizes."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("ks_events_src")
    return spark.sql(_ks_body("ks_events_src"))


SAMPLE_KS_DRIFT_SQL = _ks_body("events")


# ---------------------------------------------------------------------------
# agg_weighted_percentile — ClickHouse quantileExactWeighted
# ---------------------------------------------------------------------------


def _weighted_pct_body(events_rel: str) -> str:
    """Engine-shared exact weighted percentiles per event type: the
    smallest value whose cumulative weight reaches q·W (ClickHouse
    quantileExactWeighted semantics). Weights are deterministic
    (user_id % 5 + 1 — a stand-in for a sample/importance weight
    column); the threshold compare is exact integer cross-multiplied
    (cw·100 ≥ q·W), no float quantile math anywhere."""
    return f"""
        WITH pts AS (
            SELECT event_type, value, event_id,
                   CAST(user_id % 5 + 1 AS BIGINT) AS w
            FROM {events_rel} WHERE value IS NOT NULL
        ),
        cum AS (
            SELECT event_type, value, w,
                   SUM(w) OVER (PARTITION BY event_type
                                ORDER BY value, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cw,
                   SUM(w) OVER (PARTITION BY event_type) AS tw
            FROM pts
        )
        SELECT event_type,
               CAST(SUM(w) AS BIGINT) AS total_weight,
               MIN(CASE WHEN cw * 100 >= 50 * tw THEN value END) AS p50_w,
               MIN(CASE WHEN cw * 100 >= 95 * tw THEN value END) AS p95_w,
               MAX(value) AS p100
        FROM cum
        GROUP BY event_type
        ORDER BY event_type
    """


def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted percentiles (ClickHouse ``quantileExactWeighted``,
    the estimator a stratified/importance-weighted sample requires —
    unweighted percentile_cont over resampled data is biased).

    Scale posture: one shuffle keyed by event_type; both windows ride
    the same partitioning (cumulative + total in one pass); the
    per-type reduce is the same exchange. Weighted quantiles don't
    decompose into partial aggregates, so the per-key sort is inherent
    — exactly ClickHouse's own memory contract for the function."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("wp_events_src")
    return spark.sql(_weighted_pct_body("wp_events_src"))


AGG_WEIGHTED_PERCENTILE_SQL = _weighted_pct_body("events")


# ---------------------------------------------------------------------------
# events_markov_stationary — stationary distribution of the type chain
# ---------------------------------------------------------------------------

MARKOV_ROUNDS = 4
_MK_INIT = 1_000_000  # initial probability mass per state, micro units


def _markov_round_sql(pi_rel: str) -> str:
    """π_{r+1}(t) = Σ_s π_r(s)·p(s→t), micro arithmetic with an explicit
    per-term floor of the double division — both engines perform the
    identical IEEE ops on identical integers, so the unrolled oracle is
    bit-identical (DuckDB would ROUND a bare double→BIGINT cast)."""
    return f"""
        SELECT t.to_type AS event_type,
               CAST(SUM(CAST(floor(p.pi * t.p_micro / 1000000.0) AS BIGINT))
                    AS BIGINT) AS pi
        FROM {pi_rel} p JOIN mk_trans t ON t.from_type = p.event_type
        GROUP BY t.to_type
    """


_MK_TRANS_SQL = """
    SELECT from_type, to_type,
           CAST(floor(cnt * 1000000 / CAST(out_total AS DOUBLE)) AS BIGINT)
               AS p_micro
    FROM (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY from_type) AS BIGINT)
                   AS out_total
        FROM (
            SELECT event_type AS from_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM {EV}
        ) seq
        WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    ) counted
"""


def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain: power-
    iterate π over the transition matrix events_path_transitions
    derives — where user attention settles in the long run (the chain's
    steady state, the quantity funnel analyses approximate). Fixed
    ``MARKOV_ROUNDS`` exact-integer rounds from a uniform start; the
    oracle unrolls the SAME rounds (pagerank recipe).

    Scale posture: the per-user lead() is the one corpus-sized shuffle
    (same as path_transitions); everything after runs on the
    |types|²-row transition relation — driver-free, broadcast-sized.
    Truncation loses ≤1 micro per (state, round): deterministic,
    identical in both engines, and irrelevant to the ranking."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        barrier,
        cached_barrier_view,
    )

    def build():
        load_table(spark, sf_dir, "events").createOrReplaceTempView(
            "mk_events_src"
        )
        return spark.sql(_MK_TRANS_SQL.replace("{EV}", "mk_events_src"))

    # barriered: each nested round referenced the un-checkpointed
    # transition view and re-ran the corpus lead() per round (19
    # exchanges, audited down to single digits — the entropy-rate op
    # shares the same memoized relation)
    cached_barrier_view(
        spark, sf_dir, "mk_trans", build, tables=("events",)
    )
    pi_df = spark.sql(
        f"SELECT from_type AS event_type, CAST({_MK_INIT} AS BIGINT)"
        f" AS pi FROM mk_trans GROUP BY from_type"
    )
    for r in range(MARKOV_ROUNDS):
        pi_df = barrier(pi_df)
        pi_df.createOrReplaceTempView(f"mk_pi{r}")
        pi_df = spark.sql(_markov_round_sql(f"mk_pi{r}"))
    pi_df.createOrReplaceTempView("mk_pi_final")
    return spark.sql("""
        SELECT event_type, pi AS pi_micro
        FROM mk_pi_final
        ORDER BY pi_micro DESC, event_type
    """)


def _markov_duck_sql() -> str:
    parts = [
        "mk_trans AS (" + _MK_TRANS_SQL.replace("{EV}", "events") + ")",
        f"pi0 AS (SELECT from_type AS event_type,"
        f" CAST({_MK_INIT} AS BIGINT) AS pi FROM mk_trans GROUP BY from_type)",
    ]
    for r in range(1, MARKOV_ROUNDS + 1):
        parts.append(f"pi{r} AS ({_markov_round_sql(f'pi{r - 1}')})")
    return f"""
        WITH {", ".join(parts)}
        SELECT event_type, pi AS pi_micro
        FROM pi{MARKOV_ROUNDS}
        ORDER BY pi_micro DESC, event_type
    """


EVENTS_MARKOV_STATIONARY_SQL = _markov_duck_sql()


# ---------------------------------------------------------------------------
# events_entropy_rate — Markov-chain entropy rate (how predictable are
# user journeys)
# ---------------------------------------------------------------------------


def _entropy_rate_tail_sql(pi_rel: str) -> str:
    """Shared tail over the mk_trans transition relation + the
    power-iterated stationary distribution: per-state conditional
    entropy H_i = Σ_j p_ij·(−ln p_ij), and the chain's entropy rate
    H = Σ_i π̂_i·H_i (π̂ normalized over the truncated micro masses) —
    the information-theoretic "how predictable is the next event"
    scalar behind journey modeling and sessionization cost estimates.
    Each −ln p is ONE double ln on an exact micro integer, rounded to
    micro-nats; products/sums are BIGINT; the final normalization is
    one double division. Zero-probability edges (p_micro = 0 after
    truncation, possible only when out-degree totals exceed 1e6× an
    edge count) contribute 0 by the CASE guard — the measure-zero
    convention."""
    return f"""
        percond AS (
            SELECT from_type AS event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_out,
                   CAST(SUM(CASE WHEN p_micro > 0 THEN
                       CAST(floor(p_micro * CAST(round(
                           -ln(p_micro / 1000000.0) * 1e6) AS BIGINT)
                           / 1000000.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS h_cond_micro
            FROM mk_trans
            GROUP BY from_type
        ),
        pinorm AS (
            SELECT p.event_type, p.pi,
                   SUM(p.pi) OVER () AS pi_sum
            FROM {pi_rel} p
        )
        SELECT event_type, pi_micro, n_out, h_cond_micro,
               entropy_rate_micro
        FROM (
            SELECT '__chain__' AS event_type,
                   CAST(1000000 AS BIGINT) AS pi_micro,
                   CAST(SUM(c.n_out) AS BIGINT) AS n_out,
                   CAST(NULL AS BIGINT) AS h_cond_micro,
                   CAST(floor(SUM(n.pi * c.h_cond_micro)
                              / CAST(MAX(n.pi_sum) AS DOUBLE))
                        AS BIGINT) AS entropy_rate_micro,
                   0 AS pick
            FROM pinorm n JOIN percond c ON c.event_type = n.event_type
            UNION ALL
            SELECT n.event_type,
                   CAST(floor(n.pi * 1000000.0 / n.pi_sum) AS BIGINT),
                   c.n_out, c.h_cond_micro, NULL, 1
            FROM pinorm n JOIN percond c ON c.event_type = n.event_type
        ) unioned
        ORDER BY pick, event_type
    """


def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov entropy rate of the user-journey chain — see
    _entropy_rate_tail_sql. Reuses the mk_trans transition relation and
    the same {MARKOV_ROUNDS}-round integer power iteration as
    ``events_markov_stationary``; everything after the one corpus lead()
    shuffle runs on the |types|²-row relation. The pi-sum window runs
    over |types| rows (bounded).

    The transition relation lands on a checkpoint barrier: the nested
    pi rounds and the conditional-entropy aggregate reference it
    {MARKOV_ROUNDS}+2 times, and the un-barriered form re-ran the
    corpus lead() per reference (44 exchanges, audited down to
    single digits)."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        barrier,
        cached_barrier_view,
    )

    def build():
        load_table(spark, sf_dir, "events").createOrReplaceTempView(
            "mk_events_src"
        )
        return spark.sql(_MK_TRANS_SQL.replace("{EV}", "mk_events_src"))

    cached_barrier_view(
        spark, sf_dir, "mk_trans", build, tables=("events",)
    )
    pi_df = spark.sql(
        f"SELECT from_type AS event_type, CAST({_MK_INIT} AS BIGINT)"
        f" AS pi FROM mk_trans GROUP BY from_type"
    )
    for r in range(MARKOV_ROUNDS):
        pi_df = barrier(pi_df)
        pi_df.createOrReplaceTempView(f"ent_pi{r}")
        pi_df = spark.sql(_markov_round_sql(f"ent_pi{r}"))
    pi_df.createOrReplaceTempView("ent_pi_final")
    return spark.sql(
        "WITH " + _entropy_rate_tail_sql("ent_pi_final")
    )


def _entropy_rate_duck_sql() -> str:
    parts = [
        "mk_trans AS MATERIALIZED ("
        + _MK_TRANS_SQL.replace("{EV}", "events") + ")",
        f"pi0 AS (SELECT from_type AS event_type,"
        f" CAST({_MK_INIT} AS BIGINT) AS pi FROM mk_trans"
        f" GROUP BY from_type)",
    ]
    for r in range(1, MARKOV_ROUNDS + 1):
        parts.append(f"pi{r} AS ({_markov_round_sql(f'pi{r - 1}')})")
    return (
        f"WITH {', '.join(parts)}, "
        + _entropy_rate_tail_sql(f"pi{MARKOV_ROUNDS}")
    )


EVENTS_ENTROPY_RATE_SQL = _entropy_rate_duck_sql()


# ---------------------------------------------------------------------------
# sample_psi_drift — Population Stability Index distribution monitor
# ---------------------------------------------------------------------------

PSI_BIN_INV = 10        # same 0.1-wide value grid as the KS test
PSI_TOP_BINS = 5        # per-bin contribution rows reported next to the total
_PSI_WARN_MICRO = 100_000   # PSI > 0.1  — "monitor" threshold (industry rule)
_PSI_ALERT_MICRO = 200_000  # PSI > 0.25 is the classic alert; 0.2 used here


def _psi_body(events_rel: str) -> str:
    """Engine-shared Population Stability Index between the A/B halves
    of the event stream (split by event_id parity — the same
    deterministic split the KS test uses, so the two monitors are
    directly comparable on identical cohorts).

    PSI = Σ_bins (p_i - q_i) · ln(p_i / q_i), with Laplace +1 smoothing
    at the bin level so empty bins contribute finitely (the standard
    production guard — without it a single unseen bin is ±∞).

    Exactness contract (the house micro-nats discipline, see
    corpusops DSIR): counts are exact integers; p/q proportions are
    exact floors to ppm; ln() is evaluated ONCE per bin on an IEEE
    double ratio of exact integers below 2^53 (correctly-rounded libm
    in both engines) and immediately rounded to integer micro-nats, so
    the final sum is pure BIGINT arithmetic — bit-identical across
    engines and cluster sizes."""
    return f"""
        WITH pts AS (
            SELECT CAST(floor(value * {PSI_BIN_INV}) AS BIGINT) AS bin,
                   CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS a
            FROM {events_rel} WHERE value IS NOT NULL
        ),
        binned AS (
            SELECT bin,
                   CAST(SUM(a) AS BIGINT) AS ca_i,
                   CAST(SUM(1 - a) AS BIGINT) AS cb_i
            FROM pts GROUP BY bin
        ),
        totals AS (
            SELECT CAST(SUM(ca_i) AS BIGINT) AS na,
                   CAST(SUM(cb_i) AS BIGINT) AS nb,
                   CAST(COUNT(*) AS BIGINT) AS nbins
            FROM binned
        ),
        contrib AS (
            SELECT bin,
                   CAST(floor((ca_i + 1) * 1000000.0
                              / CAST(na + nbins AS DOUBLE)) AS BIGINT)
                       AS p_ppm,
                   CAST(floor((cb_i + 1) * 1000000.0
                              / CAST(nb + nbins AS DOUBLE)) AS BIGINT)
                       AS q_ppm,
                   CAST(round(ln(((ca_i + 1) * (nb + nbins))
                                 / CAST((cb_i + 1) * (na + nbins)
                                        AS DOUBLE)) * 1e6) AS BIGINT)
                       AS ln_micro
            FROM binned CROSS JOIN totals
        ),
        per_bin AS (
            SELECT bin,
                   (p_ppm - q_ppm) * ln_micro AS raw
            FROM contrib
        ),
        total AS (
            SELECT CAST(NULL AS BIGINT) AS bin,
                   CAST(floor(SUM(raw) / 1000000.0) AS BIGINT) AS psi_micro,
                   na, nb
            FROM per_bin CROSS JOIN totals
            GROUP BY na, nb
        )
        SELECT '__total__' AS tier, bin, psi_micro,
               psi_micro > {_PSI_WARN_MICRO} AS warn,
               psi_micro > {_PSI_ALERT_MICRO} AS alert,
               na AS n_a, nb AS n_b
        FROM total
        UNION ALL
        SELECT 'bin' AS tier, bin, psi_micro,
               NULL AS warn, NULL AS alert,
               NULL AS n_a, NULL AS n_b
        FROM (
            SELECT bin,
                   CAST(floor(raw / 1000000.0) AS BIGINT) AS psi_micro
            FROM per_bin
            ORDER BY ABS(raw) DESC, bin
            LIMIT {PSI_TOP_BINS}
        ) top_bins
        ORDER BY tier, bin
    """


def sample_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the A/B halves of the event
    stream — the model-monitoring twin of ``sample_ks_drift`` (PSI is
    the industry's feature-drift scalar; KS is the distribution test).
    Emits the total (tier = '__total__', bin NULL — a label row, not an
    in-domain sentinel that could collide with a genuine bin; round-6
    ADVICE) with warn/alert flags at 0.1 / 0.2, plus the
    top-{PSI_TOP_BINS} contributing bins (tier = 'bin'), so an alert is
    immediately attributable to the value range that moved.

    Scale posture: one scan + one bounded-key bin groupBy; everything
    after the bin aggregate runs on a ≤ range·{PSI_BIN_INV}-row
    relation (two 1-row broadcast joins, a top-k). The split is
    hash-style deterministic — reproducible on any cluster size."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("psi_events_src")
    return spark.sql(_psi_body("psi_events_src"))


SAMPLE_PSI_DRIFT_SQL = _psi_body("events")


# ---------------------------------------------------------------------------
# events_autocorrelation — ACF of the daily event-count series
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 7    # report r_1 .. r_7 (the weekly-seasonality window)


def _acf_body(events_rel: str) -> str:
    """Engine-shared autocorrelation function of the daily event-count
    series at lags 1..{ACF_MAX_LAG}:

        r_k = Σ_t c_t·c_(t+k) / Σ_t c_t²   with c_t = x_t − ⌊mean⌋

    — the seasonality probe a pipeline runs before picking rollup
    windows (a weekly cycle shows as a spike at lag 7). Centering uses
    the FLOOR of the mean (one exact BIGINT division), so every c_t is
    an exact integer and both numerator and denominator are exact
    BIGINT sums — bit-identical across engines and cluster sizes while
    daily counts stay below ~3e8 (c² ≈ 1e17·days < 2^63; the house
    DECIMAL widening applies beyond). The final ratio is one double
    division of exact integers, floored to ppm. Lag alignment is an
    equi-join on (day_index + k), never a window.

    ``events_rel`` must already BE the (day_idx, x) daily relation —
    the Spark side materializes it on a checkpoint barrier because the
    body references it four times (two lag sides, the mean, the
    denominator), and each reference must be a |days|-row leaf scan,
    not a recomputed pass over the event log."""
    return f"""
        WITH daily AS (SELECT day_idx, x FROM {events_rel}),
        centered AS (
            SELECT day_idx,
                   x - (SELECT SUM(x) {{intdiv}} COUNT(*) FROM daily) AS c
            FROM daily
        ),
        lags AS (
            SELECT a.day_idx, l.lag, a.c AS c0, b.c AS ck
            FROM centered a
            JOIN (SELECT * FROM (VALUES {", ".join(f"({k})" for k in range(1, ACF_MAX_LAG + 1))}) v(lag)) l
              ON TRUE
            JOIN centered b ON b.day_idx = a.day_idx + l.lag
        ),
        denom AS (
            SELECT CAST(SUM(c * c) AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n_days
            FROM centered
        )
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(floor(SUM(c0 * ck) / CAST(d AS DOUBLE) * 1000000)
                    AS BIGINT) AS acf_ppm,
               n_days
        FROM lags CROSS JOIN denom
        GROUP BY lag, d, n_days
        ORDER BY lag
    """


def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-series ACF at lags 1..{ACF_MAX_LAG} — see _acf_body.

    Scale posture: one scan → day-keyed COUNT (map-side combined,
    |days|-bounded output); everything downstream — the centering
    subtract, the {ACF_MAX_LAG}-way lag fan-out, the lag equi-join and
    the per-lag aggregate — runs on the |days|-row relation (calendar-
    bounded, independent of event volume)."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    def build():
        return load_table(spark, sf_dir, "events").selectExpr(
            "CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 86400000000)"
            " AS BIGINT) AS day_idx"
        ).groupBy("day_idx").agg(F.count("*").cast("bigint").alias("x"))

    cached_barrier_view(
        spark, sf_dir, "acf_daily", build, tables=("events",)
    )
    return spark.sql(_acf_body("acf_daily").replace("{intdiv}", "DIV"))


_ACF_DAILY_DUCK = """
    (SELECT CAST(floor(CAST(epoch_us(ts) AS BIGINT) / 86400000000)
                 AS BIGINT) AS day_idx,
            CAST(COUNT(*) AS BIGINT) AS x
     FROM events GROUP BY 1)
"""

EVENTS_AUTOCORRELATION_SQL = _acf_body(_ACF_DAILY_DUCK).replace(
    "{intdiv}", "//"
)


# ---------------------------------------------------------------------------
# events_theil_sen_trend — robust slope of the daily-count series
# ---------------------------------------------------------------------------


def _theil_sen_body(daily_rel: str) -> str:
    """Engine-shared Theil–Sen trend estimator over the daily series:
    the MEDIAN of all pairwise slopes (x_b − x_a)/(d_b − d_a) — robust
    to ~29% outliers where OLS (agg_regr_ols) is not; the volume-trend
    monitor that ignores a flash-crowd day. Slopes are floored to
    integer micro via ONE double division of exact BIGINTs; the median
    of an even count is the floor-average of the two middle slopes —
    fully integer-deterministic in both engines."""
    return f"""
        WITH daily AS (SELECT day_idx, x FROM {daily_rel}),
        slopes AS (
            SELECT CAST(floor((b.x - a.x) * 1000000.0
                              / (b.day_idx - a.day_idx)) AS BIGINT) AS s
            FROM daily a JOIN daily b ON b.day_idx > a.day_idx
        ),
        ranked AS (
            SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rk,
                   COUNT(*) OVER () AS np
            FROM slopes
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
               CAST(MAX(np) AS BIGINT) AS n_pairs,
               CAST(floor((MIN(CASE WHEN rk = (np + 1) // 2 THEN s END)
                           + MIN(CASE WHEN rk = (np + 2) // 2 THEN s END))
                          / 2.0) AS BIGINT) AS ts_slope_micro
        FROM ranked
    """


def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust daily-volume trend — see _theil_sen_body.

    Scale posture: rides the SAME checkpointed daily rollup as
    ``events_autocorrelation`` (one event scan per session); the
    pairwise-slope join and the median rank window run over |days|² / 2
    rows — calendar²-bounded (a decade is ~6.7M pairs), independent of
    event volume."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    def build():
        return load_table(spark, sf_dir, "events").selectExpr(
            "CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 86400000000)"
            " AS BIGINT) AS day_idx"
        ).groupBy("day_idx").agg(F.count("*").cast("bigint").alias("x"))

    cached_barrier_view(
        spark, sf_dir, "acf_daily", build, tables=("events",)
    )
    sql = _theil_sen_body("acf_daily").replace("(np + 1) // 2",
                                               "(np + 1) DIV 2").replace(
        "(np + 2) // 2", "(np + 2) DIV 2")
    return spark.sql(sql)


EVENTS_THEIL_SEN_TREND_SQL = _theil_sen_body(_ACF_DAILY_DUCK)


# ---------------------------------------------------------------------------
# events_seasonality_weekly — day-of-week profile of the daily series
# ---------------------------------------------------------------------------


def _weekly_body(daily_rel: str) -> str:
    """Engine-shared weekly seasonality profile: the daily-count series
    grouped by day-of-week (epoch-day mod 7), each cell carrying the
    mean and the within-cell variance — the additive half of a
    one-way-ANOVA decomposition and the poor-man's STL seasonal
    component a pipeline checks before choosing rollup windows.

    Exactness: mean_micro = ⌊S·1e6/n⌋ (exact BIGINT — counts are
    non-negative so truncation IS floor in both engines); the
    population variance comes from the n²-scaled central power sum
    n·Σx² − S² (exact BIGINT, the covariance-family discipline) with
    ONE double division floored to micro."""
    return f"""
        WITH daily AS (SELECT day_idx, x FROM {daily_rel})
        SELECT day_idx % 7 AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(x) * 1000000 {{intdiv}} COUNT(*) AS BIGINT)
                   AS mean_micro,
               CAST(floor((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                          * 1000000.0 / (1.0 * COUNT(*) * COUNT(*)))
                    AS BIGINT) AS var_micro
        FROM daily
        GROUP BY day_idx % 7
        ORDER BY dow
    """


def events_seasonality_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile — see _weekly_body. Rides the
    SAME checkpointed daily rollup as the ACF/Theil–Sen monitors (one
    event scan per session); the profile is a 7-key aggregate over the
    |days|-row relation."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    def build():
        return load_table(spark, sf_dir, "events").selectExpr(
            "CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 86400000000)"
            " AS BIGINT) AS day_idx"
        ).groupBy("day_idx").agg(F.count("*").cast("bigint").alias("x"))

    cached_barrier_view(
        spark, sf_dir, "acf_daily", build, tables=("events",)
    )
    return spark.sql(_weekly_body("acf_daily").replace("{intdiv}", "DIV"))


EVENTS_SEASONALITY_WEEKLY_SQL = _weekly_body(_ACF_DAILY_DUCK).replace(
    "{intdiv}", "//"
)


# ---------------------------------------------------------------------------
# events_resample_interpolate — linear resampling onto the hourly grid
# ---------------------------------------------------------------------------


def _resample_sql(engine: str) -> str:
    """Engine-shared linear resampling: each consecutive same-day event
    pair (per type, ordered by time) emits the hour boundaries strictly
    inside its interval, valued by exact linear interpolation — the
    irregular-series → regular-grid step in front of any windowed
    model (the WITH FILL/LOCF tier carries values; this one actually
    interpolates). Values floor to exact cents once; the interpolation
    ratio is ONE double division of exact µs integers, the blend
    rounded to micro.

    Scale posture: the LEAD window partitions by (type, day) — the
    gaps-and-islands bucket-clipping trick, so no partition exceeds a
    day of one type's events (boundaries at day edges are clipped,
    documented); the boundary fan-out is bounded by hours-per-gap ≤ 24
    per pair."""
    if engine == "spark":
        epoch = "unix_micros(CAST(ts AS TIMESTAMP))"
        gen = ("LATERAL VIEW explode(sequence(CAST(h0 AS BIGINT) + 1,"
               " CAST(h1 AS BIGINT))) AS h")
    else:
        epoch = "CAST(epoch_us(ts) AS BIGINT)"
        gen = ", unnest(range(h0 + 1, h1 + 1)) AS gh(h)"
    intdiv = "DIV" if engine == "spark" else "//"
    return f"""
        WITH pts AS (
            SELECT event_type, {epoch} AS t,
                   CAST(floor(value * 100) AS BIGINT) AS v,
                   {epoch} {intdiv} 86400000000 AS day_idx,
                   event_id
            FROM events WHERE value IS NOT NULL
        ),
        pairs AS (
            SELECT event_type, t AS t0, v AS v0,
                   LEAD(t) OVER (PARTITION BY event_type, day_idx
                                 ORDER BY t, event_id) AS t1,
                   LEAD(v) OVER (PARTITION BY event_type, day_idx
                                 ORDER BY t, event_id) AS v1
            FROM pts
        ),
        spans AS (
            SELECT event_type, t0, v0, t1, v1,
                   t0 {intdiv} 3600000000 AS h0,
                   (t1 - 1) {intdiv} 3600000000 AS h1
            FROM pairs WHERE t1 IS NOT NULL AND t1 > t0
        ),
        grid AS (
            SELECT event_type, h,
                   CAST(round(v0 * 10000.0 + (v1 - v0) * 10000.0
                              * ((h * 3600000000 - t0)
                                 / CAST(t1 - t0 AS DOUBLE)))
                        AS BIGINT) AS value_micro
            FROM spans {gen}
            WHERE h * 3600000000 > t0 AND h * 3600000000 < t1
        )
        SELECT event_type, CAST(h AS BIGINT) AS hour_idx,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(MIN(value_micro) AS BIGINT) AS value_micro
        FROM grid
        GROUP BY event_type, h
        ORDER BY event_type, hour_idx
    """


def events_resample_interpolate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hourly linear resampling of the per-type value series — see
    _resample_sql."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_resample_sql("spark"))


EVENTS_RESAMPLE_INTERPOLATE_SQL = _resample_sql("duck")


# ---------------------------------------------------------------------------
# agg_ttest_welch — two-sample Welch t-test between the A/B halves
# ---------------------------------------------------------------------------

_T_CRIT_MILLI = 1960   # |t| > 1.96: the large-df 5% two-sided bound


def _welch_body(events_rel: str) -> str:
    """Engine-shared Welch two-sample t-test on the event values
    between the deterministic A/B halves (event_id parity — the same
    cohorts as the KS/PSI monitors, completing the drift-test family:
    KS for shape, PSI for binned mass, Welch for the MEAN under unequal
    variances). Sample variances use the Bessel n−1 form from exact
    cent power sums; t and the Welch–Satterthwaite df are each ONE
    fixed double expression over exact BIGINTs, reported in milli.

    Degenerate halves (a side with n < 2, where the Bessel denominator
    vanishes, or an absent side) yield an EXPLICIT well-defined row:
    n/mean columns report what exists and t/df/significant are NULL by
    a deliberate n-guard — never a division-by-zero artifact (round-6
    ADVICE)."""
    return f"""
        WITH sides AS (
            SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
                   CAST(floor(value * 100) AS BIGINT) AS x
            FROM {events_rel} WHERE value IS NOT NULL
        ),
        m AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS s2
            FROM sides GROUP BY g
        ),
        wide AS (
            SELECT MAX(CASE WHEN g = 'a' THEN n END) AS na,
                   MAX(CASE WHEN g = 'a' THEN s END) AS sa,
                   MAX(CASE WHEN g = 'a' THEN s2 END) AS sa2,
                   MAX(CASE WHEN g = 'b' THEN n END) AS nb,
                   MAX(CASE WHEN g = 'b' THEN s END) AS sb,
                   MAX(CASE WHEN g = 'b' THEN s2 END) AS sb2
            FROM m
        ),
        stats AS (
            -- 1eN literals, NOT 100.0/10000.0: Spark parses decimal-
            -- point literals as DECIMAL and the scale-truncating
            -- division diverges from DuckDB's double path
            SELECT na, nb,
                   sa / (1e2 * na) AS ma,
                   sb / (1e2 * nb) AS mb,
                   -- n·Σx² and (Σx)² widened to DECIMAL(38,0): BIGINT
                   -- overflows at ~750k rows of cents² sums (round-10
                   -- sf1 rehearsal); identical doubles at graded sfs
                   CASE WHEN na >= 2 THEN
                       (CAST(na AS DECIMAL(38, 0)) * sa2
                        - CAST(sa AS DECIMAL(38, 0)) * sa)
                       / (1e4 * na * (na - 1)) END
                       AS va,
                   CASE WHEN nb >= 2 THEN
                       (CAST(nb AS DECIMAL(38, 0)) * sb2
                        - CAST(sb AS DECIMAL(38, 0)) * sb)
                       / (1e4 * nb * (nb - 1)) END
                       AS vb
            FROM wide
        )
        SELECT na AS n_a, nb AS n_b,
               CAST(round(ma * 1e6) AS BIGINT) AS mean_a_micro,
               CAST(round(mb * 1e6) AS BIGINT) AS mean_b_micro,
               CASE WHEN COALESCE(na, 0) >= 2 AND COALESCE(nb, 0) >= 2 THEN
                   CAST(round((ma - mb) / sqrt(va / na + vb / nb) * 1000)
                        AS BIGINT) END AS t_milli,
               CASE WHEN COALESCE(na, 0) >= 2 AND COALESCE(nb, 0) >= 2 THEN
                   CAST(round((va / na + vb / nb) * (va / na + vb / nb)
                              / ((va / na) * (va / na) / (na - 1)
                                 + (vb / nb) * (vb / nb) / (nb - 1)) * 1000)
                        AS BIGINT) END AS df_milli,
               CASE WHEN COALESCE(na, 0) >= 2 AND COALESCE(nb, 0) >= 2 THEN
                   abs(CAST(round((ma - mb) / sqrt(va / na + vb / nb)
                                  * 1000)
                            AS BIGINT)) > {_T_CRIT_MILLI} END AS significant
        FROM stats
    """


def agg_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test — see _welch_body. One scan, one 2-key
    aggregate, everything downstream on a 1-row relation."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "welch_events_src"
    )
    return spark.sql(_welch_body("welch_events_src"))


AGG_TTEST_WELCH_SQL = _welch_body("events")


# ---------------------------------------------------------------------------
# events_top_paths — most-travelled 3-step journeys (the Sankey feed)
# ---------------------------------------------------------------------------

PATHS_TOPK = 15


def _top_paths_sql(events_rel: str) -> str:
    """Per-user ordered 3-step event paths counted corpus-wide — the
    relation behind every journey Sankey / flow diagram (and the 3-gram
    extension of the transition matrix). Two LEADs in one user-
    partitioned window pass, one path-keyed aggregate (≤|types|³ keys),
    TakeOrderedAndProject top-{PATHS_TOPK}."""
    return f"""
        SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM (
            SELECT event_type AS t1,
                   LEAD(event_type, 1) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS t2,
                   LEAD(event_type, 2) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS t3
            FROM {events_rel}
        ) seq
        WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        GROUP BY t1, t2, t3
        ORDER BY n_paths DESC, t1, t2, t3
        LIMIT {PATHS_TOPK}
    """


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step user journeys — see _top_paths_sql."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "paths_events_src"
    )
    return spark.sql(_top_paths_sql("paths_events_src"))


EVENTS_TOP_PATHS_SQL = _top_paths_sql("events")


# ---------------------------------------------------------------------------
# agg_wilson_interval — binomial confidence intervals per event type
# ---------------------------------------------------------------------------

# z for 95% two-sided — CAST'd because Spark parses bare decimal-point
# literals as DECIMAL (the scale-truncating-division trap Welch hit)
_WILSON_Z = "CAST(1.959963985 AS DOUBLE)"
WILSON_VALUE_CUT = 5.0      # "conversion" = value above this


def _wilson_body(events_rel: str) -> str:
    """Engine-shared Wilson score intervals for per-type conversion
    rates (conversion = value > {WILSON_VALUE_CUT}): the interval that
    stays inside [0,1] and behaves at small n where the naive Wald
    interval fails — the standard A/B dashboard bound. Counts are
    exact; the Wilson formula is one fixed double expression per type
    (z as a literal both engines parse to the same double), floored to
    ppm."""
    z = _WILSON_Z
    return f"""
        WITH counts AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN value > {WILSON_VALUE_CUT}
                                 THEN 1 ELSE 0 END) AS BIGINT) AS k
            FROM {events_rel} WHERE value IS NOT NULL
            GROUP BY event_type
        )
        SELECT event_type, n, k,
               CAST(k * 1000000 {{intdiv}} n AS BIGINT) AS rate_ppm,
               CAST(floor(
                   ((k + {z} * {z} / 2) / (n + {z} * {z})
                    - {z} / (n + {z} * {z})
                      * sqrt(k * (n - k) / (1e0 * n)
                             + {z} * {z} / 4)) * 1000000)
                    AS BIGINT) AS wilson_lo_ppm,
               CAST(floor(
                   ((k + {z} * {z} / 2) / (n + {z} * {z})
                    + {z} / (n + {z} * {z})
                      * sqrt(k * (n - k) / (1e0 * n)
                             + {z} * {z} / 4)) * 1000000)
                    AS BIGINT) AS wilson_hi_ppm
        FROM counts
        ORDER BY event_type
    """


def agg_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Wilson 95% conversion intervals — see _wilson_body.
    One scan, one |types|-key aggregate, narrow per-row arithmetic."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "wilson_events_src"
    )
    return spark.sql(
        _wilson_body("wilson_events_src").replace("{intdiv}", "DIV")
    )


AGG_WILSON_INTERVAL_SQL = _wilson_body("events").replace("{intdiv}", "//")


# ---------------------------------------------------------------------------
# events_anomaly_mad_daily — robust (median/MAD) daily anomaly flags
# ---------------------------------------------------------------------------

MAD_K_X10000 = 3 * 14826   # 3 × the 1.4826 normal-consistency constant


def _mad_body(daily_rel: str) -> str:
    """Engine-shared robust anomaly detection on the per-type DAILY
    series: flag days where |x − median| · 10000 > {MAD_K_X10000} · MAD
    — the median/MAD rule that survives the very outliers a z-score's
    own mean/σ absorb (the reason monitoring stacks pair it with
    events_anomaly_zscore). Medians are exact low-of-middle ranks
    (deterministic, no interpolation doubles); everything is BIGINT
    cross-multiplication.

    ``daily_rel`` provides (event_type, day_idx, x)."""
    return f"""
        WITH daily AS (SELECT event_type, day_idx, x FROM {daily_rel}),
        med AS (
            SELECT event_type, x AS m FROM (
                SELECT event_type, x,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY x, day_idx) AS rk,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM daily
            ) r WHERE rk = (n + 1) {{intdiv}} 2
        ),
        devs AS (
            SELECT d.event_type, d.day_idx, d.x, m.m,
                   ABS(d.x - m.m) AS dev
            FROM daily d JOIN med m ON m.event_type = d.event_type
        ),
        mad AS (
            SELECT event_type, dev AS mad FROM (
                SELECT event_type, dev,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY dev, day_idx) AS rk,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM devs
            ) r WHERE rk = (n + 1) {{intdiv}} 2
        )
        -- GREATEST(mad, 1): a heavily-repeated median collapses MAD
        -- to 0 and the bare rule would flag every non-median day; the
        -- one-unit floor is the standard degenerate-MAD guard
        SELECT d.event_type, d.day_idx, d.x, d.m AS median_x,
               a.mad,
               d.dev * 10000 > {MAD_K_X10000} * GREATEST(a.mad, 1)
                   AS flagged
        FROM devs d JOIN mad a ON a.event_type = d.event_type
        ORDER BY d.event_type, d.day_idx
    """


def events_anomaly_mad_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD daily anomaly flags — see _mad_body. Rides a
    checkpointed per-(type, day) rollup; both median rank windows and
    the joins run on that types×days-bounded relation."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    def build():
        return load_table(spark, sf_dir, "events").selectExpr(
            "event_type",
            "CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 86400000000)"
            " AS BIGINT) AS day_idx",
        ).groupBy("event_type", "day_idx").agg(
            F.count("*").cast("bigint").alias("x")
        )

    cached_barrier_view(
        spark, sf_dir, "typed_daily", build, tables=("events",)
    )
    return spark.sql(_mad_body("typed_daily").replace("{intdiv}", "DIV"))


EVENTS_ANOMALY_MAD_DAILY_SQL = _mad_body(
    """(
        SELECT event_type,
               CAST(floor(CAST(epoch_us(ts) AS BIGINT) / 86400000000)
                    AS BIGINT) AS day_idx,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    )"""
).replace("{intdiv}", "//")


# ---------------------------------------------------------------------------
# events_concurrency_peak — peak simultaneous sessions per hour
# ---------------------------------------------------------------------------

CONC_SPAN_US = 300_000_000   # each event holds a session open 5 minutes


def _concurrency_tail_sql(deltas_rel: str) -> str:
    """Shared tail over (t, delta, running) boundary rows where
    ``running`` is the INCLUSIVE running sum of ±1 deltas under the
    (t, delta, event_id) total order: per-hour peak and closing
    concurrency — the capacity-planning curve (how many sessions were
    open at once). The sweep-line classic, made distributed by
    computing the running sum with the two-pass range-partitioned
    prefix sum instead of a global window."""
    return f"""
        SELECT CAST(t {{intdiv}} 3600000000 AS BIGINT) AS hour_idx,
               CAST(MAX(running) AS BIGINT) AS peak_concurrency,
               CAST(SUM(delta) AS BIGINT) AS net_change,
               CAST(COUNT(*) AS BIGINT) AS n_boundaries
        FROM {deltas_rel}
        GROUP BY t {{intdiv}} 3600000000
        ORDER BY hour_idx
    """


def events_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly peak concurrency of 5-minute event sessions — see
    _concurrency_tail_sql.

    Scale posture: the boundary relation is a constant 2× fan-out of
    the event scan; the global running sum rides the two-pass
    distributed prefix sum (operators/rank.py) under the total order
    (t, delta asc — ends before starts at the same instant is the
    half-open [t, t+span) convention — event_id): never a no-partition
    window; the hourly rollup is a uniform-key aggregate."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )
    from mongo_to_clickhouse_spark.operators.rank import (
        distributed_prefix_sum,
    )

    def build():
        ev = load_table(spark, sf_dir, "events").selectExpr(
            "unix_micros(CAST(ts AS TIMESTAMP)) AS t0", "event_id"
        )
        deltas = ev.selectExpr(
            "t0 AS t", "CAST(1 AS BIGINT) AS delta", "event_id"
        ).unionAll(ev.selectExpr(
            f"t0 + {CONC_SPAN_US} AS t", "CAST(-1 AS BIGINT) AS delta",
            "event_id",
        ))
        return distributed_prefix_sum(
            deltas,
            [F.col("t"), F.col("delta"), F.col("event_id")],
            value_col="delta",
            out_col="running",
            exclusive=False,
        )

    cached_barrier_view(
        spark, sf_dir, "conc_deltas", build, tables=("events",)
    )
    return spark.sql(
        _concurrency_tail_sql("conc_deltas").replace("{intdiv}", "DIV")
    )


EVENTS_CONCURRENCY_PEAK_SQL = _concurrency_tail_sql(
    f"""(
        SELECT t, delta, event_id,
               SUM(delta) OVER (ORDER BY t, delta, event_id
                                ROWS UNBOUNDED PRECEDING) AS running
        FROM (
            SELECT CAST(epoch_us(ts) AS BIGINT) AS t,
                   CAST(1 AS BIGINT) AS delta, event_id
            FROM events
            UNION ALL
            SELECT CAST(epoch_us(ts) AS BIGINT) + {CONC_SPAN_US},
                   CAST(-1 AS BIGINT), event_id
            FROM events
        ) d
    )"""
).replace("{intdiv}", "//")


# ---------------------------------------------------------------------------
# events_survival_km — Kaplan–Meier time-to-second-event curve
# ---------------------------------------------------------------------------


def _km_body(engine: str) -> str:
    """Engine-shared Kaplan–Meier estimator of time-to-return (first →
    second event per user), right-censored at the observation end (the
    corpus max timestamp) — the survival curve behind churn/retention
    models, with the censoring handled properly instead of dropped.
    Durations bucket to hours; at each bucket: d = returns, c =
    censored, n = at-risk (reverse cumulative); S(t) accumulates in
    log space as an exact running BIGINT sum of per-bucket micro-nats
    ln(1 − d/n) (each ONE double ln on exact integers), exponentiated
    once per row. Windows run over the duration-bucket AGGREGATE
    (hours-bounded)."""
    if engine == "spark":
        epoch = "unix_micros(CAST(ts AS TIMESTAMP))"
        intdiv = "DIV"
    else:
        epoch = "CAST(epoch_us(ts) AS BIGINT)"
        intdiv = "//"
    return f"""
        WITH ev AS (
            SELECT user_id, {epoch} AS t, event_id FROM events
        ),
        firsts AS (
            SELECT user_id, t AS t1 FROM (
                SELECT user_id, t,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY t, event_id) AS rk
                FROM ev
            ) r WHERE rk = 1
        ),
        seconds AS (
            SELECT user_id, t AS t2 FROM (
                SELECT user_id, t,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY t, event_id) AS rk
                FROM ev
            ) r WHERE rk = 2
        ),
        horizon AS (SELECT MAX(t) AS tmax FROM ev),
        spells AS (
            SELECT f.user_id,
                   CASE WHEN s.t2 IS NULL
                        THEN (h.tmax - f.t1) {intdiv} 3600000000
                        ELSE (s.t2 - f.t1) {intdiv} 3600000000
                   END AS dur_h,
                   CASE WHEN s.t2 IS NULL THEN 0 ELSE 1 END AS returned
            FROM firsts f
            LEFT JOIN seconds s ON s.user_id = f.user_id
            CROSS JOIN horizon h
        ),
        buckets AS (
            SELECT dur_h,
                   CAST(SUM(returned) AS BIGINT) AS d,
                   CAST(SUM(1 - returned) AS BIGINT) AS c
            FROM spells GROUP BY dur_h
        ),
        at_risk AS (
            SELECT dur_h, d, c,
                   CAST(SUM(d + c) OVER (ORDER BY dur_h DESC)
                        AS BIGINT) AS n_risk
            FROM buckets
        ),
        lnterms AS (
            -- d = n_risk (everyone remaining returns in this bucket)
            -- drives S(t) to exactly 0: a -100-nat sentinel makes
            -- exp() round to 0 micro in both engines without ln(0)
            SELECT dur_h, d, c, n_risk,
                   CASE WHEN d = 0 THEN CAST(0 AS BIGINT)
                        WHEN d >= n_risk THEN CAST(-100000000 AS BIGINT)
                        ELSE CAST(round(ln((n_risk - d)
                                           / CAST(n_risk AS DOUBLE))
                                        * 1e6) AS BIGINT) END AS lnm
            FROM at_risk
        )
        SELECT dur_h, d AS n_returned, c AS n_censored, n_risk,
               CAST(round(exp(SUM(lnm) OVER (ORDER BY dur_h) / 1e6)
                          * 1e6) AS BIGINT) AS survival_micro
        FROM lnterms
        WHERE d > 0 OR c > 0
        ORDER BY dur_h
    """


def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier time-to-return curve — see _km_body. The per-user
    rank windows are the one corpus-sized pass (uniform user keys);
    the KM machinery runs on the hours-bounded duration buckets."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_km_body("spark"))


EVENTS_SURVIVAL_KM_SQL = _km_body("duck")


# ---------------------------------------------------------------------------
# events_rolling_slope — trailing-window OLS trend per event type
# ---------------------------------------------------------------------------

ROLL_WINDOW_DAYS = 7


def _rolling_slope_body(daily_rel: str) -> str:
    """Engine-shared rolling {ROLL_WINDOW_DAYS}-day OLS slope of the
    per-type daily counts — the short-horizon trend a monitoring
    dashboard overlays on the long-horizon Theil–Sen line (OLS inside
    a trailing frame reacts in days; the robust global line doesn't).
    Every frame statistic (n, Σx, Σy, Σxy, Σx²) accumulates as exact
    BIGINT frame sums over the daily rollup; the slope closed form is
    ONE double division floored to micro per row. Frames partition by
    event type over the types×days-bounded relation."""
    frame = (f"PARTITION BY event_type ORDER BY day_idx "
             f"ROWS BETWEEN {ROLL_WINDOW_DAYS - 1} PRECEDING"
             f" AND CURRENT ROW")
    return f"""
        WITH daily AS (SELECT event_type, day_idx, x FROM {daily_rel}),
        framed AS (
            SELECT event_type, day_idx, x,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n,
                   CAST(SUM(day_idx) OVER w AS BIGINT) AS sx,
                   CAST(SUM(x) OVER w AS BIGINT) AS sy,
                   CAST(SUM(day_idx * x) OVER w AS BIGINT) AS sxy,
                   CAST(SUM(day_idx * day_idx) OVER w AS BIGINT) AS sxx
            FROM daily
            WINDOW w AS ({frame})
        )
        SELECT event_type, day_idx, x, n,
               CASE WHEN n < 2 OR n * sxx = sx * sx THEN NULL
                    ELSE CAST(floor((n * sxy - sx * sy) * 1000000.0
                                    / (1e0 * (n * sxx - sx * sx)))
                              AS BIGINT) END AS slope_micro_per_day
        FROM framed
        ORDER BY event_type, day_idx
    """


def events_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling per-type OLS trend — see _rolling_slope_body. Rides the
    checkpointed per-(type, day) rollup shared with the MAD monitor."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    def build():
        return load_table(spark, sf_dir, "events").selectExpr(
            "event_type",
            "CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 86400000000)"
            " AS BIGINT) AS day_idx",
        ).groupBy("event_type", "day_idx").agg(
            F.count("*").cast("bigint").alias("x")
        )

    cached_barrier_view(
        spark, sf_dir, "typed_daily", build, tables=("events",)
    )
    return spark.sql(_rolling_slope_body("typed_daily"))


EVENTS_ROLLING_SLOPE_SQL = _rolling_slope_body(
    """(
        SELECT event_type,
               CAST(floor(CAST(epoch_us(ts) AS BIGINT) / 86400000000)
                    AS BIGINT) AS day_idx,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    )"""
)


# ---------------------------------------------------------------------------
# window_ohlc_bars — hourly OHLC candlestick resample per event type
# ---------------------------------------------------------------------------


def _ohlc_body(engine: str) -> str:
    """Hourly OHLC (open/high/low/close) candlestick bars of the event
    value stream per type — the resample every monitoring / financial
    dashboard draws first. Open/close are pinned by the total
    (t_us, event_id) order so ties can never wobble; money is exact
    integer cents; hour bucketing uses explicit floor() (Spark DIV
    truncates toward zero where DuckDB // floors — the round-7 advice
    class).

    Scale posture: both ROW_NUMBER windows ride ONE (type, hour)
    partitioned shuffle (bounded per-partition rows = events/hour/type),
    then a (type, hour) groupBy — never an unpartitioned window."""
    ep = ("unix_micros(CAST(ts AS TIMESTAMP))" if engine == "spark"
          else "CAST(epoch_us(ts) AS BIGINT)")
    return f"""
        WITH ev AS (
            SELECT event_type, event_id,
                   {ep} AS t_us,
                   CAST(floor({ep} / 3600000000.0) AS BIGINT) AS hour_idx,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        seq AS (
            SELECT event_type, hour_idx, cents,
                   ROW_NUMBER() OVER (PARTITION BY event_type, hour_idx
                                      ORDER BY t_us, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY event_type, hour_idx
                                      ORDER BY t_us DESC, event_id DESC)
                       AS rn_d
            FROM ev
        )
        SELECT event_type, hour_idx,
               CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT)
                   AS open_cents,
               CAST(MAX(cents) AS BIGINT) AS high_cents,
               CAST(MIN(cents) AS BIGINT) AS low_cents,
               CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT)
                   AS close_cents,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM seq
        GROUP BY event_type, hour_idx
        ORDER BY event_type, hour_idx
    """


def window_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars — see _ohlc_body."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ohlc_body("spark"))


WINDOW_OHLC_BARS_SQL = _ohlc_body("duck")


# ---------------------------------------------------------------------------
# events_burstiness_fano — Fano factor / burstiness index per type
# ---------------------------------------------------------------------------


def _fano_body(hourly_rel: str) -> str:
    """Fano factor (variance-to-mean ratio of hourly arrival counts —
    1.0 for a Poisson process, >1 bursty, <1 regular) and the
    Goh–Barabási burstiness index B = (σ−μ)/(σ+μ) per event type, over
    the GLOBAL hourly calendar (zero hours count: Σc and Σc² are over
    observed hours only, which is exact because zeros contribute
    nothing; the denominator N is the global span).

    ``hourly_rel`` provides (event_type, hour_idx, c) rows. Population
    moments come from exact BIGINT sums; σ/μ are single double
    expressions in identical order both engines, then round(…, 6).

    Scale posture: one (type, hour) partial aggregate, then everything
    runs over the |types|-row relation — the global-span window is over
    that bounded relation (whitelisted with the bound)."""
    return f"""
        WITH agg AS (
            SELECT event_type,
                   CAST(SUM(c) AS BIGINT) AS s1,
                   CAST(SUM(c * c) AS BIGINT) AS s2,
                   MIN(hour_idx) AS mn,
                   MAX(hour_idx) AS mx
            FROM {hourly_rel}
            GROUP BY event_type
        ),
        spanned AS (
            SELECT event_type, s1, s2,
                   MAX(mx) OVER () - MIN(mn) OVER () + 1 AS nh
            FROM agg
        )
        SELECT event_type,
               CAST(nh AS BIGINT) AS n_hours,
               s1 AS n_events,
               round((CAST(nh AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                     / (CAST(nh AS DOUBLE) * CAST(s1 AS DOUBLE)), 6)
                   AS fano,
               round((sqrt(CAST(nh AS DOUBLE) * CAST(s2 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / nh
                      - CAST(s1 AS DOUBLE) / nh)
                     / (sqrt(CAST(nh AS DOUBLE) * CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / nh
                        + CAST(s1 AS DOUBLE) / nh), 6) AS burstiness
        FROM spanned
        ORDER BY event_type
    """


def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor + burstiness — see _fano_body. One corpus scan into
    the (type, hour) partial aggregate; the span window runs over the
    |event_types|-row aggregate."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    hourly = """(
        SELECT event_type,
               CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 3600000000.0)
                    AS BIGINT) AS hour_idx,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    )"""
    return spark.sql(_fano_body(hourly))


EVENTS_BURSTINESS_FANO_SQL = _fano_body(
    """(
        SELECT event_type,
               CAST(floor(CAST(epoch_us(ts) AS BIGINT) / 3600000000.0)
                    AS BIGINT) AS hour_idx,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    )"""
)


# ---------------------------------------------------------------------------
# agg_regr_ridge_normal — 2-feature ridge regression via normal equations
# ---------------------------------------------------------------------------

RIDGE_LAMBDA = 1000  # L2 penalty on the slope terms (intercept unpenalized)


def _ridge_body() -> str:
    """Multivariate ridge regression (extendedprice_cents ~ quantity +
    discount_centi) solved in CLOSED FORM from the normal equations —
    the distributed-ML pattern where ONE partial-aggregated pass
    produces the (X'X, X'y) moments and the 3×3 solve is a constant
    expression (Cramer's rule), so fitting at 100 TB costs exactly one
    map-side-combined shuffle and no iteration.

    Exactness: all 9 moments are exact BIGINT power sums (max |S_xy| ≈
    3e15 at sf1 — within both BIGINT and the 2^53 double-exact range;
    beyond that the DECIMAL(38,0) widening switch applies, the
    emb_covariance precedent). Every moment is cast to DOUBLE before
    any product, and the determinant expressions are written once and
    rendered identically in both engines, so each IEEE rounding
    happens in the same order. Ridge λ = {RIDGE_LAMBDA} on the slope
    diagonal only (the standard unpenalized-intercept convention).

    Engine-shared body: valid verbatim in Spark SQL and DuckDB."""
    lam = RIDGE_LAMBDA
    # double-cast moment aliases
    m = {k: f"CAST({k} AS DOUBLE)" for k in
         ("n", "s1", "s2", "s11", "s22", "s12", "sy", "s1y", "s2y")}
    a11, a22 = f"({m['s11']} + {lam})", f"({m['s22']} + {lam})"
    det = (f"({m['n']} * ({a11} * {a22} - {m['s12']} * {m['s12']})"
           f" - {m['s1']} * ({m['s1']} * {a22} - {m['s12']} * {m['s2']})"
           f" + {m['s2']} * ({m['s1']} * {m['s12']} - {a11} * {m['s2']}))")
    det0 = (f"({m['sy']} * ({a11} * {a22} - {m['s12']} * {m['s12']})"
            f" - {m['s1']} * ({m['s1y']} * {a22} - {m['s12']} * {m['s2y']})"
            f" + {m['s2']} * ({m['s1y']} * {m['s12']} - {a11} * {m['s2y']}))")
    det1 = (f"({m['n']} * ({m['s1y']} * {a22} - {m['s12']} * {m['s2y']})"
            f" - {m['sy']} * ({m['s1']} * {a22} - {m['s12']} * {m['s2']})"
            f" + {m['s2']} * ({m['s1']} * {m['s2y']} - {m['s1y']} * {m['s2']}))")
    det2 = (f"({m['n']} * ({a11} * {m['s2y']} - {m['s1y']} * {m['s12']})"
            f" - {m['s1']} * ({m['s1']} * {m['s2y']} - {m['s1y']} * {m['s2']})"
            f" + {m['sy']} * ({m['s1']} * {m['s12']} - {a11} * {m['s2']}))")
    return f"""
        WITH obs AS (
            SELECT CAST(l_quantity AS BIGINT) AS x1,
                   CAST(round(l_discount * 100) AS BIGINT) AS x2,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        ),
        moments AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x1) AS BIGINT) AS s1,
                   CAST(SUM(x2) AS BIGINT) AS s2,
                   CAST(SUM(x1 * x1) AS BIGINT) AS s11,
                   CAST(SUM(x2 * x2) AS BIGINT) AS s22,
                   CAST(SUM(x1 * x2) AS BIGINT) AS s12,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x1 * y) AS BIGINT) AS s1y,
                   CAST(SUM(x2 * y) AS BIGINT) AS s2y
            FROM obs
        )
        SELECT n,
               CAST({lam} AS BIGINT) AS ridge_lambda,
               round({det0} / {det}, 6) AS beta0_cents,
               round({det1} / {det}, 6) AS beta_qty,
               round({det2} / {det}, 6) AS beta_discount_centi
        FROM moments
    """


def agg_regr_ridge_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form 2-feature ridge regression — see _ridge_body."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(_ridge_body())


AGG_REGR_RIDGE_NORMAL_SQL = _ridge_body()


# ---------------------------------------------------------------------------
# events_power_law_hill — Hill tail-index estimate of user activity
# ---------------------------------------------------------------------------

HILL_K = 100  # tail order statistics used by the estimator


def _hill_body(engine: str) -> str:
    """Hill estimator of the power-law tail index of per-user activity
    (Hill 1975): over the top-{HILL_K} most active users,
    α̂ = k / Σ ln(x_i / x_min) with x_min the (k+1)-th order statistic
    — the heavy-tail diagnostic behind skew planning (α ≤ 2 means
    hot-key salting is mandatory, not optional).

    Exactness: per-user counts are exact; each ln() is evaluated once
    per tail user on an exact integer ratio and rounded to micro-nats
    (the corpusops ln-ppm discipline), so the sum is an exact BIGINT
    and α̂ is one integer cross-multiplied floor. Ties at the
    truncation boundary break on user_id — deterministic in both
    engines.

    Scale posture: one scan → user-keyed counts (map-side combined) →
    ORDER BY/LIMIT {HILL_K + 1} plans as TakeOrderedAndProject
    (per-partition heaps — no global sort); the re-rank window runs
    over those {HILL_K + 1} rows (whitelisted bound)."""
    del engine  # identical on both sides
    return f"""
        WITH per_user AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id
        ),
        tail AS (
            SELECT user_id, cnt FROM per_user
            ORDER BY cnt DESC, user_id LIMIT {HILL_K + 1}
        ),
        ranked AS (
            SELECT user_id, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rk,
                   CAST(MIN(cnt) OVER () AS BIGINT) AS x_min
            FROM tail
        ),
        terms AS (
            SELECT x_min,
                   CAST(round(ln(CAST(cnt AS DOUBLE)
                                 / CAST(x_min AS DOUBLE)) * 1000000)
                        AS BIGINT) AS t
            FROM ranked WHERE rk <= {HILL_K}
        )
        -- k is the REALIZED tail size COUNT(*), not the nominal
        -- {HILL_K}: with fewer than {HILL_K}+1 users, terms has fewer
        -- rows and a fixed-k numerator biases alpha low
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(MAX(x_min) AS BIGINT) AS x_min,
               CAST(SUM(t) AS BIGINT) AS sum_log_ratio_micro,
               -- explicit floor: CAST(double AS BIGINT) truncates in
               -- Spark but ROUNDS in DuckDB
               CASE WHEN SUM(t) <= 0 THEN NULL
                    ELSE CAST(floor(COUNT(*) * 1000000000000.0 / SUM(t))
                              AS BIGINT)
               END AS hill_alpha_micro
        FROM terms
    """


def events_power_law_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate — see _hill_body."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_hill_body("spark"))


EVENTS_POWER_LAW_HILL_SQL = _hill_body("duck")


# ---------------------------------------------------------------------------
# events_alert_debounce — hysteresis alerting over the hourly error rate
# ---------------------------------------------------------------------------

_DEBOUNCE_ON = 3    # consecutive breach hours to raise
_DEBOUNCE_OFF = 2   # consecutive quiet hours to clear


def _alert_debounce_body(engine: str, hourly_from: str | None = None) -> str:
    """Debounced (hysteresis) alerting over the hourly error rate: the
    alert RAISES after {_DEBOUNCE_ON} consecutive breach hours
    (error share ≥ 5%, decided by integer cross-multiplication) and
    CLEARS after {_DEBOUNCE_OFF} consecutive quiet hours — the
    flap-suppression every pager pipeline puts in front of
    events_error_budget_burn's raw thresholds. State is expressed
    declaratively: raise/clear trigger hours via fixed trailing
    frames, current state = which trigger fired most recently.

    The hourly spine is DENSE (global min..max hour; empty hours are
    quiet) so consecutive means wall-clock consecutive, not
    consecutive-observed.

    Scale posture: one scan → the (hour) aggregate; the spine join and
    every window run over the |hours| calendar grid (whitelisted
    bound)."""
    if engine == "spark":
        ep = "unix_micros(CAST(ts AS TIMESTAMP))"
        spine = """
            SELECT s.lo + g.i AS hour_idx
            FROM span s
            LATERAL VIEW explode(sequence(0, CAST(s.hi - s.lo AS INT)))
                g AS i
        """
    else:
        ep = "CAST(epoch_us(ts) AS BIGINT)"
        spine = """
            SELECT s.lo + g.i AS hour_idx
            FROM span s CROSS JOIN UNNEST(range(0, s.hi - s.lo + 1))
                AS g(i)
        """
    # the hourly aggregate is referenced by span AND grid — the Spark
    # side passes a checkpointed view so the corpus scans once
    hourly_rel = hourly_from or f"""(
            SELECT CAST(floor({ep} / 3600000000.0) AS BIGINT) AS hour_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1
                            ELSE 0 END) AS BIGINT) AS n_errors
            FROM events GROUP BY 1
        )"""
    return f"""
        WITH hourly AS (SELECT * FROM {hourly_rel}),
        span AS (SELECT MIN(hour_idx) AS lo, MAX(hour_idx) AS hi
                 FROM hourly),
        grid AS (
            SELECT sp.hour_idx,
                   CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
                   CAST(COALESCE(h.n_errors, 0) AS BIGINT) AS n_errors
            FROM ({spine}) sp
            LEFT JOIN hourly h ON h.hour_idx = sp.hour_idx
        ),
        flagged AS (
            SELECT hour_idx, n_events, n_errors,
                   CASE WHEN n_events > 0
                         AND n_errors * 20 >= n_events THEN 1 ELSE 0
                   END AS breach
            FROM grid
        ),
        trig AS (
            SELECT hour_idx, n_events, n_errors, breach,
                   CASE WHEN SUM(breach) OVER (ORDER BY hour_idx
                            ROWS BETWEEN {_DEBOUNCE_ON - 1} PRECEDING
                            AND CURRENT ROW) = {_DEBOUNCE_ON}
                         AND COUNT(*) OVER (ORDER BY hour_idx
                            ROWS BETWEEN {_DEBOUNCE_ON - 1} PRECEDING
                            AND CURRENT ROW) = {_DEBOUNCE_ON}
                        THEN hour_idx END AS on_h,
                   CASE WHEN SUM(breach) OVER (ORDER BY hour_idx
                            ROWS BETWEEN {_DEBOUNCE_OFF - 1} PRECEDING
                            AND CURRENT ROW) = 0
                         AND COUNT(*) OVER (ORDER BY hour_idx
                            ROWS BETWEEN {_DEBOUNCE_OFF - 1} PRECEDING
                            AND CURRENT ROW) = {_DEBOUNCE_OFF}
                        THEN hour_idx END AS off_h
            FROM flagged
        ),
        state AS (
            SELECT hour_idx, n_events, n_errors, breach,
                   MAX(on_h) OVER (ORDER BY hour_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_on,
                   MAX(off_h) OVER (ORDER BY hour_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_off
            FROM trig
        )
        SELECT hour_idx, n_events, n_errors,
               CAST(breach AS BIGINT) AS breach,
               (last_on IS NOT NULL
                AND (last_off IS NULL OR last_on > last_off)) AS alert_on
        FROM state
        ORDER BY hour_idx
    """


def events_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hysteresis pager state over hourly error rates — see
    _alert_debounce_body. The hourly aggregate rides a checkpoint so
    the span and grid consumers scan the corpus once."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")

    def build():
        return spark.sql(
            "SELECT CAST(floor(unix_micros(CAST(ts AS TIMESTAMP))"
            " / 3600000000.0) AS BIGINT) AS hour_idx,"
            " CAST(COUNT(*) AS BIGINT) AS n_events,"
            " CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_errors FROM events GROUP BY 1"
        )

    hourly = cached_barrier_view(
        spark, sf_dir, "hourly_err_grid", build, tables=("events",)
    )
    return spark.sql(_alert_debounce_body("spark", hourly_from=hourly))


EVENTS_ALERT_DEBOUNCE_SQL = _alert_debounce_body("duck")


QUERIES: dict[str, tuple] = {
    "events_alert_debounce": (
        events_alert_debounce,
        EVENTS_ALERT_DEBOUNCE_SQL,
    ),
    "events_power_law_hill": (
        events_power_law_hill,
        EVENTS_POWER_LAW_HILL_SQL,
    ),
    "window_ohlc_bars": (window_ohlc_bars, WINDOW_OHLC_BARS_SQL),
    "events_burstiness_fano": (
        events_burstiness_fano,
        EVENTS_BURSTINESS_FANO_SQL,
    ),
    "agg_regr_ridge_normal": (
        agg_regr_ridge_normal,
        AGG_REGR_RIDGE_NORMAL_SQL,
    ),
    "events_rolling_slope": (events_rolling_slope,
                             EVENTS_ROLLING_SLOPE_SQL),
    "events_concurrency_peak": (
        events_concurrency_peak,
        EVENTS_CONCURRENCY_PEAK_SQL,
    ),
    "events_survival_km": (events_survival_km, EVENTS_SURVIVAL_KM_SQL),
    "agg_wilson_interval": (agg_wilson_interval, AGG_WILSON_INTERVAL_SQL),
    "events_anomaly_mad_daily": (
        events_anomaly_mad_daily,
        EVENTS_ANOMALY_MAD_DAILY_SQL,
    ),
    "agg_ttest_welch": (agg_ttest_welch, AGG_TTEST_WELCH_SQL),
    "events_top_paths": (events_top_paths, EVENTS_TOP_PATHS_SQL),
    "events_resample_interpolate": (
        events_resample_interpolate,
        EVENTS_RESAMPLE_INTERPOLATE_SQL,
    ),
    "events_entropy_rate": (events_entropy_rate, EVENTS_ENTROPY_RATE_SQL),
    "events_seasonality_weekly": (
        events_seasonality_weekly,
        EVENTS_SEASONALITY_WEEKLY_SQL,
    ),
    "events_theil_sen_trend": (
        events_theil_sen_trend,
        EVENTS_THEIL_SEN_TREND_SQL,
    ),
    "events_autocorrelation": (
        events_autocorrelation,
        EVENTS_AUTOCORRELATION_SQL,
    ),
    "sample_ks_drift": (sample_ks_drift, SAMPLE_KS_DRIFT_SQL),
    "sample_psi_drift": (sample_psi_drift, SAMPLE_PSI_DRIFT_SQL),
    "events_markov_stationary": (
        events_markov_stationary,
        EVENTS_MARKOV_STATIONARY_SQL,
    ),
    "agg_weighted_percentile": (
        agg_weighted_percentile,
        AGG_WEIGHTED_PERCENTILE_SQL,
    ),
    "agg_regr_ols": (agg_regr_ols, AGG_REGR_OLS_SQL),
    "events_cusum_changepoint": (
        events_cusum_changepoint,
        EVENTS_CUSUM_CHANGEPOINT_SQL,
    ),
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
