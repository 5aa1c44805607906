"""Business-analytics / monitoring / experimentation extensions
(round 7): RFM segmentation, max drawdown, Mann-Whitney U /
Kruskal-Wallis rank drift, Cramér's V association, Nelson-Aalen
cumulative hazard, the Benford first-digit audit, EWMA/Bollinger
smoothing with the forecast backtest, Kendall/Spearman rank
correlation and the daily correlation matrix, the Gini concentration
index, first/last-touch attribution, exact rolling DAU/WAU/MAU,
Wald-SPRT sequential testing, CUPED variance reduction, delta-method
ratio-metric CIs, SRE burn-rate alerts, winsorized means, and
week-over-week contribution decomposition.

The reference (isankadn/mongo-to-clickhouse) feeds BI dashboards from
ClickHouse (src/main.rs:890-913 dual-table insert is its terminal
stage); these are the queries such a dashboard tier actually runs on
the landed events, re-expressed Spark-first. None exist in the
reference itself — they extend the engine's analytics surface the same
way statsops/analytics_ext do.

Exactness: every cross-engine result reduces to integer arithmetic
(cents, micro-floored terms) before any aggregation whose order could
differ between engines; doubles only appear inside ONE per-row
expression evaluated identically on both sides (the KM/ACF recipe).

Scale: corpus-sized relations are touched once per query (a groupBy or
a user-partitioned window); every unpartitioned window runs over a
value-grid- or calendar-bounded aggregate, and the RFM quintiles use
operators/rank.py's two-pass distributed rank instead of a global
NTILE window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.io import load_table

# ---------------------------------------------------------------------------
# shared event prelude: epoch micros + exact cents
# ---------------------------------------------------------------------------


def _ev(engine: str) -> str:
    ep = ("unix_micros(CAST(ts AS TIMESTAMP))" if engine == "spark"
          else "CAST(epoch_us(ts) AS BIGINT)")
    return f"""SELECT user_id, event_type, event_id,
                      {ep} AS t_us,
                      CAST(floor({ep} / 86400000000) AS BIGINT) AS day_idx,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events"""


# ---------------------------------------------------------------------------
# events_rfm_segments — recency/frequency/monetary quintile cube
# ---------------------------------------------------------------------------

RFM_Q = 5


def _rfm_bucket(rk: str, n: str) -> str:
    """Rank-quantile bucket 1..Q (floor((rk-1)*Q/n)+1, capped). NOT SQL
    NTILE (whose remainder goes to the FIRST buckets); this closed form
    needs only (rank, n), so the Spark side can use the two-pass
    distributed rank with no global window. floor() is explicit:
    DuckDB CAST(double AS BIGINT) ROUNDS where Spark truncates."""
    return (f"LEAST({RFM_Q}, CAST(floor(({rk} - 1) * {RFM_Q} * 1.0 / {n})"
            f" AS BIGINT) + 1)")


EVENTS_RFM_SEGMENTS_SQL = f"""
    WITH ev AS ({_ev("duck")}),
    per_user AS (
        SELECT user_id, MAX(day_idx) AS last_day,
               CAST(COUNT(*) AS BIGINT) AS freq,
               SUM(cents) AS mon_cents
        FROM ev GROUP BY user_id
    ),
    scored AS (
        SELECT u.user_id, h.h - u.last_day AS rec_days, u.freq, u.mon_cents
        FROM per_user u
        CROSS JOIN (SELECT MAX(last_day) AS h FROM per_user) h
    ),
    ranked AS (
        SELECT user_id, rec_days, freq, mon_cents,
               ROW_NUMBER() OVER (ORDER BY rec_days, user_id) AS r_rk,
               ROW_NUMBER() OVER (ORDER BY freq DESC, user_id) AS f_rk,
               ROW_NUMBER() OVER (ORDER BY mon_cents DESC, user_id) AS m_rk,
               COUNT(*) OVER () AS n
        FROM scored
    )
    SELECT {_rfm_bucket("r_rk", "n")} AS r_q,
           {_rfm_bucket("f_rk", "n")} AS f_q,
           {_rfm_bucket("m_rk", "n")} AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(freq) AS BIGINT) AS n_events,
           CAST(SUM(mon_cents) AS BIGINT) AS mon_cents
    FROM ranked
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile cube over events (recency days / event count /
    value cents), ≤ {RFM_Q}³ output cells.

    Scale posture: ONE corpus scan collapses to the per-user aggregate;
    the three quantile ranks run as ONE fused literal-bounds rank pass
    over a stacked (t, skey) relation (round 12 — see the inline note),
    so no global-order window ever sees the |users| relation in one
    task. The bucket closed form then needs only (rank, n)."""
    from mongo_to_clickhouse_spark.operators.materialize import barrier

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    # barrier: the per-user aggregate feeds THREE rank passes (each with
    # its own sampling+rank subtrees) plus the horizon row — without it
    # the corpus scan re-runs per consumer (measured 2.3 s -> the scan
    # runs once with it)
    per_user = barrier(spark.sql(f"""
        WITH ev AS ({_ev("spark")})
        SELECT user_id, MAX(day_idx) AS last_day,
               CAST(COUNT(*) AS BIGINT) AS freq,
               SUM(cents) AS mon_cents
        FROM ev GROUP BY user_id
    """))
    # round 11: the three quintile ranks were CHAINED, each pass
    # checkpointing the previous one (three serial write/read barriers,
    # each a ~0.5-1 s fixed-latency job before any data cost). They are
    # independent per-user orderings — run them as narrow branches on
    # the literal-bounds partitioner and re-attach by user_id equi-join
    # (guide §2.4: remove shuffles/barriers outright; §2.3: shuffle only
    # the needed columns). ALL bucket boundaries, the recency horizon
    # and the user count ride ONE driver aggregate over the checkpointed
    # per-user relation (bucketing recency by -last_day, which is
    # monotone in rec_days = h - last_day, so the horizon need not be
    # known before the bounds pass).
    from mongo_to_clickhouse_spark.operators.rank import literal_bounds
    from mongo_to_clickhouse_spark.operators.rank import (
        _default_partitions,
    )

    nparts = _default_partitions(spark, per_user)
    uid = F.col("user_id")
    bounds = literal_bounds(
        per_user,
        {
            "r": (-F.col("last_day"), uid),
            "f": (-F.col("freq"), uid),
            "m": (-F.col("mon_cents"), uid),
        },
        nparts,
        extra_aggs={
            "h": F.max("last_day"),
            "n": F.count("*").cast("bigint"),
        },
    )
    h = bounds["__extras__"]["h"]
    n_users = bounds["__extras__"]["n"]

    # Round 12 (guide §2.4, the same fusion profile_layout_locality got
    # in round 11): the three quintile ranks were three INDEPENDENT
    # literal-bounds branches — 3 partitioned-window exchanges + 3 count
    # aggregates, each scanning the per-user barrier twice (6 scans).
    # They now ``stack`` into ONE 3n-row (t, skey) relation ranked by a
    # single window keyed on (t, __pid): one window exchange carrying
    # the same total bytes the three branch exchanges moved, 2 barrier
    # scans instead of 6. skey is the ASC-monotone numeric for each
    # ordering (−last_day ≡ rec_days−h, −freq, −mon_cents — exactly the
    # bucket keys the shared literal_bounds pass measured); freq and
    # mon_cents ride only the 'r' rows, as before. The pivot reassembly
    # (one user_id exchange, no join back to per_user) is unchanged.
    from pyspark.sql.window import Window

    ex = per_user.select(
        "user_id",
        F.expr(
            "stack(3,"
            " 'r', -last_day, freq, mon_cents,"
            " 'f', -freq, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),"
            " 'm', -mon_cents, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)"
            ") AS (t, skey, freq, mon_cents)"
        ),
    )
    from mongo_to_clickhouse_spark.operators.rank import _pid_expr

    pid = (
        F.when(F.col("t") == "r",
               _pid_expr(bounds["r"], F.col("skey"), F.col("user_id")))
        .when(F.col("t") == "f",
              _pid_expr(bounds["f"], F.col("skey"), F.col("user_id")))
        .otherwise(_pid_expr(bounds["m"], F.col("skey"),
                             F.col("user_id")))
    )
    parted = ex.withColumn("__pid", pid)
    local = parted.withColumn(
        "__lrank",
        F.row_number().over(
            Window.partitionBy("t", "__pid").orderBy("skey", "user_id")
        ),
    )
    counts = parted.groupBy("t", "__pid").agg(F.count("*").alias("__cnt"))
    prior = counts.select(
        F.col("t").alias("__qt"),
        F.col("__pid").alias("__qid"),
        F.col("__cnt").alias("__prior"),
    )
    offsets = (
        counts.join(
            F.broadcast(prior),
            (F.col("__qt") == F.col("t"))
            & (F.col("__qid") < F.col("__pid")),
            "left",
        )
        .groupBy("t", "__pid")
        .agg(F.coalesce(F.sum("__prior"), F.lit(0)).alias("__off"))
    )
    u = local.join(F.broadcast(offsets), ["t", "__pid"]).select(
        "user_id", "t",
        (F.col("__off") + F.col("__lrank")).cast("bigint").alias("rk"),
        "freq", "mon_cents",
    )
    piv = u.groupBy("user_id").agg(
        F.max(F.when(F.col("t") == "r", F.col("rk"))).alias("r_rk"),
        F.max(F.when(F.col("t") == "f", F.col("rk"))).alias("f_rk"),
        F.max(F.when(F.col("t") == "m", F.col("rk"))).alias("m_rk"),
        F.max("freq").alias("freq"),
        F.max("mon_cents").alias("mon_cents"),
    )
    piv.withColumn(
        "n", F.lit(n_users).cast("bigint")
    ).createOrReplaceTempView("rfm_ranked")
    return spark.sql(f"""
        SELECT {_rfm_bucket("r_rk", "n")} AS r_q,
               {_rfm_bucket("f_rk", "n")} AS f_q,
               {_rfm_bucket("m_rk", "n")} AS m_q,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(freq) AS BIGINT) AS n_events,
               CAST(SUM(mon_cents) AS BIGINT) AS mon_cents
        FROM rfm_ranked
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """)


# ---------------------------------------------------------------------------
# window_max_drawdown — per-user peak-to-trough of the running value sum
# ---------------------------------------------------------------------------

DRAWDOWN_TOP = 100


def _drawdown_body(engine: str) -> str:
    return f"""
        WITH ev AS ({_ev(engine)}),
        cum AS (
            SELECT user_id, t_us, event_id, cents,
                   SUM(cents) OVER w AS bal
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        dd AS (
            SELECT user_id,
                   (MAX(bal) OVER w2) - bal AS draw
            FROM cum
            WINDOW w2 AS (PARTITION BY user_id ORDER BY t_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, CAST(MAX(draw) AS BIGINT) AS max_drawdown_cents
        FROM dd GROUP BY user_id
        ORDER BY max_drawdown_cents DESC, user_id
        LIMIT {DRAWDOWN_TOP}
    """


def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user maximum drawdown of the running event-value balance
    (peak minus current, both as exact cents), top {DRAWDOWN_TOP}.

    Scale posture: both windows partition by user_id (one shuffle,
    reused by Spark for both frames); the final global order is an
    ORDER/LIMIT → TakeOrderedAndProject, never a full sort."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_drawdown_body("spark"))


WINDOW_MAX_DRAWDOWN_SQL = _drawdown_body("duck")


# ---------------------------------------------------------------------------
# agg_mann_whitney_u — rank-sum drift test between two event populations
# ---------------------------------------------------------------------------

MWU_A, MWU_B = "click", "error"


def _mwu_body(engine: str) -> str:
    """Engine-shared Mann-Whitney U with tie-averaged ranks and the
    tie-corrected normal approximation. All rank machinery runs on the
    per-cents tie-group aggregate (value-grid-bounded): doubled rank
    sums (2R = Σ n_a·(min_rn+max_rn)) and the tie term Σ(t³-t) are
    exact BIGINTs; z is ONE double expression over those integers,
    floored to micro."""
    return f"""
        WITH ev AS ({_ev(engine)}),
        ties AS (
            SELECT cents,
                   CAST(SUM(CASE WHEN event_type = '{MWU_A}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS na_c,
                   CAST(SUM(CASE WHEN event_type = '{MWU_B}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS nb_c
            FROM ev WHERE event_type IN ('{MWU_A}', '{MWU_B}')
            GROUP BY cents
        ),
        spans AS (
            SELECT cents, na_c, nb_c, na_c + nb_c AS t,
                   SUM(na_c + nb_c) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM ties
        ),
        stats AS (
            SELECT SUM(na_c) AS n1, SUM(nb_c) AS n2,
                   SUM(na_c * (2 * (cum - t) + 1 + t)) AS r1_x2,
                   SUM(t * t * t - t) AS tie3
            FROM spans
        )
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
               -- degenerate guard (the agg_ttest_welch ADVICE class):
               -- an empty side, n<2, or an all-tied sample zeroes the
               -- variance — report NULL, not a div-by-zero artifact
               CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 2
                         OR (n1 + n2 + 1)
                            - tie3 / (1e0 * (n1 + n2) * (n1 + n2 - 1))
                            <= 0
                    THEN NULL
                    ELSE CAST(floor(
                   ((r1_x2 - n1 * (n1 + 1)) - n1 * n2) / 2.0
                   / sqrt(n1 * n2 / 12.0
                          * ((n1 + n2 + 1)
                             - tie3 / (1e0 * (n1 + n2) * (n1 + n2 - 1))))
                   * 1000000) AS BIGINT) END AS z_micro
        FROM stats
    """


def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U ('{MWU_A}' vs '{MWU_B}' value populations) — see
    _mwu_body. The nonparametric sibling of agg_ttest_welch
    (statsops.py): detects distribution drift with no normality
    assumption, the standard A/B gate when values are heavy-tailed.

    Scale posture: one corpus scan → per-cents tie groups (map-side
    combined, value-grid-bounded); the single unpartitioned running sum
    walks that bounded grid, never corpus rows (the eval_score_auc /
    sample_ks_drift precedent in tests/test_plan_hygiene.py)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_mwu_body("spark"))


AGG_MANN_WHITNEY_U_SQL = _mwu_body("duck")


# ---------------------------------------------------------------------------
# agg_cramers_v — association strength between two categoricals
# ---------------------------------------------------------------------------


def _cramers_body(engine: str) -> str:
    """Cramér's V over the c_mktsegment × c_nationkey contingency.
    Per-cell chi² terms floor to micro BIGINT first (deterministic
    integer total regardless of either engine's summation order); V is
    one double expression over the exact total."""
    return """
        WITH cells AS (
            SELECT c_mktsegment AS seg, c_nationkey AS nat,
                   CAST(COUNT(*) AS BIGINT) AS o
            FROM customer GROUP BY 1, 2
        ),
        -- full margin grid (row-totals × col-totals), LEFT-joined to the
        -- observed cells: EMPTY cells still contribute (0-e)²/e = e to
        -- chi², so they cannot be dropped by the GROUP BY
        margins AS (
            SELECT r.seg, k.nat, COALESCE(c.o, 0) AS o,
                   r.rt, k.ct, t.n
            FROM (SELECT seg, SUM(o) AS rt FROM cells GROUP BY seg) r
            CROSS JOIN (SELECT nat, SUM(o) AS ct FROM cells GROUP BY nat) k
            LEFT JOIN cells c ON c.seg = r.seg AND c.nat = k.nat
            CROSS JOIN (SELECT SUM(o) AS n FROM cells) t
        ),
        terms AS (
            SELECT n,
                   CAST(floor(
                       (o - rt * ct / (1e0 * n))
                       * (o - rt * ct / (1e0 * n))
                       / (rt * ct / (1e0 * n)) * 1000000) AS BIGINT)
                       AS term_micro,
                   rt, ct
            FROM margins
        ),
        dims AS (
            SELECT COUNT(DISTINCT seg) AS r, COUNT(DISTINCT nat) AS c
            FROM cells
        )
        SELECT CAST(MAX(t.n) AS BIGINT) AS n,
               CAST(MAX(d.r) AS BIGINT) AS n_rows,
               CAST(MAX(d.c) AS BIGINT) AS n_cols,
               CAST(SUM(t.term_micro) AS BIGINT) AS chi2_micro,
               CAST(floor(sqrt(SUM(t.term_micro) / 1e6
                               / (MAX(t.n)
                                  * (LEAST(MAX(d.r), MAX(d.c)) - 1)))
                          * 1000000) AS BIGINT) AS cramers_v_micro
        FROM terms t CROSS JOIN dims d
    """


def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V (bias-uncorrected) for market segment × nation —
    see _cramers_body. Completes the association toolkit next to
    profile_chi2_independence (sampleops.py), which tests the SAME
    hypothesis but does not report effect size.

    Scale posture: one scan → |segments|·|nations| contingency cells
    (map-side combined); margins join on the bounded cell relation;
    no windows at all."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_cramers_body("spark"))


AGG_CRAMERS_V_SQL = _cramers_body("duck")


# ---------------------------------------------------------------------------
# events_hazard_nelson_aalen — cumulative hazard of time-to-purchase
# ---------------------------------------------------------------------------


def _na_body(engine: str) -> str:
    """Nelson-Aalen estimator over a KM-style duration construction:
    per user, hours from FIRST event to FIRST subsequent 'purchase';
    censored at the user's last event if none. H(t) = Σ d_i/n_i and
    its variance Σ d_i/n_i² accumulate as micro-rounded integer terms
    (exact cumulative sums in both engines)."""
    return f"""
        WITH ev AS ({_ev(engine)}),
        first_ev AS (
            SELECT user_id, MIN(t_us) AS t0, MAX(t_us) AS t_last
            FROM ev GROUP BY user_id
        ),
        conv AS (
            SELECT e.user_id, MIN(e.t_us) AS t_conv
            FROM ev e JOIN first_ev f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase' AND e.t_us > f.t0
            GROUP BY e.user_id
        ),
        durations AS (
            SELECT f.user_id,
                   CAST(floor((COALESCE(c.t_conv, f.t_last) - f.t0)
                              / 3600000000.0) AS BIGINT) AS dur_h,
                   CASE WHEN c.t_conv IS NULL THEN 0 ELSE 1 END AS ev_flag
            FROM first_ev f LEFT JOIN conv c ON f.user_id = c.user_id
        ),
        buckets AS (
            SELECT dur_h,
                   CAST(SUM(ev_flag) AS BIGINT) AS d,
                   CAST(SUM(1 - ev_flag) AS BIGINT) AS c
            FROM durations GROUP BY dur_h
        ),
        at_risk AS (
            SELECT dur_h, d, c,
                   CAST(SUM(d + c) OVER (ORDER BY dur_h DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS n_risk
            FROM buckets
        ),
        terms AS (
            SELECT dur_h, d, n_risk,
                   CAST(round(d * 1000000.0 / n_risk) AS BIGINT) AS h_t,
                   CAST(round(d * 1000000000000.0 / n_risk / n_risk)
                        AS BIGINT) AS v_t
            FROM at_risk
        )
        SELECT dur_h, d AS n_converted, n_risk,
               CAST(SUM(h_t) OVER (ORDER BY dur_h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS hazard_micro,
               CAST(SUM(v_t) OVER (ORDER BY dur_h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS hazard_var_pico
        FROM terms
        WHERE d > 0
        ORDER BY dur_h
    """


def events_hazard_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of first-event → first-purchase —
    see _na_body. Reads alongside events_survival_km: H(t) is the
    KM curve's additive dual (S ≈ exp(-H)) with a simpler variance,
    the standard monitoring overlay for conversion-latency drift.

    Scale posture: corpus rows collapse to per-user firsts in one
    map-side-combined pass; every window thereafter walks the
    observation-window-hours duration-bucket aggregate (same bound as
    events_survival_km's whitelist entry)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_na_body("spark"))


EVENTS_HAZARD_NELSON_AALEN_SQL = _na_body("duck")


# ---------------------------------------------------------------------------
# profile_benford_deviation — first-digit fraud/audit screen
# ---------------------------------------------------------------------------


def _benford_body(engine: str) -> str:
    """First significant digit of l_extendedprice (exact: leading char
    of the cents integer rendered as text — no log10 float boundary)
    vs the Benford expectation log10(1+1/d). Per-digit chi² terms
    floor to micro; the total rides a broadcast 1-row aggregate, not a
    window."""
    cents_str = ("CAST(CAST(round(l_extendedprice * 100) AS BIGINT)"
                 " AS STRING)" if engine == "spark" else
                 "CAST(CAST(round(l_extendedprice * 100) AS BIGINT)"
                 " AS VARCHAR)")
    return f"""
        WITH digits AS (
            SELECT CAST(substr({cents_str}, 1, 1) AS BIGINT) AS digit,
                   CAST(COUNT(*) AS BIGINT) AS o
            FROM lineitem
            WHERE l_extendedprice > 0
            GROUP BY 1
        ),
        scored AS (
            SELECT d.digit, d.o, t.n,
                   CAST(floor(t.n * log10(1 + 1.0 / d.digit) * 1000000)
                        AS BIGINT) AS expected_micro,
                   CAST(floor(
                       (d.o - t.n * log10(1 + 1.0 / d.digit))
                       * (d.o - t.n * log10(1 + 1.0 / d.digit))
                       / (t.n * log10(1 + 1.0 / d.digit))
                       * 1000000) AS BIGINT) AS term_micro
            FROM digits d
            CROSS JOIN (SELECT SUM(o) AS n FROM digits) t
        )
        SELECT s.digit, s.o AS observed, s.expected_micro, s.term_micro,
               tot.chi2_micro
        FROM scored s
        CROSS JOIN (SELECT CAST(SUM(term_micro) AS BIGINT) AS chi2_micro
                    FROM scored) tot
        ORDER BY s.digit
    """


def profile_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over l_extendedprice — see
    _benford_body. The classic data-forensics screen (fabricated or
    truncated monetary columns drift from log10(1+1/d)); belongs to
    the profile_* data-quality tier (sampleops.py).

    Scale posture: one scan → 9-row digit aggregate (map-side
    combined); everything downstream is on ≤9 rows via broadcast
    1-row totals — no windows, no second scan."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_benford_body("spark"))


PROFILE_BENFORD_DEVIATION_SQL = _benford_body("duck")


# ---------------------------------------------------------------------------
# shared daily barrier: per-type daily cents totals (calendar-bounded)
# ---------------------------------------------------------------------------


def _daily(engine: str) -> str:
    """|types| x |days| relation of nonnegative daily cents totals.
    The cents >= 0 filter is load-bearing for the EWMA/Bollinger exact
    integer divisions below: both engines' integer div/mod agree only
    for nonnegative numerators (Spark `div` truncates, DuckDB `//`
    floors)."""
    return f"""SELECT event_type, day_idx,
                      CAST(SUM(cents) AS BIGINT) AS cents
               FROM ({_ev(engine)}) WHERE cents >= 0
               GROUP BY event_type, day_idx"""


# ---------------------------------------------------------------------------
# events_ewma_smooth — truncated EWMA of the daily value series
# ---------------------------------------------------------------------------

EWMA_TERMS = 12          # alpha = 1/4, lags 0..11, zero-padded warmup
_EWMA_DEN = 4 ** EWMA_TERMS  # 16,777,216 = 2^24


def _ewma_num(engine: str) -> str:
    """Sigma_k 3^k * 4^(11-k) * lag_k(cents): the alpha(1-alpha)^k
    weights over the common denominator 4^12, as ONE exact BIGINT.
    lag defaults to 0 (zero-padded truncated EWMA — documented; the
    first 11 days under-weight exactly like adjust=False warmup)."""
    terms = " + ".join(
        f"{3 ** k * 4 ** (EWMA_TERMS - 1 - k)} * "
        f"COALESCE(lag(cents, {k}) OVER w, CAST(0 AS BIGINT))"
        for k in range(EWMA_TERMS)
    )
    del engine  # identical on both sides
    return terms


def _ewma_body(engine: str) -> str:
    return f"""
        WITH daily AS ({_daily(engine)}),
        num AS (
            SELECT event_type, day_idx, cents,
                   CAST({_ewma_num(engine)} AS BIGINT) AS n4
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)
        )
        SELECT event_type, day_idx, cents,
               -- exact micro-cents: (n4 / 4^12) * 1e6 in BIGINT via
               -- quotient/remainder split (n4 >= 0 by the daily filter,
               -- so div and // agree); no double ever touches the value
               CAST((n4 {'div' if engine == 'spark' else '//'} {_EWMA_DEN})
                    * 1000000
                    + ((n4 % {_EWMA_DEN}) * 1000000)
                      {'div' if engine == 'spark' else '//'} {_EWMA_DEN}
                    AS BIGINT) AS ewma_cents_micro
        FROM num
        ORDER BY event_type, day_idx
    """


def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=1/4) of each event
    type's daily cents total, truncated at {EWMA_TERMS} lags — see
    _ewma_body. The monitoring smoother that events_daily_ma_residual's
    boxcar cannot replace (EWMA reacts in O(1/alpha) days with no
    cliff when an outlier exits the window).

    Scale posture: corpus rows collapse to the calendar-bounded daily
    barrier in one map-side-combined pass; the lag window partitions
    by event_type over that aggregate. The weighted sum is ONE exact
    BIGINT per row — bit-identical across engines and shuffle orders."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ewma_body("spark"))


EVENTS_EWMA_SMOOTH_SQL = _ewma_body("duck")


# ---------------------------------------------------------------------------
# events_bollinger_bands — trailing mean +/- 2 sigma with exact breach test
# ---------------------------------------------------------------------------

BOLL_WINDOW = 20  # trailing days per band


def _boll_body(engine: str) -> str:
    """Bollinger bands over the daily barrier: trailing {BOLL_WINDOW}-day
    (n, Sigma x, Sigma x^2) as exact BIGINT frame sums; bands are ONE
    double expression per row; the breach FLAG is decided in exact
    integer arithmetic — cents > mean + 2*sigma iff
    (cents*n - s1) > 0 AND (cents*n - s1)^2 > 4*(n*s2 - s1^2) — so the
    flag can never wobble on a float boundary. BIGINT headroom: daily
    cents <= ~3e8 keeps n*s2 under 2^63 through sf1; beyond that the
    EngineTuning.exact_sum_decimal widening applies (config.py)."""
    return f"""
        WITH daily AS ({_daily(engine)}),
        frames AS (
            SELECT event_type, day_idx, cents,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n,
                   CAST(SUM(cents) OVER w AS BIGINT) AS s1,
                   CAST(SUM(cents * cents) OVER w AS BIGINT) AS s2
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                         ROWS BETWEEN {BOLL_WINDOW - 1} PRECEDING
                         AND CURRENT ROW)
        )
        SELECT event_type, day_idx, cents,
               CAST((s1 * 1000000)
                    {'div' if engine == 'spark' else '//'} n
                    AS BIGINT) AS mean_cents_micro,
               CAST(floor((s1 * 1e0 / n
                           + 2 * sqrt(GREATEST(n * s2 - s1 * s1, 0)) / n)
                          * 1000000) AS BIGINT) AS upper_cents_micro,
               CAST(floor((s1 * 1e0 / n
                           - 2 * sqrt(GREATEST(n * s2 - s1 * s1, 0)) / n)
                          * 1000000) AS BIGINT) AS lower_cents_micro,
               CASE WHEN (cents * n - s1) > 0
                         AND (cents * n - s1) * (cents * n - s1)
                             > 4 * (n * s2 - s1 * s1)
                    THEN 1
                    WHEN (cents * n - s1) < 0
                         AND (cents * n - s1) * (cents * n - s1)
                             > 4 * (n * s2 - s1 * s1)
                    THEN -1
                    ELSE 0 END AS breach
        FROM frames
        ORDER BY event_type, day_idx
    """


def events_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {BOLL_WINDOW}-day Bollinger bands (mean +/- 2 sigma) per
    event type with an exact-integer breach flag — see _boll_body. The
    volatility-aware anomaly overlay next to events_anomaly_zscore
    (global z) and events_anomaly_mad_daily (robust): bands ADAPT to
    local variance, the dashboard staple.

    Scale posture: one corpus scan to the daily barrier; bounded-frame
    window partitioned by event_type; GREATEST(...) guards the
    single-row frame (variance 0)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_boll_body("spark"))


EVENTS_BOLLINGER_BANDS_SQL = _boll_body("duck")


# ---------------------------------------------------------------------------
# agg_kendall_tau_daily — concordance between two daily metric series
# ---------------------------------------------------------------------------

KT_A, KT_B = "click", "purchase"


def _kendall_body(engine: str) -> str:
    """Kendall tau-b between the {KT_A} and {KT_B} daily cents series:
    the day-pair join is |calendar|^2-bounded; concordant/discordant/
    tie counts are exact BIGINTs; tau_b is ONE double expression over
    them (micro-floored)."""
    return f"""
        WITH daily AS ({_daily(engine)}),
        wide AS (
            SELECT day_idx,
                   CAST(SUM(CASE WHEN event_type = '{KT_A}'
                                 THEN cents ELSE 0 END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN event_type = '{KT_B}'
                                 THEN cents ELSE 0 END) AS BIGINT) AS b
            FROM daily WHERE event_type IN ('{KT_A}', '{KT_B}')
            GROUP BY day_idx
        ),
        pairs AS (
            SELECT CASE WHEN (x.a - y.a) * (x.b - y.b) > 0
                        THEN 1 ELSE 0 END AS conc,
                   CASE WHEN (x.a - y.a) * (x.b - y.b) < 0
                        THEN 1 ELSE 0 END AS disc,
                   CASE WHEN x.a = y.a AND x.b <> y.b
                        THEN 1 ELSE 0 END AS tie_a,
                   CASE WHEN x.b = y.b AND x.a <> y.a
                        THEN 1 ELSE 0 END AS tie_b,
                   CASE WHEN x.a = y.a AND x.b = y.b
                        THEN 1 ELSE 0 END AS tie_ab
            FROM wide x JOIN wide y ON x.day_idx < y.day_idx
        ),
        counts AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n0,
                   CAST(SUM(conc) AS BIGINT) AS c,
                   CAST(SUM(disc) AS BIGINT) AS d,
                   CAST(SUM(tie_a) + SUM(tie_ab) AS BIGINT) AS ta,
                   CAST(SUM(tie_b) + SUM(tie_ab) AS BIGINT) AS tb
            FROM pairs
        )
        SELECT n0 AS n_pairs, c AS concordant, d AS discordant,
               ta AS ties_a, tb AS ties_b,
               CASE WHEN n0 = ta OR n0 = tb THEN NULL
                    ELSE CAST(floor((c - d) * 1e0
                              / sqrt((n0 - ta) * 1e0 * (n0 - tb))
                              * 1000000) AS BIGINT) END AS tau_b_micro
        FROM counts
    """


def agg_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b concordance between the daily {KT_A} and {KT_B}
    revenue series — see _kendall_body. The robust do-they-move-
    together check next to agg_regr_ols (linear) and
    events_theil_sen_trend (median slope): tau survives monotone
    transformations and outlier days.

    Scale posture: corpus rows collapse to the calendar-bounded wide
    daily relation; the pair join is |calendar|^2 <= a few 10^4 cells
    regardless of corpus size; no windows at all."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_kendall_body("spark"))


AGG_KENDALL_TAU_DAILY_SQL = _kendall_body("duck")


# ---------------------------------------------------------------------------
# agg_spearman_rho_daily — rank correlation between the same two series
# ---------------------------------------------------------------------------


def _spearman_body(engine: str) -> str:
    """Spearman rho via Pearson on DOUBLED tie-averaged ranks (2r =
    2*min_rank + t - 1, an exact integer even for .5 average ranks).
    All five power sums are exact BIGINTs over the calendar-bounded
    daily relation; rho is ONE double expression (micro-floored)."""
    return f"""
        WITH daily AS ({_daily(engine)}),
        wide AS (
            SELECT day_idx,
                   CAST(SUM(CASE WHEN event_type = '{KT_A}'
                                 THEN cents ELSE 0 END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN event_type = '{KT_B}'
                                 THEN cents ELSE 0 END) AS BIGINT) AS b
            FROM daily WHERE event_type IN ('{KT_A}', '{KT_B}')
            GROUP BY day_idx
        ),
        ranked AS (
            SELECT day_idx,
                   2 * RANK() OVER (ORDER BY a)
                     + COUNT(*) OVER (PARTITION BY a) - 1 AS ra2,
                   2 * RANK() OVER (ORDER BY b)
                     + COUNT(*) OVER (PARTITION BY b) - 1 AS rb2
            FROM wide
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(ra2) AS BIGINT) AS sx,
                   CAST(SUM(rb2) AS BIGINT) AS sy,
                   CAST(SUM(ra2 * rb2) AS BIGINT) AS sxy,
                   CAST(SUM(ra2 * ra2) AS BIGINT) AS sxx,
                   CAST(SUM(rb2 * rb2) AS BIGINT) AS syy
            FROM ranked
        )
        SELECT n AS n_days,
               CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy
                    THEN NULL
                    ELSE CAST(floor((n * sxy - sx * sy) * 1e0
                              / sqrt((n * sxx - sx * sx) * 1e0
                                     * (n * syy - sy * sy))
                              * 1000000) AS BIGINT) END AS rho_micro
        FROM sums
    """


def agg_spearman_rho_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the daily {KT_A} and {KT_B}
    revenue series — see _spearman_body. Kendall's O(n^2)-free sibling
    (rank-Pearson): the pair for cross-checking monotone association,
    standard in metric-health dashboards.

    Scale posture: the rank windows run over the calendar-bounded
    daily relation (<= |days| rows), never corpus rows — whitelisted in
    tests/test_plan_hygiene.py with that bound; everything else is one
    map-side-combined scan plus 1-row aggregates."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_spearman_body("spark"))


AGG_SPEARMAN_RHO_DAILY_SQL = _spearman_body("duck")


# ---------------------------------------------------------------------------
# agg_kruskal_wallis — k-group rank drift across ALL event types
# ---------------------------------------------------------------------------


def _kw_body(engine: str, ties_from: str | None = None) -> str:
    """Kruskal-Wallis H across all event types' value populations, on
    the per-cents tie-group aggregate (the agg_mann_whitney_u spans
    technique generalized to k groups). Doubled rank sums R2_j are
    exact BIGINTs; each group's R2_j^2/(4 n_j) term is floored to a
    unit BIGINT before the k-row sum (order-free); H and the
    tie-corrected H' are single double expressions.

    ``ties_from``: pre-materialized (cents, event_type, cnt) tie grid
    (Spark path) — inline, ties/spans/terms are each referenced twice
    downstream and Catalyst re-expanded the chain into five corpus
    scans; with the value-grid checkpointed it plans zero. The
    '__BODY__' sentinel returns the tie-grid SQL itself so the barrier
    build and this body can never drift apart."""
    ties_body = f"""
        WITH ev AS ({_ev(engine)})
        SELECT cents, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ev GROUP BY cents, event_type
    """
    if ties_from == "__BODY__":
        return ties_body
    ties_rel = (
        f"ties AS (SELECT * FROM {ties_from})" if ties_from
        else f"ties AS ({ties_body})"
    )
    return f"""
        WITH {ties_rel},
        spans AS (
            SELECT cents,
                   CAST(SUM(cnt) AS BIGINT) AS t,
                   CAST(SUM(SUM(cnt)) OVER (ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM ties GROUP BY cents
        ),
        group_r AS (
            SELECT ti.event_type,
                   CAST(SUM(ti.cnt) AS BIGINT) AS n_j,
                   CAST(SUM(ti.cnt * (2 * (s.cum - s.t) + 1 + s.t))
                        AS BIGINT) AS r2_j
            FROM ties ti JOIN spans s ON ti.cents = s.cents
            GROUP BY ti.event_type
        ),
        terms AS (
            SELECT event_type, n_j, r2_j,
                   CAST(floor(r2_j * 1e0 * r2_j / (4e0 * n_j))
                        AS BIGINT) AS term
            FROM group_r
        ),
        tot AS (
            SELECT CAST(SUM(n_j) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(term) AS BIGINT) AS sum_terms
            FROM terms
        ),
        tiesum AS (
            SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie3 FROM spans
        )
        SELECT t.event_type, t.n_j, t.r2_j,
               g.h_micro,
               CASE WHEN g.corr <= 0 THEN NULL
                    ELSE CAST(floor(g.h_micro / g.corr) AS BIGINT)
                    END AS h_tie_corr_micro
        FROM terms t
        CROSS JOIN (
            SELECT CAST(floor((12e0 * tot.sum_terms
                               / (tot.n * 1e0 * (tot.n + 1))
                               - 3e0 * (tot.n + 1)) * 1000000)
                        AS BIGINT) AS h_micro,
                   1e0 - tiesum.tie3
                       / (tot.n * 1e0 * tot.n * tot.n - tot.n) AS corr
            FROM tot CROSS JOIN tiesum
        ) g
        ORDER BY t.event_type
    """


def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across ALL event types' value distributions —
    see _kw_body. Completes the drift-test ladder: KS (2-sample
    shape), Mann-Whitney (2-sample location), Welch t (2-sample mean),
    Kruskal-Wallis (k-sample location) — the omnibus gate before
    pairwise drill-down.

    Scale posture: one corpus scan to the CHECKPOINTED (cents, type)
    tie grid (map-side combined, value-grid-bounded — see _kw_body's
    ties_from note); the single unpartitioned running sum walks the
    per-cents grid (the agg_mann_whitney_u whitelist class);
    everything downstream is k+1 rows."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    def build():
        load_table(spark, sf_dir, "events").createOrReplaceTempView(
            "events"
        )
        return spark.sql(_kw_body("spark", ties_from="__BODY__"))

    ties = cached_barrier_view(
        spark, sf_dir, "kw_ties", build, tables=("events",)
    )
    return spark.sql(_kw_body("spark", ties_from=ties))


AGG_KRUSKAL_WALLIS_SQL = _kw_body("duck")


# ---------------------------------------------------------------------------
# agg_sprt_sequential — Wald sequential A/B test, fully integer
# ---------------------------------------------------------------------------

import math as _math

SPRT_P0, SPRT_P1 = 0.15, 0.25   # H0/H1 conversion rates (purchase share)
SPRT_ALPHA = 0.05               # = beta
# constant per-observation log-likelihood increments, micro-nats —
# computed ONCE here and embedded as identical integer literals in both
# engines, so the whole test is exact BIGINT arithmetic (no runtime ln)
_SPRT_L1 = round(_math.log(SPRT_P1 / SPRT_P0) * 1e6)            # success
_SPRT_L0 = round(_math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * 1e6)  # failure
_SPRT_A = round(_math.log((1 - SPRT_ALPHA) / SPRT_ALPHA) * 1e6)   # accept H1
_SPRT_B = -_SPRT_A                                                # accept H0


def _sprt_body(engine: str) -> str:
    """Wald SPRT on the daily purchase-conversion stream, one test per
    user-parity arm: day t adds x_t*L1 + (n_t - x_t)*L0 micro-nats
    (constant integer factors), the cumulative walk crosses ±ln(19) to
    decide. Every value is exact BIGINT; the only window walks the
    calendar per arm."""
    return f"""
        WITH ev AS ({_ev(engine)}),
        daily AS (
            SELECT user_id % 2 AS arm, day_idx,
                   CAST(COUNT(*) AS BIGINT) AS trials,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS conv
            FROM ev GROUP BY user_id % 2, day_idx
        ),
        walk AS (
            SELECT arm, day_idx, trials, conv,
                   CAST(SUM(conv * {_SPRT_L1}
                            + (trials - conv) * {_SPRT_L0})
                        OVER (PARTITION BY arm ORDER BY day_idx
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS llr_micro
            FROM daily
        )
        SELECT arm, day_idx, trials, conv, llr_micro,
               CASE WHEN llr_micro >= {_SPRT_A} THEN 'accept_h1'
                    WHEN llr_micro <= {_SPRT_B} THEN 'accept_h0'
                    ELSE 'continue' END AS state,
               MIN(CASE WHEN llr_micro >= {_SPRT_A}
                         OR llr_micro <= {_SPRT_B}
                        THEN day_idx END)
                   OVER (PARTITION BY arm) AS first_decision_day
        FROM walk
        ORDER BY arm, day_idx
    """


def agg_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability-ratio test (H0 p={SPRT_P0} vs H1
    p={SPRT_P1}, alpha=beta={SPRT_ALPHA}) on each arm's daily purchase
    conversions — see _sprt_body. The ALWAYS-VALID monitoring gate the
    fixed-horizon tests (Welch/MWU/KW) cannot give: peeking at the
    cumulative walk any day keeps the error guarantees, so dashboards
    can stop experiments early.

    Scale posture: one corpus scan to the (arm, day) aggregate; the
    cumulative walk and the decision-day window run over the
    calendar-bounded relation, partitioned by arm."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_sprt_body("spark"))


AGG_SPRT_SEQUENTIAL_SQL = _sprt_body("duck")


# ---------------------------------------------------------------------------
# events_forecast_ewma_backtest — next-day forecast + MAPE backtest
# ---------------------------------------------------------------------------


def _forecast_body(engine: str) -> str:
    """Next-day revenue forecast = yesterday's truncated EWMA (the
    events_ewma_smooth kernel), backtested in-sample: per backtest day,
    APE compares actual*4^12 against the lagged EWMA numerator in
    exact integers; MAPE is the integer mean of the per-day ppm
    values. next_forecast is the final day's EWMA via the same
    quotient/remainder micro split."""
    intdiv = "div" if engine == "spark" else "//"
    return f"""
        WITH daily AS ({_daily(engine)}),
        num AS (
            SELECT event_type, day_idx, cents,
                   CAST({_ewma_num(engine)} AS BIGINT) AS n4
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)
        ),
        shifted AS (
            SELECT event_type, day_idx, cents, n4,
                   lag(n4) OVER (PARTITION BY event_type
                                 ORDER BY day_idx) AS n4_prev
            FROM num
        ),
        scored AS (
            SELECT event_type, day_idx, n4,
                   CASE WHEN n4_prev IS NOT NULL AND cents > 0
                        THEN CAST(floor(
                            abs(cents * CAST({_EWMA_DEN} AS BIGINT)
                                - n4_prev) * 1000000e0
                            / (cents * CAST({_EWMA_DEN} AS BIGINT)))
                            AS BIGINT)
                        END AS ape_ppm
            FROM shifted
        )
        SELECT event_type,
               CAST(COUNT(ape_ppm) AS BIGINT) AS n_backtest,
               CAST(SUM(ape_ppm) {intdiv} COUNT(ape_ppm) AS BIGINT)
                   AS mape_ppm,
               CAST((max_by(n4, day_idx) {intdiv} {_EWMA_DEN}) * 1000000
                    + ((max_by(n4, day_idx) % {_EWMA_DEN}) * 1000000)
                      {intdiv} {_EWMA_DEN}
                    AS BIGINT) AS next_forecast_cents_micro
        FROM scored
        GROUP BY event_type
        ORDER BY event_type
    """


def events_forecast_ewma_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-type next-day forecast with its in-sample MAPE backtest —
    see _forecast_body. Closes the smoothing loop: events_ewma_smooth
    produces the estimate, this op quantifies how good that estimate
    IS as a one-step forecast — the number a capacity-planning
    dashboard actually shows.

    Scale posture: same calendar-bounded daily barrier and
    type-partitioned windows as the EWMA; the rollup is |types| rows."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_forecast_body("spark"))


EVENTS_FORECAST_EWMA_BACKTEST_SQL = _forecast_body("duck")


# ---------------------------------------------------------------------------
# events_seasonal_decomposition — additive trend/seasonal/residual split
# ---------------------------------------------------------------------------


def _decomp_body(engine: str) -> str:
    """Classical additive decomposition of the daily cents series per
    type: trend = centered 7-day MA (exact: 7-day sum kept as BIGINT,
    division deferred), seasonal = day-of-week mean of the detrended
    series, residual = value - trend - seasonal. To stay exact, every
    component is carried at scale x7xDOW_COUNT: detrended7 =
    7*cents - sum7 (BIGINT), seasonal7 = avg over the DOW group of
    detrended7 (kept as the exact pair sum/count and applied
    cross-multiplied), residual exported in micro-cents via ONE double
    expression per row over exact integers."""
    return f"""
        WITH daily AS ({_daily(engine)}),
        ma AS (
            SELECT event_type, day_idx, cents,
                   CAST(SUM(cents) OVER w AS BIGINT) AS sum7,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n7,
                   CAST(day_idx % 7 AS BIGINT) AS dow
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        inner7 AS (
            -- full 7-day windows only: edge days have no defined trend
            SELECT event_type, day_idx, cents, sum7, dow,
                   7 * cents - sum7 AS det7
            FROM ma WHERE n7 = 7
        ),
        season AS (
            SELECT event_type, dow,
                   CAST(SUM(det7) AS BIGINT) AS s_sum,
                   CAST(COUNT(*) AS BIGINT) AS s_n
            FROM inner7 GROUP BY event_type, dow
        )
        SELECT i.event_type, i.day_idx, i.cents,
               CAST(floor(i.sum7 / 7e0 * 1000000) AS BIGINT)
                   AS trend_micro,
               CAST(floor(s.s_sum / (7e0 * s.s_n) * 1000000) AS BIGINT)
                   AS seasonal_micro,
               CAST(floor((i.det7 / 7e0 - s.s_sum / (7e0 * s.s_n))
                          * 1000000) AS BIGINT) AS residual_micro
        FROM inner7 i
        JOIN season s ON s.event_type = i.event_type AND s.dow = i.dow
        ORDER BY i.event_type, i.day_idx
    """


def events_seasonal_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical additive trend/seasonal/residual decomposition of each
    type's daily revenue — see _decomp_body. Composes the two existing
    views (events_daily_ma_residual's trend, events_seasonality_weekly's
    day-of-week profile) into the full decomposition whose RESIDUAL is
    the right anomaly-detection input: a spike is only a spike after
    both trend and weekday effect are removed.

    Scale posture: the bounded 7-day frame partitions by type over the
    calendar-bounded daily barrier; the seasonal profile is a
    |types| x 7 aggregate joined back; exact integers everywhere until
    the per-row micro exports."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_decomp_body("spark"))


EVENTS_SEASONAL_DECOMPOSITION_SQL = _decomp_body("duck")


# ---------------------------------------------------------------------------
# agg_power_mde — experiment sizing: minimum detectable effect
# ---------------------------------------------------------------------------

_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
_Z_BETA = 0.841621   # power = 0.80


def _mde_body(engine: str) -> str:
    """Fixed-horizon two-sample power analysis from the CURRENT data:
    per arm n and variance from exact per-user dollar power sums, then
    MDE = (z_a + z_b) * sqrt(s0^2/n0 + s1^2/n1) both absolute (micro
    dollars) and relative to the pooled mean (ppm). The z constants
    are literals, so the only doubles are the final expressions over
    exact integers."""
    intdiv = "div" if engine == "spark" else "//"
    z = _Z_ALPHA + _Z_BETA
    return f"""
        WITH ev AS ({_ev(engine)}),
        per_user AS (
            SELECT user_id, user_id % 2 AS arm,
                   CAST(SUM(cents) {intdiv} 100 AS BIGINT) AS y
            FROM ev WHERE cents >= 0 GROUP BY user_id
        ),
        arms AS (
            SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM per_user GROUP BY arm
        ),
        wide AS (
            SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
                   MAX(CASE WHEN arm = 0 THEN sy END) AS sy0,
                   MAX(CASE WHEN arm = 0 THEN syy END) AS syy0,
                   MAX(CASE WHEN arm = 1 THEN n END) AS n1,
                   MAX(CASE WHEN arm = 1 THEN sy END) AS sy1,
                   MAX(CASE WHEN arm = 1 THEN syy END) AS syy1
            FROM arms
        )
        SELECT n0, n1,
               CAST(floor((sy0 + sy1) * 1e0 / (n0 + n1) * 1000000)
                    AS BIGINT) AS pooled_mean_micro,
               CAST(floor({z}e0 * sqrt(
                        (syy0 * 1e0 / n0 - (sy0 * 1e0 / n0)
                                            * (sy0 * 1e0 / n0)) / n0
                        + (syy1 * 1e0 / n1 - (sy1 * 1e0 / n1)
                                              * (sy1 * 1e0 / n1)) / n1)
                    * 1000000) AS BIGINT) AS mde_abs_micro,
               CAST(floor({z}e0 * sqrt(
                        (syy0 * 1e0 / n0 - (sy0 * 1e0 / n0)
                                            * (sy0 * 1e0 / n0)) / n0
                        + (syy1 * 1e0 / n1 - (sy1 * 1e0 / n1)
                                              * (sy1 * 1e0 / n1)) / n1)
                    / ((sy0 + sy1) * 1e0 / (n0 + n1)) * 1000000)
                    AS BIGINT) AS mde_rel_ppm
        FROM wide
    """


def agg_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect (alpha=0.05 two-sided, power 0.80) of
    the revenue-per-user metric at the CURRENT arm sizes — see
    _mde_body. The experiment-planning number that belongs in front of
    agg_ttest_welch / agg_sprt_sequential: if the MDE is larger than
    any plausible effect, don't run the test.

    Scale posture: one corpus scan to per-user totals; 2-row arm
    aggregate; closed forms over exact power sums."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_mde_body("spark"))


AGG_POWER_MDE_SQL = _mde_body("duck")


# ---------------------------------------------------------------------------
# agg_winsorized_mean — robust mean via value-grid clamping
# ---------------------------------------------------------------------------

WINSOR_PPM = 50_000  # clamp the bottom/top 5% of observations


def _winsor_body(engine: str) -> str:
    """Per-type winsorized mean: the 5th/95th percentile clamp bounds
    are the smallest cents whose cumulative count reaches ceil(q*n) on
    the per-(type, cents) tie-group grid; the winsorized sum then
    clamps each GRID ROW's value — one pass over the value grid, no
    per-row second scan. All counts/sums exact BIGINT; the two means
    are exact integer divisions (nonnegative by the cents filter)."""
    intdiv = "div" if engine == "spark" else "//"
    return f"""
        WITH ev AS ({_ev(engine)}),
        grid AS (
            SELECT event_type, cents,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM ev WHERE cents >= 0
            GROUP BY event_type, cents
        ),
        cum AS (
            SELECT event_type, cents, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type
                        ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS c,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM grid
        ),
        bounds AS (
            SELECT event_type, MAX(n) AS n,
                   MIN(CASE WHEN c * 1000000 >= n * {WINSOR_PPM}
                            THEN cents END) AS lo,
                   MIN(CASE WHEN c * 1000000 >= n * {1_000_000 - WINSOR_PPM}
                            THEN cents END) AS hi
            FROM cum GROUP BY event_type
        )
        SELECT g.event_type, b.n, b.lo AS lo_cents, b.hi AS hi_cents,
               CAST((SUM(g.cnt * g.cents) * 1000000) {intdiv} b.n
                    AS BIGINT) AS raw_mean_micro,
               CAST((SUM(g.cnt * GREATEST(b.lo, LEAST(b.hi, g.cents)))
                     * 1000000) {intdiv} b.n AS BIGINT)
                   AS winsorized_mean_micro
        FROM grid g JOIN bounds b ON b.event_type = g.event_type
        GROUP BY g.event_type, b.n, b.lo, b.hi
        ORDER BY g.event_type
    """


def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-winsorized mean of event value per type next to the raw mean
    — see _winsor_body. The robust location estimate experimentation
    teams use when heavy tails make plain means (and Welch on them)
    whale-dominated; clamping beats trimming when sample sizes differ
    per arm.

    Scale posture: one corpus scan to the (type, cents) tie-group grid
    (value-grid-bounded); the cumulative windows partition by type
    over that grid; the clamp is applied per GRID ROW, never per
    event."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_winsor_body("spark"))


AGG_WINSORIZED_MEAN_SQL = _winsor_body("duck")


# ---------------------------------------------------------------------------
# events_contribution_wow — which segment drove the week-over-week move
# ---------------------------------------------------------------------------


def _wow_weekly_sql(engine: str) -> str:
    """The (event_type, week, cents) aggregate the WoW decomposition
    runs on — weeks anchored at the corpus' first day."""
    intdiv = "div" if engine == "spark" else "//"
    return f"""
        WITH ev AS ({_ev(engine)}),
        anchor AS (SELECT MIN(day_idx) AS d0 FROM ev)
        SELECT event_type,
               CAST((day_idx - d0) {intdiv} 7 AS BIGINT) AS week,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM ev CROSS JOIN anchor
        GROUP BY event_type, (day_idx - d0) {intdiv} 7
    """


def _wow_body(engine: str, weekly_from: str | None = None) -> str:
    """Metric-tree root-cause view: revenue delta of the LAST complete
    week vs the week before, decomposed by event_type. Per-segment
    deltas are exact cents; each segment's share of the total move is
    a floored signed ppm; segments ordered by |delta| so the top row
    IS the headline explanation.

    ``weekly_from``: pre-materialized weekly relation (Spark path) —
    inline, the nested multi-reference chain (weekly×2 under pair,
    pair×2 under the tail, ev×2 under weekly) compounds to EIGHT corpus
    scans; checkpointing the types×weeks grid leaves zero."""
    weekly_rel = (f"weekly AS (SELECT * FROM {weekly_from})"
                  if weekly_from
                  else f"weekly AS ({_wow_weekly_sql(engine)})")
    return f"""
        WITH {weekly_rel},
        last_full AS (
            -- the last week with a FULL 7 days of data range
            SELECT MAX(week) - 1 AS w1 FROM weekly
        ),
        pair AS (
            SELECT w.event_type,
                   CAST(SUM(CASE WHEN w.week = l.w1
                                 THEN w.cents ELSE 0 END) AS BIGINT)
                       AS cur_cents,
                   CAST(SUM(CASE WHEN w.week = l.w1 - 1
                                 THEN w.cents ELSE 0 END) AS BIGINT)
                       AS prev_cents
            FROM weekly w CROSS JOIN last_full l
            GROUP BY w.event_type
        ),
        tot AS (
            SELECT CAST(SUM(cur_cents - prev_cents) AS BIGINT) AS tdelta
            FROM pair
        )
        SELECT p.event_type, p.prev_cents, p.cur_cents,
               CAST(p.cur_cents - p.prev_cents AS BIGINT) AS delta_cents,
               CASE WHEN t.tdelta = 0 THEN NULL
                    ELSE CAST(floor((p.cur_cents - p.prev_cents)
                              * 1000000e0 / t.tdelta) AS BIGINT)
                    END AS share_of_move_ppm
        FROM pair p CROSS JOIN tot t
        ORDER BY abs(p.cur_cents - p.prev_cents) DESC, p.event_type
    """


def events_contribution_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue-move decomposition by event type — see
    _wow_body. The "why did the metric move" drill-down every metric
    tree/dashboard offers: segment deltas sum exactly to the total
    move, and the share column attributes it in signed ppm.

    Scale posture: one corpus scan to the CHECKPOINTED (type, week)
    aggregate (calendar-bounded — see _wow_body's weekly_from note);
    everything after is |types| rows with 1-row broadcasts."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    def build():
        load_table(spark, sf_dir, "events").createOrReplaceTempView(
            "events"
        )
        return spark.sql(_wow_weekly_sql("spark"))

    weekly = cached_barrier_view(
        spark, sf_dir, "wow_weekly", build, tables=("events",)
    )
    return spark.sql(_wow_body("spark", weekly_from=weekly))


EVENTS_CONTRIBUTION_WOW_SQL = _wow_body("duck")


# ---------------------------------------------------------------------------
# events_error_budget_burn — SRE multi-window burn-rate alerts
# ---------------------------------------------------------------------------

SLO_ERR_PPM = 50_000          # SLO: error share of events <= 5%
BURN_FAST_X = 6               # fast page: burn >= 6x over 1h AND 6h
BURN_SLOW_X = 3               # slow ticket: burn >= 3x over 6h AND 24h


def _burn_body(engine: str) -> str:
    """Google-SRE multi-window multi-burn-rate alerting over the hourly
    event stream: burn(W) = (errors_W/events_W)/SLO; 'page' needs the
    fast threshold exceeded in BOTH the 1h and 6h windows (long window
    for significance, short for reset time), 'ticket' the slow pair
    (6h, 24h). Every comparison is the cross-multiplied integer form
    err*1e12 >= thr*slo_ppm*total — no division decides an alert. The
    trailing frames run over the |hours| grid (calendar-bounded)."""
    return f"""
        WITH ev AS ({_ev(engine)}),
        hourly AS (
            SELECT CAST(floor(t_us / 3600000000) AS BIGINT) AS hour_idx,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'error'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS err
            FROM ev GROUP BY 1
        ),
        frames AS (
            SELECT hour_idx, n, err,
                   CAST(SUM(n) OVER w6 AS BIGINT) AS n6,
                   CAST(SUM(err) OVER w6 AS BIGINT) AS err6,
                   CAST(SUM(n) OVER w24 AS BIGINT) AS n24,
                   CAST(SUM(err) OVER w24 AS BIGINT) AS err24
            FROM hourly
            WINDOW w6 AS (ORDER BY hour_idx
                          ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
                   w24 AS (ORDER BY hour_idx
                           ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
        )
        SELECT hour_idx, n, err, n6, err6, n24, err24,
               CAST(floor(err * 1000000e0 / n * 1000000 / {SLO_ERR_PPM})
                    AS BIGINT) AS burn_1h_ppm,
               CAST(floor(err6 * 1000000e0 / n6 * 1000000
                          / {SLO_ERR_PPM}) AS BIGINT) AS burn_6h_ppm,
               CASE WHEN err * 1000000 >=
                         {BURN_FAST_X * SLO_ERR_PPM} * n
                     AND err6 * 1000000 >=
                         {BURN_FAST_X * SLO_ERR_PPM} * n6
                    THEN 'page'
                    WHEN err6 * 1000000 >=
                         {BURN_SLOW_X * SLO_ERR_PPM} * n6
                     AND err24 * 1000000 >=
                         {BURN_SLOW_X * SLO_ERR_PPM} * n24
                    THEN 'ticket'
                    ELSE 'ok' END AS alert
        FROM frames
        ORDER BY hour_idx
    """


def events_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget burn-rate alerts (SLO {SLO_ERR_PPM} ppm error
    share; fast {BURN_FAST_X}x over 1h+6h pages, slow {BURN_SLOW_X}x
    over 6h+24h tickets) — see _burn_body. The operational alerting
    layer over the landed CDC stream: multi-window rules give both
    fast detection and fast reset without flapping, and the
    cross-multiplied integer comparisons mean an alert can never flip
    on a float boundary.

    Scale posture: one corpus scan to the hourly aggregate (map-side
    combined); the trailing frames walk the calendar-bounded hour
    grid — whitelisted with that bound in tests/test_plan_hygiene.py."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_burn_body("spark"))


EVENTS_ERROR_BUDGET_BURN_SQL = _burn_body("duck")


# ---------------------------------------------------------------------------
# events_cuped_adjustment — pre-period covariate variance reduction
# ---------------------------------------------------------------------------

CUPED_SPLIT_DAY = 15  # pre-period: day_idx < anchor+15; post: the rest


def _cuped_body(engine: str) -> str:
    """CUPED (Deng et al. 2013): adjust each user's post-period revenue
    by theta * (pre - mean(pre)) with theta = cov(pre,post)/var(pre)
    estimated on the POOLED population. Per-user dollar totals keep all
    five pooled power sums exact BIGINT; theta, the adjusted means and
    the variance-reduction ratio are single double expressions over
    those integers. Variance identity used per arm:
    var(adj) = var(y) - 2*theta*cov(x,y) + theta^2*var(x)."""
    intdiv = "div" if engine == "spark" else "//"
    return f"""
        WITH ev AS ({_ev(engine)}),
        anchor AS (SELECT MIN(day_idx) AS d0 FROM ev),
        per_user AS (
            SELECT user_id, user_id % 2 AS arm,
                   CAST(SUM(CASE WHEN day_idx < d0 + {CUPED_SPLIT_DAY}
                                 THEN cents ELSE 0 END)
                        {intdiv} 100 AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN day_idx >= d0 + {CUPED_SPLIT_DAY}
                                 THEN cents ELSE 0 END)
                        {intdiv} 100 AS BIGINT) AS y
            FROM ev CROSS JOIN anchor
            WHERE cents >= 0
            GROUP BY user_id
        ),
        pooled AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM per_user
        ),
        arms AS (
            SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_a,
                   CAST(SUM(x) AS BIGINT) AS ax,
                   CAST(SUM(y) AS BIGINT) AS ay,
                   CAST(SUM(x * x) AS BIGINT) AS axx,
                   CAST(SUM(x * y) AS BIGINT) AS axy,
                   CAST(SUM(y * y) AS BIGINT) AS ayy
            FROM per_user GROUP BY arm
        ),
        theta AS (
            SELECT CASE WHEN p.n * p.sxx = p.sx * p.sx THEN 0e0
                        ELSE (p.n * p.sxy - p.sx * p.sy) * 1e0
                             / (p.n * p.sxx - p.sx * p.sx) END AS th,
                   p.sx * 1e0 / p.n AS xbar
            FROM pooled p
        )
        SELECT a.arm, a.n_a,
               CAST(floor(a.ay * 1e0 / a.n_a * 1000000) AS BIGINT)
                   AS mean_post_micro,
               CAST(floor((a.ay * 1e0 / a.n_a
                           - t.th * (a.ax * 1e0 / a.n_a - t.xbar))
                          * 1000000) AS BIGINT) AS mean_adj_micro,
               CAST(floor(t.th * 1000000) AS BIGINT) AS theta_micro,
               CASE WHEN a.n_a * a.ayy = a.ay * a.ay THEN NULL
                    ELSE CAST(floor(
                        (2e0 * t.th * (a.n_a * a.axy - a.ax * a.ay)
                         - t.th * t.th * (a.n_a * a.axx - a.ax * a.ax))
                        / (a.n_a * a.ayy - a.ay * a.ay) * 1000000)
                        AS BIGINT) END AS var_reduction_ppm
        FROM arms a CROSS JOIN theta t
        ORDER BY a.arm
    """


def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED pre-period adjustment of post-period revenue per A/B arm —
    see _cuped_body. The industry-standard variance-reduction step that
    makes agg_ttest_welch/agg_sprt_sequential decisions faster at the
    same error rates: users' pre-experiment behavior explains away
    between-user noise.

    Scale posture: one corpus scan to per-user (pre, post) dollar
    totals (map-side combined); pooled theta is a 1-row broadcast; the
    per-arm report is 2 rows of closed forms over exact power sums."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_cuped_body("spark"))


EVENTS_CUPED_ADJUSTMENT_SQL = _cuped_body("duck")


# ---------------------------------------------------------------------------
# agg_ratio_metric_delta — delta-method CI for a ratio metric
# ---------------------------------------------------------------------------


def _ratio_delta_body(engine: str) -> str:
    """Revenue-per-event ratio metric per arm with the delta-method
    standard error: R = sum(c)/sum(k) over USERS (the randomization
    unit), se^2 = sum((c_i - R*k_i)^2) * n/(n-1) / (sum k)^2 — the
    linearization that fixes the classic ratio-metric mistake of
    treating events as independent. Per-user dollar/count sums are
    exact BIGINT; R, se and the 95% CI are single double expressions
    (micro-floored)."""
    intdiv = "div" if engine == "spark" else "//"
    return f"""
        WITH ev AS ({_ev(engine)}),
        per_user AS (
            SELECT user_id, user_id % 2 AS arm,
                   CAST(SUM(cents) {intdiv} 100 AS BIGINT) AS c,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM ev WHERE cents >= 0 GROUP BY user_id
        ),
        arms AS (
            SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS sc,
                   CAST(SUM(k) AS BIGINT) AS sk,
                   CAST(SUM(c * c) AS BIGINT) AS scc,
                   CAST(SUM(c * k) AS BIGINT) AS sck,
                   CAST(SUM(k * k) AS BIGINT) AS skk
            FROM per_user GROUP BY arm
        )
        SELECT arm, n, sc AS sum_dollars, sk AS sum_events,
               CAST(floor(sc * 1e0 / sk * 1000000) AS BIGINT)
                   AS ratio_micro,
               CAST(floor(sqrt(GREATEST(
                        (scc - 2e0 * (sc * 1e0 / sk) * sck
                         + (sc * 1e0 / sk) * (sc * 1e0 / sk) * skk)
                        * (n * 1e0 / (n - 1)), 0e0))
                    / sk * 1000000) AS BIGINT) AS se_micro,
               CAST(floor((sc * 1e0 / sk
                           - 1.959964e0 * sqrt(GREATEST(
                               (scc - 2e0 * (sc * 1e0 / sk) * sck
                                + (sc * 1e0 / sk) * (sc * 1e0 / sk)
                                  * skk) * (n * 1e0 / (n - 1)), 0e0))
                             / sk) * 1000000) AS BIGINT) AS ci_lo_micro,
               CAST(floor((sc * 1e0 / sk
                           + 1.959964e0 * sqrt(GREATEST(
                               (scc - 2e0 * (sc * 1e0 / sk) * sck
                                + (sc * 1e0 / sk) * (sc * 1e0 / sk)
                                  * skk) * (n * 1e0 / (n - 1)), 0e0))
                             / sk) * 1000000) AS BIGINT) AS ci_hi_micro
        FROM arms
        ORDER BY arm
    """


def agg_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method CI for the revenue-per-event ratio metric per arm —
    see _ratio_delta_body. The experimentation tool the mean tests
    can't replace: ratio metrics' numerator and denominator are
    correlated WITHIN users, so naive per-event variance understates
    the CI; the delta linearization over the randomization unit is the
    standard correction.

    Scale posture: one corpus scan to per-user (dollars, events)
    pairs; everything after is 2 rows of closed forms over exact
    BIGINT power sums."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ratio_delta_body("spark"))


AGG_RATIO_METRIC_DELTA_SQL = _ratio_delta_body("duck")


# ---------------------------------------------------------------------------
# events_attribution_touch — first/last-touch purchase attribution
# ---------------------------------------------------------------------------

ATTR_LOOKBACK_US = 7 * 86_400_000_000  # 7-day attribution window


def _attribution_body(engine: str) -> str:
    """Marketing attribution per purchase: the user's most recent
    preceding click (last-touch, ROWS frame ordered by (t, event_id))
    and the earliest click inside the {ATTR_LOOKBACK_US}-µs lookback
    (first-touch, RANGE frame on t). Both frames partition by user —
    one shuffle, exact µs arithmetic; the daily rollup is bounded."""
    del engine
    return f"""
        WITH ev AS ({_ev("spark")}),
        tp AS (
            SELECT user_id, event_type, t_us, event_id, day_idx
            FROM ev WHERE event_type IN ('click', 'purchase')
        ),
        marked AS (
            SELECT user_id, event_type, t_us, day_idx,
                   MAX(CASE WHEN event_type = 'click' THEN t_us END)
                       OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS last_click_us,
                   MIN(CASE WHEN event_type = 'click' THEN t_us END)
                       OVER (PARTITION BY user_id ORDER BY t_us
                             RANGE BETWEEN {ATTR_LOOKBACK_US} PRECEDING
                             AND CURRENT ROW) AS first_click_us
            FROM tp
        )
        SELECT day_idx,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CASE WHEN last_click_us IS NOT NULL
                              AND t_us - last_click_us
                                  <= {ATTR_LOOKBACK_US}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_attributed,
               CAST(SUM(CASE WHEN first_click_us IS NOT NULL
                              AND last_click_us IS NOT NULL
                              AND first_click_us < last_click_us
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_multi_touch,
               CAST(SUM(CASE WHEN last_click_us IS NOT NULL
                              AND t_us - last_click_us
                                  <= {ATTR_LOOKBACK_US}
                             THEN t_us - last_click_us
                             ELSE 0 END) AS BIGINT) AS sum_latency_us
        FROM marked
        WHERE event_type = 'purchase'
        GROUP BY day_idx
        ORDER BY day_idx
    """


def events_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch click→purchase attribution with a 7-day
    lookback — see _attribution_body. The standard marketing-analytics
    report over the landed CDC events: what share of purchases a click
    can claim (last-touch), how often the journey had MULTIPLE clicks
    (first-touch differs), and the click→purchase latency mass.

    Scale posture: one shuffle keyed by user_id serves both window
    frames; the daily rollup is map-side combined over the calendar."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_attribution_body("spark"))


# the two engines share the body verbatim except the epoch helper
EVENTS_ATTRIBUTION_TOUCH_SQL = _attribution_body("duck").replace(
    _ev("spark"), _ev("duck")
)


# ---------------------------------------------------------------------------
# events_active_users_rolling — exact DAU / WAU / MAU via bitmap merges
# ---------------------------------------------------------------------------

WAU_DAYS, MAU_DAYS = 7, 28


def _active_users_body(engine: str) -> str:
    """Exact rolling active users: per-day user bitmaps (62-bit words,
    the agg_bitmap_distinct layout) OR-merged over the trailing
    {WAU_DAYS}/{MAU_DAYS}-day calendar windows, counted by bit_count.
    Distinct users are NEVER re-shuffled per window — the window merge
    touches only (day, word) bitmap rows, |days| x |users|/62 of them,
    and merging is associative (the same merge that unions shards)."""
    if engine == "spark":
        one = "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 62 AS INT))"
        intdiv = "DIV"
    else:
        one = "(CAST(1 AS BIGINT) << CAST(user_id % 62 AS INTEGER))"
        intdiv = "//"
    return f"""
        WITH ev AS ({_ev(engine)}),
        du AS (SELECT DISTINCT user_id, day_idx FROM ev),
        daybits AS (
            SELECT day_idx, user_id {intdiv} 62 AS w,
                   BIT_OR({one}) AS word
            FROM du GROUP BY day_idx, user_id {intdiv} 62
        ),
        cal AS (SELECT DISTINCT day_idx FROM du),
        dau AS (
            SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS dau
            FROM du GROUP BY day_idx
        ),
        wau AS (
            SELECT c.day_idx,
                   CAST(SUM(bit_count(word)) AS BIGINT) AS wau
            FROM (
                SELECT c.day_idx, b.w, BIT_OR(b.word) AS word
                FROM cal c JOIN daybits b
                  ON b.day_idx BETWEEN c.day_idx - {WAU_DAYS - 1}
                     AND c.day_idx
                GROUP BY c.day_idx, b.w
            ) c GROUP BY c.day_idx
        ),
        mau AS (
            SELECT c.day_idx,
                   CAST(SUM(bit_count(word)) AS BIGINT) AS mau
            FROM (
                SELECT c.day_idx, b.w, BIT_OR(b.word) AS word
                FROM cal c JOIN daybits b
                  ON b.day_idx BETWEEN c.day_idx - {MAU_DAYS - 1}
                     AND c.day_idx
                GROUP BY c.day_idx, b.w
            ) c GROUP BY c.day_idx
        )
        SELECT d.day_idx, d.dau, w.wau, m.mau,
               CAST(floor(d.dau * 1e0 / m.mau * 1000000) AS BIGINT)
                   AS stickiness_ppm
        FROM dau d
        JOIN wau w ON w.day_idx = d.day_idx
        JOIN mau m ON m.day_idx = d.day_idx
        ORDER BY d.day_idx
    """


def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU/WAU/MAU per day plus the DAU/MAU stickiness ratio —
    see _active_users_body. The top-line dashboard triple, computed
    EXACTLY at any scale because the per-day state is a mergeable
    bitmap, not a user list (the agg_bitmap_distinct /
    agg_bitmap_rollup_merge layout applied to rolling windows).

    Scale posture: one corpus scan to the (user, day) distinct (one
    uniform shuffle); the rolling merges join bitmap WORDS against the
    bounded calendar — |days| x |users|/62 rows, associative BIT_OR;
    no per-user re-shuffle per window and no windows at all."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_active_users_body("spark"))


EVENTS_ACTIVE_USERS_ROLLING_SQL = _active_users_body("duck")


# ---------------------------------------------------------------------------
# agg_daily_corr_matrix — Pearson correlation matrix of the daily metrics
# ---------------------------------------------------------------------------


def _corr_matrix_body(engine: str) -> str:
    """Pearson correlation between every PAIR of event types' daily
    DOLLAR series (cents floored to dollars keeps all five power sums
    exact BIGINT with headroom through sf10; nonnegative by the daily
    filter, so Spark div and DuckDB // agree). The day-equi-join pair
    space is |types|^2 x |days| — bounded by the calendar regardless of
    corpus size; r is ONE double expression per pair (micro-floored)."""
    intdiv = "div" if engine == "spark" else "//"
    return f"""
        WITH daily AS ({_daily(engine)}),
        dollars AS (
            SELECT event_type, day_idx,
                   CAST(cents {intdiv} 100 AS BIGINT) AS v
            FROM daily
        ),
        pairs AS (
            SELECT x.event_type AS type_a, y.event_type AS type_b,
                   x.v AS a, y.v AS b
            FROM dollars x JOIN dollars y
              ON x.day_idx = y.day_idx AND x.event_type < y.event_type
        ),
        sums AS (
            SELECT type_a, type_b,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(a) AS BIGINT) AS sx,
                   CAST(SUM(b) AS BIGINT) AS sy,
                   CAST(SUM(a * b) AS BIGINT) AS sxy,
                   CAST(SUM(a * a) AS BIGINT) AS sxx,
                   CAST(SUM(b * b) AS BIGINT) AS syy
            FROM pairs GROUP BY type_a, type_b
        )
        SELECT type_a, type_b, n AS n_days,
               CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy
                    THEN NULL
                    ELSE CAST(floor((n * sxy - sx * sy) * 1e0
                              / sqrt((n * sxx - sx * sx) * 1e0
                                     * (n * syy - sy * sy))
                              * 1000000) AS BIGINT) END AS corr_micro
        FROM sums
        ORDER BY type_a, type_b
    """


def agg_daily_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix across ALL event types'
    daily revenue series — see _corr_matrix_body. The metric-health
    heatmap feed: which KPIs co-move (clicks vs purchases) and which
    decouple (errors) — the k-series generalization of the two-series
    Kendall/Spearman pair above.

    Scale posture: one corpus scan to the calendar-bounded daily
    barrier; the pair join and all power sums live on |types| x |days|
    rows; no windows at all."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_corr_matrix_body("spark"))


AGG_DAILY_CORR_MATRIX_SQL = _corr_matrix_body("duck")


# ---------------------------------------------------------------------------
# profile_gini_coefficient — revenue concentration across customers
# ---------------------------------------------------------------------------


def _gini_select(engine: str) -> str:
    """Final Gini selection over the ranked per-customer relation
    (columns: rk, cents). G = (2*Sigma r*x - (n+1)*Sigma x)/(n*Sigma x)
    — exact BIGINT power sums (headroom: n*Sigma r*x < 2^63 through
    sf1; the DECIMAL widening switch covers beyond), ONE double
    division, micro-floored."""
    del engine
    return """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(floor((2e0 * SUM(rk * cents)
                           - (COUNT(*) + 1e0) * SUM(cents))
                          / (COUNT(*) * 1e0 * SUM(cents))
                          * 1000000) AS BIGINT) AS gini_micro
    """


PROFILE_GINI_COEFFICIENT_SQL = f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rk
        FROM per_cust
    )
    {_gini_select("duck")}
    FROM ranked
"""


def profile_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers —
    see _gini_select. The single-number summary of
    profile_pareto_revenue's curve (relational_ext.py): 0 = uniform,
    1 = one-customer monopoly; the standard concentration KPI.

    Scale posture: one orders scan to the per-customer aggregate; the
    global rank uses ``distributed_global_rank`` (range partition +
    broadcast offsets) instead of a one-task ROW_NUMBER window; the
    closing aggregate is map-side combined."""
    from mongo_to_clickhouse_spark.operators.rank import (
        distributed_global_rank,
    )

    from mongo_to_clickhouse_spark.operators.materialize import barrier

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    # barrier: the rank pass samples + ranks over this aggregate; one
    # materialization keeps the orders scan single-pass
    per_cust = barrier(spark.sql("""
        SELECT o_custkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    """))
    ranked = distributed_global_rank(
        per_cust, [F.col("cents"), F.col("o_custkey")], "rk",
        bucket_key=F.col("cents"), bucket_tiebreak=F.col("o_custkey"))
    ranked.createOrReplaceTempView("gini_ranked")
    return spark.sql(f"{_gini_select('spark')} FROM gini_ranked")


# ---------------------------------------------------------------------------
# events_anomaly_seasonal_residual — MAD flags on the DESEASONALIZED series
# ---------------------------------------------------------------------------


def _seasonal_anomaly_sql(engine: str) -> str:
    """Seasonal-aware anomaly detection: the median/MAD rule of
    events_anomaly_mad_daily applied to events_seasonal_decomposition's
    RESIDUAL instead of the raw daily series — a Friday-shaped spike on
    a Friday is normal; the same spike on a Tuesday pages. Raw-series
    MAD (statsops) flags every strong weekday; this flags only what
    trend + weekday effect cannot explain — the composition an on-call
    monitoring stack actually runs.

    Pure composition of two committed engine-shared bodies (residuals in
    exact micro-cents, medians as exact low-of-middle ranks), so both
    engines inherit bit-identical flags."""
    from mongo_to_clickhouse_spark.queries.statsops import _mad_body

    intdiv = "DIV" if engine == "spark" else "//"
    daily_rel = (
        f"(SELECT event_type, day_idx, residual_micro AS x "
        f"FROM ({_decomp_body(engine)}) dc)"
    )
    return _seasonal_anomaly_tail(_mad_body(daily_rel)).replace(
        "{intdiv}", intdiv
    )


def _seasonal_anomaly_tail(mad_body: str) -> str:
    return f"""
        SELECT event_type, day_idx, x AS residual_micro,
               median_x AS median_residual_micro, mad AS mad_micro,
               flagged
        FROM ({mad_body}) b
        ORDER BY event_type, day_idx
    """


def events_anomaly_seasonal_residual(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Median/MAD anomaly flags on the deseasonalized daily revenue —
    see _seasonal_anomaly_sql.

    Scale posture: _mad_body references its daily input from THREE
    consumers (median rank, deviation join, MAD rank), so the
    decomposition is checkpointed once behind the barrier cache first —
    without it Catalyst re-expanded the whole trend/seasonal subtree per
    reference (21 shuffles / 8 corpus scans planned; 5 / 0 with it, the
    graph_modularity lesson). Everything downstream of that one scan is
    the calendar-bounded (type, day) grid."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )
    from mongo_to_clickhouse_spark.queries.statsops import _mad_body

    def build():
        load_table(spark, sf_dir, "events").createOrReplaceTempView(
            "events"
        )
        return spark.sql(
            f"SELECT event_type, day_idx, residual_micro AS x "
            f"FROM ({_decomp_body('spark')}) dc"
        )

    cached_barrier_view(
        spark, sf_dir, "seasres_daily", build, tables=("events",)
    )
    return spark.sql(
        _seasonal_anomaly_tail(_mad_body("seasres_daily"))
        .replace("{intdiv}", "DIV")
    )


EVENTS_ANOMALY_SEASONAL_RESIDUAL_SQL = _seasonal_anomaly_sql("duck")


# ---------------------------------------------------------------------------
# events_topk_sliding — trailing-6h activity leaderboard per observed hour
# ---------------------------------------------------------------------------

TOPK_SLIDE_K = 10
_TOPK_SLIDE_HOURS = 6


def _topk_sliding_sql(engine: str, hourly_from: str | None = None) -> str:
    """EXACT rolling top-{TOPK_SLIDE_K} leaderboard: per observed hour,
    the most active users over the trailing {_TOPK_SLIDE_HOURS}h. The
    sliding twin of agg_topk_weighted's static ranking, built the
    mergeable way: hourly per-user counts (one map-side-combined
    reduction of the corpus), each hourly cell broadcast to the
    ≤{_TOPK_SLIDE_HOURS} hours it contributes to via a literal lag join
    (the agg_sliding_window_quantile shape — a RANGE window over the
    gappy (user, hour) grid would drop users silent in the current
    hour), then one rank window per hour with the rnk ≤ K predicate
    Spark pushes down as WindowGroupLimit (a per-partition top-K heap —
    no hour's full user list ever sorts globally)."""
    ep = ("unix_micros(CAST(ts AS TIMESTAMP))" if engine == "spark"
          else "CAST(epoch_us(ts) AS BIGINT)")
    lags = ", ".join(f"({k})" for k in range(_TOPK_SLIDE_HOURS))
    hourly_body = f"""
        WITH ev AS (
            SELECT user_id,
                   CAST(floor({ep} / 3600000000) AS BIGINT) AS hour_idx
            FROM events
        )
        SELECT hour_idx, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ev GROUP BY 1, 2
    """
    if hourly_from == "__BODY__":
        return hourly_body
    # hourly feeds BOTH the observed-hour list and the lag join — the
    # Spark path checkpoints it so the corpus aggregates once
    hourly_rel = (
        f"hourly AS (SELECT * FROM {hourly_from})" if hourly_from
        else f"hourly AS ({hourly_body})"
    )
    return f"""
        WITH {hourly_rel},
        hours AS (SELECT DISTINCT hour_idx FROM hourly),
        merged AS (
            SELECT c.tgt AS hour_idx, c.user_id,
                   CAST(SUM(c.cnt) AS BIGINT) AS n6
            FROM (
                SELECT h.hour_idx + k.k AS tgt, h.user_id, h.cnt
                FROM hourly h CROSS JOIN (VALUES {lags}) AS k(k)
            ) c
            JOIN hours ho ON ho.hour_idx = c.tgt
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT hour_idx, user_id, n6,
                   ROW_NUMBER() OVER (PARTITION BY hour_idx
                                      ORDER BY n6 DESC, user_id) AS rnk
            FROM merged
        )
        SELECT hour_idx, CAST(rnk AS BIGINT) AS rnk, user_id,
               n6 AS n_events_6h
        FROM ranked WHERE rnk <= {TOPK_SLIDE_K}
        ORDER BY hour_idx, rnk
    """


def events_topk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{_TOPK_SLIDE_HOURS}h top-{TOPK_SLIDE_K} user leaderboard
    per observed hour — see _topk_sliding_sql. The (hour, user) count
    grid is checkpointed so its two consumers share ONE corpus scan."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    hourly = cached_barrier_view(
        spark, sf_dir, "topk_slide_hourly",
        lambda: spark.sql(_topk_sliding_sql("spark", hourly_from="__BODY__")),
        tables=("events",),
    )
    return spark.sql(_topk_sliding_sql("spark", hourly_from=hourly))


EVENTS_TOPK_SLIDING_SQL = _topk_sliding_sql("duck")


# ---------------------------------------------------------------------------
# events_holt_winters — additive Holt-Winters forecast (weekly season)
# ---------------------------------------------------------------------------

_HW_HORIZON = 7
# α=1/2, β=1/4, γ=1/4: DYADIC smoothing constants — every recurrence
# step is add/sub/multiply-by-a-binary-fraction over integer-seeded
# doubles, so both engines execute the identical IEEE op sequence and
# the state matches bit-for-bit at every step (the only rounding that
# ever happens is the same correctly-rounded op on the same operands).


def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing, weekly
    season) over each type's daily event counts, forecasting the next
    {_HW_HORIZON} days — the capacity-planning upgrade of
    events_forecast_ewma_backtest (level + trend + day-of-week in one
    recurrence instead of a flat EWMA).

    Semantics (both engines, bit-exact): the daily series is the
    GLOBAL zero-filled calendar [min_day, max_day]; init lvl = y_0,
    trd = 0, season = zeros (the day-0 update then fixes lvl = y_0
    exactly, so init-vs-after-day-0 is the same state); per day k
        lvl' = 0.5·(y_k − s[k%7]) + 0.5·(lvl + trd)
        trd' = 0.25·(lvl' − lvl) + 0.75·trd
        s[k%7] = 0.25·(y_k − lvl') + 0.75·s[k%7]
    forecast_h = (lvl + h·trd) + s[(nd+h−1)%7], emitted as half-away
    micro BIGINTs. The oracle replays the identical recurrence as a
    DuckDB recursive CTE carrying the 7-slot season list.

    Scale posture: the corpus collapses to the checkpointed
    (type, day) rollup shared with events_rolling_slope; the kernel is
    ONE applyInPandas over the calendar-grid relation (|types|·|days|
    rows — KiB at any corpus size). The recurrence is inherently
    sequential per type, which is why it runs on the GRID, never the
    events."""
    import math

    import pandas as pd
    from pyspark.sql import types as T

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
    grid = spark.sql(
        """
        WITH span AS (SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi
                      FROM typed_daily),
        types AS (SELECT DISTINCT event_type FROM typed_daily),
        spine AS (
            SELECT t.event_type, s.lo, g.idx
            FROM types t CROSS JOIN span s
            LATERAL VIEW explode(sequence(0, CAST(s.hi - s.lo AS INT)))
                g AS idx
        )
        SELECT sp.event_type, sp.idx,
               COALESCE(d.x, CAST(0 AS BIGINT)) AS y
        FROM spine sp
        LEFT JOIN typed_daily d
          ON d.event_type = sp.event_type AND d.day_idx = sp.lo + sp.idx
        """
    )

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("horizon", T.LongType()),
            T.StructField("forecast_micro", T.LongType()),
        ]
    )

    def kernel(key, pdf):
        pdf = pdf.sort_values("idx")
        ys = pdf["y"].tolist()
        lvl, trd = float(ys[0]), 0.0
        s = [0.0] * 7
        for k, yk in enumerate(ys):
            y = float(yk)
            s_old = s[k % 7]
            lvl_new = 0.5 * (y - s_old) + 0.5 * (lvl + trd)
            trd = 0.25 * (lvl_new - lvl) + 0.75 * trd
            s[k % 7] = 0.25 * (y - lvl_new) + 0.75 * s_old
            lvl = lvl_new
        nd = len(ys)
        rows = []
        for h in range(1, _HW_HORIZON + 1):
            f = lvl + h * trd + s[(nd + h - 1) % 7]
            fm = f * 1000000.0
            micro = int(math.floor(abs(fm) + 0.5))
            rows.append([key[0], h, -micro if fm < 0 else micro])
        return pd.DataFrame(
            rows, columns=["event_type", "horizon", "forecast_micro"]
        )

    return (
        grid.groupBy("event_type")
        .applyInPandas(kernel, out_schema)
        .orderBy("event_type", "horizon")
    )


EVENTS_HOLT_WINTERS_SQL = f"""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(floor(CAST(epoch_us(ts) AS BIGINT) / 86400000000.0)
                    AS BIGINT) AS day_idx,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi FROM daily),
    grid AS (
        SELECT t.event_type, g.k AS idx, COALESCE(d.y, 0) AS y
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN span s
        CROSS JOIN UNNEST(range(0, s.hi - s.lo + 1)) AS g(k)
        LEFT JOIN daily d
          ON d.event_type = t.event_type AND d.day_idx = s.lo + g.k
    ),
    nd AS (SELECT CAST(hi - lo + 1 AS BIGINT) AS nd FROM span),
    rec AS (
        SELECT event_type, CAST(1 AS BIGINT) AS k,
               CAST(y AS DOUBLE) AS lvl, CAST(0 AS DOUBLE) AS trd,
               -- CAST: a bare [0.0, …] literal types as DECIMAL(2,1)[]
               -- and would round every season update to one decimal
               CAST([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS DOUBLE[]) AS s
        FROM grid WHERE idx = 0
        UNION ALL
        SELECT event_type, k + 1,
               lvl_new,
               0.25 * (lvl_new - lvl) + 0.75 * trd,
               list_transform([1, 2, 3, 4, 5, 6, 7],
                   j -> CASE WHEN j = slot
                             THEN 0.25 * (y - lvl_new) + 0.75 * s_old
                             ELSE s[j] END)
        FROM (
            SELECT r.event_type, r.k, r.lvl, r.trd, r.s,
                   CAST(g.y AS DOUBLE) AS y,
                   r.s[CAST(r.k % 7 AS BIGINT) + 1] AS s_old,
                   CAST(r.k % 7 AS BIGINT) + 1 AS slot,
                   0.5 * (CAST(g.y AS DOUBLE)
                          - r.s[CAST(r.k % 7 AS BIGINT) + 1])
                   + 0.5 * (r.lvl + r.trd) AS lvl_new
            FROM rec r
            JOIN grid g ON g.event_type = r.event_type AND g.idx = r.k
        ) t
    ),
    last AS (SELECT r.* FROM rec r, nd WHERE r.k = nd.nd)
    SELECT l.event_type,
           CAST(hh.h AS BIGINT) AS horizon,
           CAST(round((l.lvl + hh.h * l.trd
                       + l.s[CAST((n.nd + hh.h - 1) % 7 AS BIGINT) + 1])
                      * 1000000) AS BIGINT) AS forecast_micro
    FROM last l
    CROSS JOIN nd n
    CROSS JOIN UNNEST([1, 2, 3, 4, 5, 6, 7]) AS hh(h)
    ORDER BY event_type, horizon
"""


# ---------------------------------------------------------------------------
# window_rolling_corr_pair — trailing correlation between two KPI series
# ---------------------------------------------------------------------------

_RCORR_DAYS = 14
_RCORR_A, _RCORR_B = "click", "purchase"


def _rolling_corr_body(engine: str) -> str:
    """Trailing {_RCORR_DAYS}-day Pearson correlation between the
    '{_RCORR_A}' and '{_RCORR_B}' daily dollar series — the rolling
    twin of agg_daily_corr_matrix (a correlation BREAK between two
    coupled KPIs is the metric-tree alarm; the global coefficient
    can't see when it happened).

    Exactness: the paired relation is one conditional aggregation over
    the shared daily rollup (dollars = cents DIV 100, nonnegative so
    div/floor agree), ZERO-FILLED onto the min..max calendar day spine
    (the holt_winters/alert_debounce discipline) so the ROWS frame of
    {_RCORR_DAYS} rows really spans {_RCORR_DAYS} calendar days even
    across gap days; all five frame sums are exact BIGINTs over ROWS
    BETWEEN {_RCORR_DAYS - 1} PRECEDING; the coefficient is one double
    expression in identical order, round(…, 6), NULL under n < 2 or
    zero variance.

    Scale posture: corpus rows collapse to the calendar-bounded daily
    rollup in one map-side-combined pass; the frame window runs over
    the |days| grid (whitelisted bound)."""
    intdiv = "DIV" if engine == "spark" else "//"
    if engine == "spark":
        spine = """
            SELECT s.lo + g.idx AS day_idx
            FROM span s
            LATERAL VIEW explode(sequence(0, CAST(s.hi - s.lo AS INT)))
                g AS idx
        """
    else:
        spine = """
            SELECT s.lo + g.k AS day_idx
            FROM span s CROSS JOIN UNNEST(range(0, s.hi - s.lo + 1)) AS g(k)
        """
    frame = (f"ORDER BY day_idx ROWS BETWEEN {_RCORR_DAYS - 1} "
             "PRECEDING AND CURRENT ROW")
    return f"""
        WITH daily AS ({_daily(engine)}),
        observed AS (
            SELECT day_idx,
                   CAST(COALESCE(SUM(CASE WHEN event_type = '{_RCORR_A}'
                                          THEN cents END), 0)
                        {intdiv} 100 AS BIGINT) AS a,
                   CAST(COALESCE(SUM(CASE WHEN event_type = '{_RCORR_B}'
                                          THEN cents END), 0)
                        {intdiv} 100 AS BIGINT) AS b
            FROM daily GROUP BY day_idx
        ),
        span AS (SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi
                 FROM observed),
        paired AS (
            SELECT CAST(sp.day_idx AS BIGINT) AS day_idx,
                   CAST(COALESCE(o.a, 0) AS BIGINT) AS a,
                   CAST(COALESCE(o.b, 0) AS BIGINT) AS b
            FROM ({spine}) sp
            LEFT JOIN observed o ON o.day_idx = sp.day_idx
        ),
        framed AS (
            SELECT day_idx, a, b,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n,
                   CAST(SUM(a) OVER w AS BIGINT) AS sa,
                   CAST(SUM(b) OVER w AS BIGINT) AS sb,
                   CAST(SUM(a * a) OVER w AS BIGINT) AS saa,
                   CAST(SUM(b * b) OVER w AS BIGINT) AS sbb,
                   CAST(SUM(a * b) OVER w AS BIGINT) AS sab
            FROM paired
            WINDOW w AS ({frame})
        )
        SELECT day_idx, a AS {_RCORR_A}_dollars, b AS {_RCORR_B}_dollars,
               n AS n_days,
               CASE WHEN n < 2 OR n * saa = sa * sa OR n * sbb = sb * sb
                    THEN NULL
                    ELSE round(CAST(n * sab - sa * sb AS DOUBLE)
                               / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                                      * CAST(n * sbb - sb * sb AS DOUBLE)),
                               6)
               END AS rolling_corr
        FROM framed
        ORDER BY day_idx
    """


def window_rolling_corr_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 14-day KPI correlation — see _rolling_corr_body."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_rolling_corr_body("spark"))


WINDOW_ROLLING_CORR_PAIR_SQL = _rolling_corr_body("duck")


# ---------------------------------------------------------------------------
# events_new_user_curve — first-seen growth curve
# ---------------------------------------------------------------------------


def _new_user_body(engine: str) -> str:
    """Daily new-vs-returning decomposition and the cumulative
    acquired-user curve: a user is NEW on their first-ever active day
    (one user-keyed MIN aggregate — the first-touch rule), every later
    active day they count as returning. The top-line growth dashboard
    (DAU says how many; this says which kind).

    Scale posture: one scan → the (user, day) distinct (uniform
    shuffle) → a user-keyed MIN and a day-keyed count, all map-side
    combined; the cumulative window runs over the |days| calendar grid
    (whitelisted bound)."""
    return f"""
        WITH ev AS ({_ev(engine)}),
        ud AS (SELECT DISTINCT user_id, day_idx FROM ev),
        fu AS (SELECT user_id, MIN(day_idx) AS first_day
               FROM ud GROUP BY user_id),
        newd AS (SELECT first_day AS day_idx,
                        CAST(COUNT(*) AS BIGINT) AS n_new
                 FROM fu GROUP BY first_day),
        act AS (SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS n_active
                FROM ud GROUP BY day_idx)
        SELECT a.day_idx,
               a.n_active,
               CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
               CAST(a.n_active - COALESCE(n.n_new, 0) AS BIGINT)
                   AS n_returning,
               CAST(SUM(COALESCE(n.n_new, 0)) OVER (
                        ORDER BY a.day_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_users,
               CAST(floor(COALESCE(n.n_new, 0) * 1000000.0 / a.n_active)
                    AS BIGINT) AS new_share_ppm
        FROM act a LEFT JOIN newd n ON n.day_idx = a.day_idx
        ORDER BY a.day_idx
    """


def events_new_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning growth curve — see _new_user_body."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_new_user_body("spark"))


EVENTS_NEW_USER_CURVE_SQL = _new_user_body("duck")


# ---------------------------------------------------------------------------
# agg_bayes_beta_binomial — Bayesian conversion posterior per arm
# ---------------------------------------------------------------------------


def _bayes_bb_body(engine: str) -> str:
    """Beta-Binomial conversion posterior per experiment arm (the
    ``user_id % 2`` split the CUPED/SPRT/Welch tier shares): uniform
    Beta(1,1) prior + per-user converted-or-not (≥1 purchase) gives
    the exact posterior Beta(1+x, 1+n−x) — the Bayesian companion the
    frequentist gates lack when arms are small (the posterior mean is
    the Laplace-smoothed rate; the sd is the stopping signal).

    Exactness: x and n are exact counts; post_mean_ppm is one integer
    cross-multiplied floor; the posterior sd is one double expression
    over exact integers in identical order, rounded to ppm.

    Scale posture: one scan → user-keyed conversion flags (map-side
    combined MAX) → a 2-row arm aggregate; everything after is
    constant-size."""
    del engine  # identical on both sides
    return """
        WITH conv AS (
            SELECT user_id, user_id % 2 AS arm,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(converted) AS BIGINT) AS x
            FROM conv GROUP BY arm
        )
        SELECT arm, n_users, x AS conversions,
               CAST(1 + x AS BIGINT) AS post_alpha,
               CAST(1 + n_users - x AS BIGINT) AS post_beta,
               CAST(floor((1 + x) * 1000000.0 / (2 + n_users)) AS BIGINT)
                   AS post_mean_ppm,
               CAST(round(sqrt((CAST(1 + x AS DOUBLE)
                                * CAST(1 + n_users - x AS DOUBLE))
                               / (CAST(2 + n_users AS DOUBLE)
                                  * CAST(2 + n_users AS DOUBLE)
                                  * CAST(3 + n_users AS DOUBLE)))
                          * 1000000) AS BIGINT) AS post_sd_ppm
        FROM arms
        ORDER BY arm
    """


def agg_bayes_beta_binomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta-Binomial posterior per arm — see _bayes_bb_body."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_bayes_bb_body("spark"))


AGG_BAYES_BETA_BINOMIAL_SQL = _bayes_bb_body("duck")


# ---------------------------------------------------------------------------
# events_holt_winters_backtest — one-step-ahead in-sample error of the HW fit
# ---------------------------------------------------------------------------

_HW_WARMUP = 7  # scored days start after one full season


def events_holt_winters_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-step-ahead backtest of the Holt-Winters recurrence (see
    events_holt_winters): each day k ≥ {_HW_WARMUP} is predicted from
    the state BEFORE consuming y_k (pred = lvl + trd + s[k%7]) and the
    report is the per-type WAPE (Σ|pred−y| / Σy, in ppm) — the
    should-we-trust-this-forecast number next to the forecast itself
    (weighted APE, not MAPE: zero-filled days make per-day percentage
    errors undefined).

    Exactness: the error accumulator rides INSIDE the same dyadic
    recurrence (|pred−y| is a dyadic rational, summed in day order in
    both engines — bit-exact like the state itself); Σy is an exact
    BIGINT; WAPE is one double division floored to ppm.

    Scale posture: identical to events_holt_winters — corpus collapses
    to the checkpointed (type, day) rollup; one applyInPandas over the
    calendar grid vs the DuckDB recursive CTE carrying (state, err_sum,
    y_sum)."""
    import math

    import pandas as pd
    from pyspark.sql import types as T

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
    grid = spark.sql(
        """
        WITH span AS (SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi
                      FROM typed_daily),
        types AS (SELECT DISTINCT event_type FROM typed_daily),
        spine AS (
            SELECT t.event_type, s.lo, g.idx
            FROM types t CROSS JOIN span s
            LATERAL VIEW explode(sequence(0, CAST(s.hi - s.lo AS INT)))
                g AS idx
        )
        SELECT sp.event_type, sp.idx,
               COALESCE(d.x, CAST(0 AS BIGINT)) AS y
        FROM spine sp
        LEFT JOIN typed_daily d
          ON d.event_type = sp.event_type AND d.day_idx = sp.lo + sp.idx
        """
    )

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n_scored_days", T.LongType()),
            T.StructField("y_total", T.LongType()),
            T.StructField("abs_err_micro", T.LongType()),
            T.StructField("wape_ppm", T.LongType()),
        ]
    )

    def kernel(key, pdf):
        pdf = pdf.sort_values("idx")
        ys = pdf["y"].tolist()
        lvl, trd = float(ys[0]), 0.0
        s = [0.0] * 7
        err_sum, y_sum, scored = 0.0, 0, 0
        for k, yk in enumerate(ys):
            y = float(yk)
            if k >= _HW_WARMUP:
                pred = lvl + trd + s[k % 7]
                err_sum = err_sum + abs(pred - y)
                y_sum += int(yk)
                scored += 1
            s_old = s[k % 7]
            lvl_new = 0.5 * (y - s_old) + 0.5 * (lvl + trd)
            trd = 0.25 * (lvl_new - lvl) + 0.75 * trd
            s[k % 7] = 0.25 * (y - lvl_new) + 0.75 * s_old
            lvl = lvl_new
        em = err_sum * 1000000.0
        abs_err_micro = int(math.floor(abs(em) + 0.5))
        wape = (
            int(math.floor(err_sum * 1000000.0 / y_sum))
            if y_sum > 0 else None
        )
        return pd.DataFrame(
            [[key[0], scored, y_sum, abs_err_micro, wape]],
            columns=["event_type", "n_scored_days", "y_total",
                     "abs_err_micro", "wape_ppm"],
        )

    return (
        grid.groupBy("event_type")
        .applyInPandas(kernel, out_schema)
        .orderBy("event_type")
    )


EVENTS_HOLT_WINTERS_BACKTEST_SQL = f"""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(floor(CAST(epoch_us(ts) AS BIGINT) / 86400000000.0)
                    AS BIGINT) AS day_idx,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi FROM daily),
    grid AS (
        SELECT t.event_type, g.k AS idx, COALESCE(d.y, 0) AS y
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN span s
        CROSS JOIN UNNEST(range(0, s.hi - s.lo + 1)) AS g(k)
        LEFT JOIN daily d
          ON d.event_type = t.event_type AND d.day_idx = s.lo + g.k
    ),
    nd AS (SELECT CAST(hi - lo + 1 AS BIGINT) AS nd FROM span),
    rec AS (
        SELECT event_type, CAST(1 AS BIGINT) AS k,
               CAST(y AS DOUBLE) AS lvl, CAST(0 AS DOUBLE) AS trd,
               CAST([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS DOUBLE[]) AS s,
               CAST(0 AS DOUBLE) AS err_sum,
               CAST(0 AS BIGINT) AS y_sum,
               CAST(0 AS BIGINT) AS scored
        FROM grid WHERE idx = 0
        UNION ALL
        SELECT event_type, k + 1,
               lvl_new,
               0.25 * (lvl_new - lvl) + 0.75 * trd,
               list_transform([1, 2, 3, 4, 5, 6, 7],
                   j -> CASE WHEN j = slot
                             THEN 0.25 * (y - lvl_new) + 0.75 * s_old
                             ELSE s[j] END),
               err_new, y_new, scored_new
        FROM (
            SELECT r.event_type, r.k, r.lvl, r.trd, r.s,
                   CAST(g.y AS DOUBLE) AS y,
                   r.s[CAST(r.k % 7 AS BIGINT) + 1] AS s_old,
                   CAST(r.k % 7 AS BIGINT) + 1 AS slot,
                   0.5 * (CAST(g.y AS DOUBLE)
                          - r.s[CAST(r.k % 7 AS BIGINT) + 1])
                   + 0.5 * (r.lvl + r.trd) AS lvl_new,
                   CASE WHEN r.k >= {_HW_WARMUP}
                        THEN r.err_sum + abs((r.lvl + r.trd
                             + r.s[CAST(r.k % 7 AS BIGINT) + 1])
                             - CAST(g.y AS DOUBLE))
                        ELSE r.err_sum END AS err_new,
                   CASE WHEN r.k >= {_HW_WARMUP} THEN r.y_sum + g.y
                        ELSE r.y_sum END AS y_new,
                   CASE WHEN r.k >= {_HW_WARMUP} THEN r.scored + 1
                        ELSE r.scored END AS scored_new
            FROM rec r
            JOIN grid g ON g.event_type = r.event_type AND g.idx = r.k
        ) t
    )
    SELECT r.event_type,
           CAST(r.scored AS BIGINT) AS n_scored_days,
           CAST(r.y_sum AS BIGINT) AS y_total,
           CAST(floor(abs(r.err_sum * 1000000.0) + 0.5) AS BIGINT)
               AS abs_err_micro,
           CASE WHEN r.y_sum > 0
                THEN CAST(floor(r.err_sum * 1000000.0 / r.y_sum) AS BIGINT)
                ELSE NULL END AS wape_ppm
    FROM rec r, nd n WHERE r.k = n.nd
    ORDER BY r.event_type
"""


# ---------------------------------------------------------------------------
# events_did_estimator — difference-in-differences with a pre-trend check
# ---------------------------------------------------------------------------


def _did_body(engine: str) -> str:
    """Difference-in-differences effect estimate (Card & Krueger shape)
    over the event dollar series: treatment group = odd user_ids (the
    deterministic assignment every experimentation id here uses),
    treatment period = the second half of the observed day span. The
    estimate is Δ = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), and
    the PARALLEL-TRENDS diagnostic quarters the span: drift =
    (gap in pre-late) − (gap in pre-early), where gap = ȳ_T − ȳ_C — a
    large |drift| relative to Δ says the identifying assumption is
    suspect before anyone ships the readout.

    Exactness: cell sums are exact BIGINT cents (cents ≥ 0 so
    integer-division floors agree); every mean is one
    floor(sum·1e6/n) micro-dollar integer; Δ and drift are integer
    differences of those micro means. NULL cells (an empty quarter)
    propagate to NULL diagnostics rather than fake zeros.

    Scale posture: one scan → the 1-row span broadcast → ONE
    conditional aggregate producing every cell (8 scalar-subquery cell
    probes would re-expand the event chain per cell — the §6j
    discipline says conditional aggregation instead)."""
    intdiv = "DIV" if engine == "spark" else "//"

    def cell(cond: str) -> str:
        return (f"CAST(floor(SUM(CASE WHEN {cond} THEN cents END)"
                f" * 1000000.0"
                f" / SUM(CASE WHEN {cond} THEN 1 END)) AS BIGINT)")

    return f"""
        WITH d AS (
            SELECT user_id % 2 = 1 AS treated, day_idx, cents
            FROM ({_ev(engine)}) WHERE cents >= 0
        ),
        span AS (SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi FROM d),
        halves AS (
            SELECT treated,
                   day_idx >= lo + (hi - lo + 1) {intdiv} 2 AS post,
                   -- drift quarters are halves of the PRE period only:
                   -- quartering the full span put the pre/post boundary
                   -- day in BOTH q1 and post on odd-length spans, so the
                   -- parallel-trends diagnostic absorbed treatment effect
                   -- (ADVICE r9). pre_len = (hi-lo+1) DIV 2 is exactly
                   -- where post starts, so quarter<=1 <=> NOT post; the
                   -- greatest() guards the 1-day span (pre_len = 0).
                   (day_idx - lo) * 2 {intdiv}
                       greatest((hi - lo + 1) {intdiv} 2, 1) AS quarter,
                   cents
            FROM d, span
        ),
        wide AS (
            SELECT
                {cell("treated AND NOT post")} AS t_pre,
                {cell("treated AND post")} AS t_post,
                {cell("NOT treated AND NOT post")} AS c_pre,
                {cell("NOT treated AND post")} AS c_post,
                {cell("treated AND NOT post AND quarter = 0")} AS t_q0,
                {cell("NOT treated AND NOT post AND quarter = 0")} AS c_q0,
                {cell("treated AND NOT post AND quarter = 1")} AS t_q1,
                {cell("NOT treated AND NOT post AND quarter = 1")} AS c_q1
            FROM halves
        )
        SELECT t_pre AS treated_pre_micro,
               t_post AS treated_post_micro,
               c_pre AS control_pre_micro,
               c_post AS control_post_micro,
               CAST((t_post - t_pre) - (c_post - c_pre) AS BIGINT)
                   AS did_micro,
               CAST((t_q1 - c_q1) - (t_q0 - c_q0) AS BIGINT)
                   AS pretrend_drift_micro
        FROM wide
    """


def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences + parallel-trends drift — see
    _did_body."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_did_body("spark"))


EVENTS_DID_ESTIMATOR_SQL = _did_body("duck")


QUERIES: dict[str, tuple] = {
    "events_holt_winters_backtest": (
        events_holt_winters_backtest,
        EVENTS_HOLT_WINTERS_BACKTEST_SQL,
    ),
    "events_new_user_curve": (
        events_new_user_curve,
        EVENTS_NEW_USER_CURVE_SQL,
    ),
    "agg_bayes_beta_binomial": (
        agg_bayes_beta_binomial,
        AGG_BAYES_BETA_BINOMIAL_SQL,
    ),
    "window_rolling_corr_pair": (
        window_rolling_corr_pair,
        WINDOW_ROLLING_CORR_PAIR_SQL,
    ),
    "events_holt_winters": (events_holt_winters, EVENTS_HOLT_WINTERS_SQL),
    "events_did_estimator": (
        events_did_estimator,
        EVENTS_DID_ESTIMATOR_SQL,
    ),
    "events_rfm_segments": (events_rfm_segments, EVENTS_RFM_SEGMENTS_SQL),
    "events_anomaly_seasonal_residual": (
        events_anomaly_seasonal_residual,
        EVENTS_ANOMALY_SEASONAL_RESIDUAL_SQL,
    ),
    "events_topk_sliding": (events_topk_sliding, EVENTS_TOPK_SLIDING_SQL),
    "window_max_drawdown": (window_max_drawdown, WINDOW_MAX_DRAWDOWN_SQL),
    "agg_mann_whitney_u": (agg_mann_whitney_u, AGG_MANN_WHITNEY_U_SQL),
    "agg_cramers_v": (agg_cramers_v, AGG_CRAMERS_V_SQL),
    "events_hazard_nelson_aalen": (
        events_hazard_nelson_aalen,
        EVENTS_HAZARD_NELSON_AALEN_SQL,
    ),
    "profile_benford_deviation": (
        profile_benford_deviation,
        PROFILE_BENFORD_DEVIATION_SQL,
    ),
    "events_ewma_smooth": (events_ewma_smooth, EVENTS_EWMA_SMOOTH_SQL),
    "events_bollinger_bands": (
        events_bollinger_bands,
        EVENTS_BOLLINGER_BANDS_SQL,
    ),
    "agg_kendall_tau_daily": (
        agg_kendall_tau_daily,
        AGG_KENDALL_TAU_DAILY_SQL,
    ),
    "agg_spearman_rho_daily": (
        agg_spearman_rho_daily,
        AGG_SPEARMAN_RHO_DAILY_SQL,
    ),
    "agg_kruskal_wallis": (agg_kruskal_wallis, AGG_KRUSKAL_WALLIS_SQL),
    "agg_daily_corr_matrix": (
        agg_daily_corr_matrix,
        AGG_DAILY_CORR_MATRIX_SQL,
    ),
    "events_attribution_touch": (
        events_attribution_touch,
        EVENTS_ATTRIBUTION_TOUCH_SQL,
    ),
    "agg_sprt_sequential": (agg_sprt_sequential, AGG_SPRT_SEQUENTIAL_SQL),
    "agg_winsorized_mean": (agg_winsorized_mean, AGG_WINSORIZED_MEAN_SQL),
    "events_seasonal_decomposition": (
        events_seasonal_decomposition,
        EVENTS_SEASONAL_DECOMPOSITION_SQL,
    ),
    "agg_power_mde": (agg_power_mde, AGG_POWER_MDE_SQL),
    "events_contribution_wow": (
        events_contribution_wow,
        EVENTS_CONTRIBUTION_WOW_SQL,
    ),
    "events_error_budget_burn": (
        events_error_budget_burn,
        EVENTS_ERROR_BUDGET_BURN_SQL,
    ),
    "events_cuped_adjustment": (
        events_cuped_adjustment,
        EVENTS_CUPED_ADJUSTMENT_SQL,
    ),
    "agg_ratio_metric_delta": (
        agg_ratio_metric_delta,
        AGG_RATIO_METRIC_DELTA_SQL,
    ),
    "events_forecast_ewma_backtest": (
        events_forecast_ewma_backtest,
        EVENTS_FORECAST_EWMA_BACKTEST_SQL,
    ),
    "events_active_users_rolling": (
        events_active_users_rolling,
        EVENTS_ACTIVE_USERS_ROLLING_SQL,
    ),
    "profile_gini_coefficient": (
        profile_gini_coefficient,
        PROFILE_GINI_COEFFICIENT_SQL,
    ),
}
