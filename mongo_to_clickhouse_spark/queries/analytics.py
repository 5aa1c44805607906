"""Product-analytics workloads over the events stream — the query shapes a
learning-analytics deployment (the reference's domain) actually runs on the
replicated data: funnels, retention cohorts, rarity scoring.

All-deterministic arithmetic (counts, date buckets, integer ranks) so every
query is exactly oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongo_to_clickhouse_spark.io import load_table


def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel per user: earliest signup, earliest subsequent
    purchase, conversion flag + hours-to-convert."""
    ev = load_table(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.collect_list("ts").alias("purchase_times"))
    )
    first_after = F.array_min(
        F.filter(
            F.col("purchase_times"), lambda t: t >= F.col("first_signup")
        )
    )
    return (
        signup.join(purchase, "user_id", "left")
        .select(
            "user_id",
            F.date_format("first_signup", "yyyy-MM-dd HH:mm:ss").alias(
                "first_signup"
            ),
            first_after.isNotNull().alias("converted"),
            F.floor(
                (F.unix_timestamp(first_after) - F.unix_timestamp("first_signup"))
                / 3600
            ).alias("hours_to_convert"),
        )
    )


FUNNEL_SQL = """
    WITH signup AS (
        SELECT user_id, MIN(ts) AS first_signup FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT s.user_id, s.first_signup, MIN(p.ts) AS first_purchase
        FROM signup s LEFT JOIN events p
          ON p.user_id = s.user_id AND p.event_type = 'purchase'
         AND p.ts >= s.first_signup
        GROUP BY s.user_id, s.first_signup
    )
    SELECT user_id,
           strftime(first_signup, '%Y-%m-%d %H:%M:%S') AS first_signup,
           first_purchase IS NOT NULL AS converted,
           CAST(floor((epoch(date_trunc('second', first_purchase))
                       - epoch(date_trunc('second', first_signup))) / 3600)
                AS BIGINT) AS hours_to_convert
    FROM conv
"""


FUNNEL_WINDOW_DAYS = 3


def events_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-CONSTRAINED funnel: per signup EVENT (not per user), did the
    same user purchase within {FUNNEL_WINDOW_DAYS} days? Reported as
    per-day cohort conversion (n_signups / n_converted / exact ppm).
    Extends funnel_signup_purchase with the max-delay window every real
    funnel has, and counts every signup, not just each user's first.

    Plan: the join_asof_forward union→one-window trick — signups and
    purchases union into one relation, ONE user-keyed shuffle + sort,
    first_value(purchase ts) over [current, unbounded following] gives
    each signup its next purchase; the Δt bound is a µs-exact filter
    (second-truncating arithmetic misattributes at the boundary — the
    round-4 ADVICE class). No range join, no per-user explode."""
    ev = load_table(spark, sf_dir, "events")
    sides = ev.filter(
        F.col("event_type").isin("signup", "purchase")
    ).select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
        F.when(F.col("event_type") == "signup", 1).otherwise(2).alias("side"),
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    scored = (
        sides.withColumn("next_p", F.first("p_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "signup")
        .select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            (
                F.col("next_p").isNotNull()
                & (
                    # fixture ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
                    F.unix_micros(F.col("next_p").cast("timestamp"))
                    - F.unix_micros(F.col("ts").cast("timestamp"))
                    <= FUNNEL_WINDOW_DAYS * 86400 * 1_000_000
                )
            ).alias("converted"),
        )
    )
    return (
        scored.groupBy("day")
        .agg(
            F.count("*").cast("bigint").alias("n_signups"),
            F.sum(F.col("converted").cast("bigint"))
            .cast("bigint")
            .alias("n_converted"),
        )
        .withColumn(
            "conv_ppm",
            F.expr("(n_converted * 1000000) DIV n_signups").cast("bigint"),
        )
        .orderBy("day")
    )


EVENTS_WINDOWED_FUNNEL_SQL = f"""
    WITH s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    nxt AS (
        SELECT s.user_id, s.ts, r.ts AS next_p
        FROM s ASOF LEFT JOIN p r
          ON s.user_id = r.user_id AND s.ts <= r.ts
    ),
    scored AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               (next_p IS NOT NULL AND
                epoch_us(next_p) - epoch_us(ts)
                    <= {FUNNEL_WINDOW_DAYS * 86400 * 1_000_000}) AS converted
        FROM nxt
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted,
           CAST((SUM(CASE WHEN converted THEN 1 ELSE 0 END) * 1000000)
                // COUNT(*) AS BIGINT) AS conv_ppm
    FROM scored GROUP BY day ORDER BY day
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users bucketed by first-seen day
    (cohort), counted by day-offset of subsequent activity."""
    ev = load_table(spark, sf_dir, "events")
    first_day = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("active_day")
    ).distinct()
    return (
        activity.join(first_day, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.datediff("active_day", "cohort_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


RETENTION_SQL = """
    WITH first_day AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort,
           CAST(date_diff('day', f.cohort_day, a.active_day) AS INT) AS day_offset,
           COUNT(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN first_day f ON a.user_id = f.user_id
    GROUP BY f.cohort_day, date_diff('day', f.cohort_day, a.active_day)
"""


def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document rarity via integer frequency ranks (a perplexity proxy
    without float log-probs): rank every vocabulary token by corpus
    frequency (rank 1 = most common), score each doc by its mean token
    rank — higher = rarer vocabulary.

    The vocabulary rank uses the distributed two-pass sort-rank
    (operators/rank.py) instead of a no-partition ROW_NUMBER window: at
    web scale the vocabulary is billions of tokens, and a global window
    would serialize all of them through one task. (freq desc, tok) is a
    total order, so the decomposition equals the oracle's naive
    row_number exactly."""
    from mongo_to_clickhouse_spark.operators.rank import distributed_global_rank

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    ranked = distributed_global_rank(
        freq, [F.col("freq").desc(), F.col("tok")], rank_col="rank"
    )
    return (
        toks.join(ranked, "tok")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum("rank") / F.count("*"), 4
            ).alias("mean_token_rank"),
            F.count("*").alias("n_tokens"),
        )
    )


TEXT_RARITY_SQL = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    ranked AS (
        SELECT tok, row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rank
        FROM toks GROUP BY tok
    )
    SELECT t.doc_id,
           round(SUM(r.rank) / COUNT(*), 4) AS mean_token_rank,
           COUNT(*) AS n_tokens
    FROM toks t JOIN ranked r ON t.tok = r.tok
    GROUP BY t.doc_id
"""


def _ltv_curve_sql(engine: str) -> str:
    """Engine-shared cohort LTV curve: users cohorted by first-event
    week, purchase revenue accumulated per (cohort, weeks-since) cell,
    cumulative LTV-per-user in exact micro-dollars — the lifetime-value
    triangle finance reads next to the retention triangle (retention
    says who comes back; LTV says what that's worth). Revenue floors to
    exact cents once; the cumulative window runs over the (cohort ×
    weeks) AGGREGATE, partitioned by cohort; LTV divides by the cohort
    size with one exact integer division."""
    epoch = (
        "unix_micros(CAST(ts AS TIMESTAMP))"
        if engine == "spark"
        else "CAST(epoch_us(ts) AS BIGINT)"
    )
    intdiv = "DIV" if engine == "spark" else "//"
    wk = f"CAST(floor({epoch} / 604800000000) AS BIGINT)"
    return f"""
        WITH ev AS (
            SELECT user_id, event_type, {wk} AS wk,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        cohorts AS (
            SELECT user_id, MIN(wk) AS cohort_wk
            FROM ev GROUP BY user_id
        ),
        sizes AS (
            SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM cohorts GROUP BY cohort_wk
        ),
        cells AS (
            SELECT c.cohort_wk, e.wk - c.cohort_wk AS week_since,
                   CAST(SUM(CASE WHEN e.event_type = 'purchase'
                                 THEN e.cents ELSE 0 END) AS BIGINT)
                       AS rev_cents
            FROM ev e JOIN cohorts c ON c.user_id = e.user_id
            GROUP BY c.cohort_wk, e.wk - c.cohort_wk
        ),
        cum AS (
            SELECT cohort_wk, week_since,
                   CAST(SUM(rev_cents) OVER (
                       PARTITION BY cohort_wk ORDER BY week_since)
                       AS BIGINT) AS cum_cents
            FROM cells
        )
        SELECT m.cohort_wk, m.week_since, s.n_users, m.cum_cents,
               CAST(m.cum_cents * 10000 {intdiv} s.n_users AS BIGINT)
                   AS ltv_micro_per_user
        FROM cum m JOIN sizes s ON s.cohort_wk = m.cohort_wk
        ORDER BY m.cohort_wk, m.week_since
    """


def events_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle — see _ltv_curve_sql. One
    user-keyed cohort aggregate, one (cohort, week)-keyed revenue
    aggregate, then windows over the weeks-bounded cell relation and a
    broadcast-sized cohort-size join. Same shuffle family as
    retention_cohorts."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ltv_curve_sql("spark"))


EVENTS_COHORT_LTV_CURVE_SQL = _ltv_curve_sql("duck")


# ---------------------------------------------------------------------------
# funnel_time_to_convert — exact delay percentiles for the converting users
# ---------------------------------------------------------------------------

TTC_PCTS = (50, 90, 99)


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of signup→first-purchase delay over converting
    users — the distribution behind funnel_signup_purchase's per-user
    conversion flags (the funnel says WHO converts; this says how long
    conversion takes, the number an activation dashboard tracks).

    Scale posture: the delay relation is one groupBy per step plus one
    same-user-keyed join; the global exact percentile uses the house
    two-pass range-partitioned distributed rank
    (agg_exact_global_percentiles' discipline — no corpus-sized global
    ORDER BY window ever serializes through one task), then a 3-row
    literal probe join against the rank leaf."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )
    from mongo_to_clickhouse_spark.operators.rank import (
        distributed_global_rank,
    )

    def build():
        load_table(spark, sf_dir, "events").createOrReplaceTempView(
            "ttc_events_src"
        )
        delays = spark.sql("""
            WITH signup AS (
                SELECT user_id, MIN(ts) AS s FROM ttc_events_src
                WHERE event_type = 'signup' GROUP BY user_id
            )
            SELECT s.user_id,
                   CAST(unix_micros(CAST(MIN(p.ts) AS TIMESTAMP))
                        - unix_micros(CAST(s.s AS TIMESTAMP))
                        AS BIGINT) AS delay_us
            FROM signup s JOIN ttc_events_src p
              ON p.user_id = s.user_id AND p.event_type = 'purchase'
             AND p.ts >= s.s
            GROUP BY s.user_id, s.s
        """)
        return distributed_global_rank(
            delays, [F.col("delay_us"), F.col("user_id")], rank_col="rk"
        ).select("delay_us", "rk")

    cached_barrier_view(spark, sf_dir, "ttc_ranked", build,
                        tables=("events",))
    targets = ", ".join(f"({p})" for p in TTC_PCTS)
    return spark.sql(f"""
        SELECT t.p, CAST(MIN(r.delay_us) AS BIGINT) AS delay_us,
               c.n AS n_converted
        FROM (SELECT * FROM (VALUES {targets}) v(p)) t
        CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n
                    FROM ttc_ranked) c
        JOIN ttc_ranked r
          ON r.rk = CAST(ceil(t.p * c.n / 100.0) AS BIGINT)
        GROUP BY t.p, c.n
        ORDER BY t.p
    """)


FUNNEL_TIME_TO_CONVERT_SQL = f"""
    WITH signup AS (
        SELECT user_id, MIN(ts) AS s FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT s.user_id,
               CAST(epoch_us(MIN(p.ts)) - epoch_us(s.s) AS BIGINT)
                   AS delay_us
        FROM signup s JOIN events p
          ON p.user_id = s.user_id AND p.event_type = 'purchase'
         AND p.ts >= s.s
        GROUP BY s.user_id, s.s
    ),
    ranked AS (
        SELECT delay_us,
               row_number() OVER (ORDER BY delay_us, user_id) AS rk
        FROM conv
    ),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked)
    SELECT t.p, CAST(MIN(r.delay_us) AS BIGINT) AS delay_us,
           c.n AS n_converted
    FROM (SELECT * FROM (VALUES {", ".join(f"({p})" for p in TTC_PCTS)})
          v(p)) t
    CROSS JOIN c
    JOIN ranked r ON r.rk = CAST(ceil(t.p * c.n / 100.0) AS BIGINT)
    GROUP BY t.p, c.n
    ORDER BY t.p
"""


# ---------------------------------------------------------------------------
# events_retention_revenue_weighted — dollar-weighted retention triangle
# ---------------------------------------------------------------------------


def _rev_retention_body(engine: str) -> str:
    """Revenue-weighted retention triangle: the classic cohort × offset
    triangle (retention_cohorts) with each cell carrying the cohort's
    EVENT VALUE at that offset and its share of the cohort's day-0
    revenue — net revenue retention per cohort-day, the SaaS metric
    user-count retention systematically overstates (light users churn
    first).

    Exactness: day indexing is pure integer (µs epoch floor-div);
    money is exact cents; the day-0 anchor comes from a PARTITIONED
    window over the bounded cohort×offset triangle; the share is one
    integer cross-multiplied floor, NULL when the cohort had no day-0
    revenue.

    Scale posture: one scan → the user-keyed first-day MIN, one
    broadcast-able join back, one (cohort, offset) aggregate; the
    anchor window and share run over the |days|² triangle."""
    ep = ("unix_micros(CAST(ts AS TIMESTAMP))" if engine == "spark"
          else "CAST(epoch_us(ts) AS BIGINT)")
    return f"""
        WITH ev AS (
            SELECT user_id,
                   CAST(floor({ep} / 86400000000.0) AS BIGINT) AS day_idx,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        fu AS (SELECT user_id, MIN(day_idx) AS cohort_day
               FROM ev GROUP BY user_id),
        cells AS (
            SELECT f.cohort_day,
                   e.day_idx - f.cohort_day AS day_offset,
                   CAST(COUNT(DISTINCT e.user_id) AS BIGINT)
                       AS active_users,
                   CAST(SUM(e.cents) AS BIGINT) AS revenue_cents
            FROM ev e JOIN fu f ON f.user_id = e.user_id
            GROUP BY f.cohort_day, e.day_idx - f.cohort_day
        ),
        anchored AS (
            SELECT cohort_day, day_offset, active_users, revenue_cents,
                   MAX(CASE WHEN day_offset = 0 THEN revenue_cents END)
                       OVER (PARTITION BY cohort_day) AS day0_cents
            FROM cells
        )
        SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
               active_users, revenue_cents,
               CASE WHEN day0_cents IS NULL OR day0_cents <= 0 THEN NULL
                    ELSE CAST(floor(revenue_cents * 1000000.0
                                    / day0_cents) AS BIGINT)
               END AS revenue_retention_ppm
        FROM anchored
        ORDER BY cohort_day, day_offset
    """


def events_retention_revenue_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dollar-weighted retention triangle — see _rev_retention_body."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_rev_retention_body("spark"))


EVENTS_RETENTION_REVENUE_WEIGHTED_SQL = _rev_retention_body("duck")


# ---------------------------------------------------------------------------
# events_funnel_unordered — all steps within a window, ANY order
# ---------------------------------------------------------------------------

UNORDERED_FUNNEL_HOURS = 1
_UF_STEPS = ("view", "click", "purchase")


def _unordered_funnel_body(engine: str) -> str:
    """ANY-ORDER funnel (the other half of the funnel family:
    events_windowed_funnel / events_sequence_match demand step ORDER;
    real activation metrics often only require that all steps happen
    CLOSE TOGETHER): a user converts when some length-
    {UNORDERED_FUNNEL_HOURS}-hour window contains at least one of each of
    {_UF_STEPS}. Exact sweep: anchor every step event, take each step
    type's next occurrence at-or-after the anchor via forward-looking
    conditional MINs in ONE user-keyed window pass (MIN skips the NULLs
    of other types), and the anchor's completion span is
    GREATEST(next_view, next_click, next_purchase) − anchor — the
    optimal window must start AT some step event, so the per-user MIN
    span over anchors is exact, not a bucketed approximation. Report =
    per first-active-day cohort: users, converters, exact ppm, fastest
    completion.

    Exactness: µs BIGINT arithmetic end-to-end (the round-4
    second-truncation hazard class); anchor order ties break on
    event_id. Scale posture: one scan → one user-keyed shuffle for the
    window pass (uniform keys) → user rollup → day rollup, all
    map-side combined."""
    us = ("unix_micros(CAST(ts AS TIMESTAMP))" if engine == "spark"
          else "CAST(epoch_us(ts) AS BIGINT)")
    intdiv = "DIV" if engine == "spark" else "//"
    w_us = UNORDERED_FUNNEL_HOURS * 3_600_000_000
    mins = ", ".join(
        f"MIN(CASE WHEN event_type = '{s}' THEN us END) OVER w AS n_{s}"
        for s in _UF_STEPS
    )
    greatest = "GREATEST(" + ", ".join(f"n_{s}" for s in _UF_STEPS) + ")"
    non_null = " AND ".join(f"n_{s} IS NOT NULL" for s in _UF_STEPS)
    steps_in = ", ".join(f"'{s}'" for s in _UF_STEPS)
    return f"""
        WITH ev AS (
            SELECT user_id, event_id, {us} AS us, event_type
            FROM events WHERE event_type IN ({steps_in})
        ),
        fwd AS (
            SELECT user_id, us, {mins}
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN CURRENT ROW
                         AND UNBOUNDED FOLLOWING)
        ),
        per_user AS (
            SELECT user_id,
                   CAST(floor(MIN(us) / 86400000000.0) AS BIGINT)
                       AS day_idx,
                   MIN(CASE WHEN {non_null}
                            AND {greatest} - us <= {w_us}
                            THEN {greatest} - us END) AS span_us
            FROM fwd GROUP BY user_id
        )
        SELECT day_idx,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN span_us IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_converted,
               CAST(SUM(CASE WHEN span_us IS NOT NULL THEN 1 ELSE 0 END)
                    * 1000000 {intdiv} COUNT(*) AS BIGINT) AS conv_ppm,
               CAST(MIN(span_us) AS BIGINT) AS fastest_span_us
        FROM per_user
        GROUP BY day_idx
        ORDER BY day_idx
    """


def events_funnel_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-order windowed funnel — see _unordered_funnel_body."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_unordered_funnel_body("spark"))


EVENTS_FUNNEL_UNORDERED_SQL = _unordered_funnel_body("duck")


QUERIES: dict[str, tuple] = {
    "events_funnel_unordered": (
        events_funnel_unordered,
        EVENTS_FUNNEL_UNORDERED_SQL,
    ),
    "events_retention_revenue_weighted": (
        events_retention_revenue_weighted,
        EVENTS_RETENTION_REVENUE_WEIGHTED_SQL,
    ),
    "events_cohort_ltv_curve": (
        events_cohort_ltv_curve,
        EVENTS_COHORT_LTV_CURVE_SQL,
    ),
    "funnel_signup_purchase": (funnel_signup_purchase, FUNNEL_SQL),
    "funnel_time_to_convert": (
        funnel_time_to_convert,
        FUNNEL_TIME_TO_CONVERT_SQL,
    ),
    "events_windowed_funnel": (
        events_windowed_funnel,
        EVENTS_WINDOWED_FUNNEL_SQL,
    ),
    "retention_cohorts": (retention_cohorts, RETENTION_SQL),
    "text_rarity_score": (text_rarity_score, TEXT_RARITY_SQL),
}
