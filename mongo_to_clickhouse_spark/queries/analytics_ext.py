"""Time-series / corpus analytics beyond the first analytics batch:
batch sessionization, time-range window frames, hypertable-style time
bucket rollups, TF-IDF term scoring, and value histograms.

These are the remaining query shapes a training-data / product-analytics
pipeline runs over an event stream and a document corpus. Everything is
arranged as exact integer / decimal / deterministic-double arithmetic so
each query is hash-checked against DuckDB (see module docstrings in
``tpch_ext.py`` for the parity rules).

Scale notes: sessionization and range frames partition by ``user_id`` —
one shuffle, then all window work is partition-local (at 100 TB the skew
risk is a power user; the partition count rides
``spark.sql.shuffle.partitions`` and AQE coalescing). The rollup is a
single partial-aggregated shuffle; TF-IDF is two aggregations over the
token relation plus a broadcast scalar for the corpus size — never a
driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongo_to_clickhouse_spark.io import load_table
from mongo_to_clickhouse_spark.operators.materialize import barrier

SESSION_GAP_SEC = 21600  # 6 h — fixture users emit ~2 events/day


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event sequence at gaps
    longer than ``SESSION_GAP_SEC`` (lag + cumulative-sum of session
    starts — the classic gap-and-island rewrite of the streaming
    ``session_window``), then aggregate per session."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    gap = sec - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > SESSION_GAP_SEC), 1).otherwise(0)
    sess = (
        ev.withColumn("new_s", new_s)
        .withColumn("session_idx", F.sum("new_s").over(w))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            (F.max(sec) - F.min(sec)).alias("duration_sec"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("long").alias("session_idx"),
            "n_events",
            "session_start",
            "duration_sec",
        )
    )


SESSIONIZE_SQL = f"""
    WITH marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(date_trunc('second', ts))
                       - epoch(date_trunc('second', lag(ts) OVER w))
                       > {SESSION_GAP_SEC}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS session_idx
        FROM marked
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           count(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(MAX(epoch(date_trunc('second', ts)))
                - MIN(epoch(date_trunc('second', ts))) AS BIGINT)
               AS duration_sec
    FROM sess
    GROUP BY user_id, session_idx
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per event, the count and max value of the
    same user's events in the trailing 24 h — ``rangeBetween`` over epoch
    seconds (a true value-range frame, not a row frame). Count/max only:
    both are order-insensitive, so Spark and DuckDB agree exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    sec = F.unix_timestamp("ts").alias("epoch_sec")
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_sec")
        .rangeBetween(-86400, 0)
    )
    return (
        ev.select("event_id", "user_id", sec, "value")
        .withColumn("trailing_cnt_24h", F.count("*").over(w))
        .withColumn("trailing_max_24h", F.max("value").over(w))
        .select(
            "event_id", "user_id", "epoch_sec", "trailing_cnt_24h",
            "trailing_max_24h",
        )
    )


WINDOW_RANGE_FRAME_SQL = """
    SELECT event_id, user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_sec,
           count(*) OVER w AS trailing_cnt_24h,
           MAX(value) OVER w AS trailing_max_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY epoch(date_trunc('second', ts))
                 RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
"""


def events_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: events rolled up into 1-day
    buckets per event type, with ROLLUP subtotals (per-bucket and grand
    total). ``NULL`` grouping slots render as 'ALL' so the hash compare
    is unambiguous."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("day", F.col("ts")).alias("bucket")
    return (
        ev.select(bucket, "event_type", "user_id", "value")
        .rollup("bucket", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.coalesce(
                F.date_format("bucket", "yyyy-MM-dd"), F.lit("ALL")
            ).alias("bucket"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "n_users",
            "max_value",
        )
    )


TIME_BUCKET_ROLLUP_SQL = """
    SELECT coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL')
               AS bucket,
           coalesce(event_type, 'ALL') AS event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           MAX(value) AS max_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), event_type)
"""


def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document, with a fully rational score so
    both engines compute the identical double:
    ``score = tf_cnt * n_docs / (doc_len * df)`` (plain-count TF times a
    log-free inverse document frequency). Corpus size arrives as a
    broadcast 1-row aggregate, document frequency as a token-level
    aggregate — two shuffles over the token relation, no collect."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    # Tokenize ONCE: doc length and document frequency both derive from
    # the (doc_id, tok) counts, so the corpus is exploded and shuffled a
    # single time; the aggregate (≪ corpus size) is disk-persisted to stop
    # the derived branches from re-running the explode (see the
    # explode-recompute note on dedupops._shingled_view).
    tf = barrier(
        toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf_cnt"))
    )
    doc_len = tf.groupBy("doc_id").agg(F.sum("tf_cnt").alias("doc_len"))
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(doc_len, "doc_id")
        .join(df_, "tok")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                (F.col("tf_cnt") * F.col("n_docs"))
                / (F.col("doc_len") * F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", F.col("rn").alias("term_rank"), "tok", "score")
    )


TFIDF_SQL = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf_cnt FROM toks
           GROUP BY doc_id, tok),
    doc_len AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
    df AS (SELECT tok, count(*) AS df
           FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               round((tf_cnt * (SELECT count(*) FROM documents))
                     / CAST(doc_len * df AS DOUBLE), 6) AS score
        FROM tf JOIN doc_len USING (doc_id) JOIN df USING (tok)
    )
    SELECT doc_id, CAST(term_rank AS INT) AS term_rank, tok, score
    FROM (
        SELECT doc_id, tok, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, tok) AS term_rank
        FROM scored
    )
    WHERE term_rank <= 3
"""


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``events.value`` (bucket = floor(v/50))
    with each bucket's share of the total — the share is
    ``100 * cnt / total`` on exact integers, so the doubles match."""
    ev = load_table(spark, sf_dir, "events")
    total = ev.agg(F.count("*").alias("total"))
    return (
        ev.select(
            F.floor(F.col("value") / 50).cast("long").alias("bucket"), "value"
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .join(F.broadcast(total))
        .select(
            "bucket",
            "cnt",
            F.round(F.lit(100) * F.col("cnt") / F.col("total"), 4).alias(
                "pct"
            ),
            "min_value",
            "max_value",
        )
        .orderBy("bucket")
    )


VALUE_HISTOGRAM_SQL = """
    SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
           count(*) AS cnt,
           round(100 * count(*) / CAST((SELECT count(*) FROM events)
                                       AS DOUBLE), 4) AS pct,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY floor(value / 50)
    ORDER BY bucket
"""


BASKET_MIN_PAIR_SUPPORT = 3   # pairs co-occurring in fewer orders drop
_BASKET_TOPK = 20


def _basket_lift_sql(engine: str) -> str:
    """Market-basket 2-itemset mining over order line items: for
    supplier pairs sharing an order, support / confidence / lift in
    exact ppm (the a-priori association-rule kernel, itemset size 2).

    lift = P(a,b) / (P(a)·P(b)) — scaled to ppm as
    pair_orders · total_orders · 1e6 DIV (orders_a · orders_b); all
    counts integer, one integer division at the end, so both engines
    agree bit-for-bit. Pair generation is bounded by order width
    (items within an order, never across); the min-support HAVING
    prunes the long tail before the ranking."""
    intdiv = "DIV" if engine == "spark" else "//"
    return f"""
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        ),
        tot AS (
            SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
            FROM li
        ),
        singles AS (
            SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_a FROM li
            GROUP BY l_suppkey
        ),
        pairs AS (
            SELECT a.l_suppkey AS sa, b.l_suppkey AS sb,
                   CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_suppkey < b.l_suppkey
            GROUP BY a.l_suppkey, b.l_suppkey
            HAVING COUNT(*) >= {BASKET_MIN_PAIR_SUPPORT}
        )
        SELECT p.sa, p.sb, p.n_ab,
               CAST((p.n_ab * 1000000) {intdiv} t.n_orders AS BIGINT)
                   AS support_ppm,
               CAST((p.n_ab * 1000000) {intdiv} x.n_a AS BIGINT)
                   AS confidence_ppm,
               CAST((p.n_ab * t.n_orders * 1000000)
                    {intdiv} (x.n_a * y.n_a) AS BIGINT) AS lift_ppm
        FROM pairs p
        JOIN singles x ON x.l_suppkey = p.sa
        JOIN singles y ON y.l_suppkey = p.sb
        CROSS JOIN tot t
        ORDER BY lift_ppm DESC, p.sa, p.sb
        LIMIT {_BASKET_TOPK}
    """


def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top association pairs by lift — see _basket_lift_sql. Scale
    posture: one distinct + one width-bounded pair join + two broadcast
    joins against the singles dim; top-k is TakeOrderedAndProject."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_basket_lift_sql("spark"))


BASKET_PAIR_LIFT_SQL = _basket_lift_sql("duck")


SLIDING_DAYS = 7   # trailing window for rolling distinct users


def _sliding_distinct_sql(engine: str) -> str:
    """Rolling {SLIDING_DAYS}-day DISTINCT user count per day — the
    metric (7-day actives) that window functions famously CANNOT express
    (COUNT(DISTINCT) OVER a frame is unsupported in Spark and most
    engines) and that naive self-joins make quadratic.

    The distributed formulation: reduce to the distinct (user, day)
    relation, EXPLODE each membership to the ≤{SLIDING_DAYS} future days
    it keeps the user active for, distinct again (a user active twice in
    one window counts once), and count per target day. The fan-out is a
    constant {SLIDING_DAYS}, both shuffles key on uniform (user, day)
    pairs — corpus-linear at any scale. Target days are clipped to the
    observed day range so edge windows are honest partial windows."""
    if engine == "spark":
        day = "date_trunc('day', ts)"
        add = "date_add(CAST(day AS DATE), k)"
        gen = f"LATERAL VIEW explode(sequence(0, {SLIDING_DAYS - 1})) AS k"
        fmt = "date_format(target_day, 'yyyy-MM-dd')"
    else:
        day = "date_trunc('day', ts)"
        add = "CAST(day AS DATE) + CAST(k AS INTEGER)"
        gen = f", unnest(range(0, {SLIDING_DAYS})) AS t(k)"
        fmt = "strftime(target_day, '%Y-%m-%d')"
    return f"""
        WITH du AS (
            SELECT DISTINCT user_id, {day} AS day FROM events
        ),
        bounds AS (
            SELECT MIN(CAST(day AS DATE)) AS lo, MAX(CAST(day AS DATE)) AS hi
            FROM du
        ),
        memb AS (
            SELECT DISTINCT user_id, {add} AS target_day
            FROM du {gen}
        )
        SELECT {fmt} AS day,
               CAST(COUNT(*) AS BIGINT) AS n_active_users
        FROM memb, bounds
        WHERE target_day >= bounds.lo AND target_day <= bounds.hi
        GROUP BY {fmt}
        ORDER BY day
    """


def events_sliding_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling 7-day active users — see _sliding_distinct_sql."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_sliding_distinct_sql("spark"))


EVENTS_SLIDING_DISTINCT_USERS_SQL = _sliding_distinct_sql("duck")


MA_HALF_WINDOW = 3   # centered 7-day moving average


def _daily_ma_sql(engine: str) -> str:
    """Per-(event_type, day) counts with a centered 7-day moving average
    and exact-integer residual flagging (time-series anomaly at the
    AGGREGATE level — complements events_anomaly_zscore's per-event
    standardization). The edge days divide by the actual window
    population (COUNT over the same frame), so the MA is exact
    everywhere; ma is carried in milli-units so the comparison stays in
    integers (Spark DIV ≡ DuckDB // on non-negative operands)."""
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
        ma AS (
            SELECT event_type, day, n,
                   CAST((SUM(n) OVER w * 1000) {intdiv} (COUNT(n) OVER w)
                        AS BIGINT) AS ma_milli
            FROM daily
            WINDOW w AS (
                PARTITION BY event_type ORDER BY day
                ROWS BETWEEN {MA_HALF_WINDOW} PRECEDING
                         AND {MA_HALF_WINDOW} FOLLOWING)
        )
        SELECT event_type, day, n, ma_milli,
               n * 1000 - ma_milli AS resid_milli,
               ABS(n * 1000 - ma_milli) * 2 > ma_milli AS flagged
        FROM ma ORDER BY event_type, day
    """


def events_daily_ma_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-rollup moving-average residual anomalies — see
    _daily_ma_sql. Scale posture: one corpus aggregate to the
    (event_type, day) relation; the window runs over that ROLLUP
    (days × types rows, partitioned by type) — the corpus never sorts."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_daily_ma_sql("spark"))


EVENTS_DAILY_MA_RESIDUAL_SQL = _daily_ma_sql("duck")


# ---------------------------------------------------------------------------
# events_timeseries_gap_fill — ClickHouse ORDER BY ... WITH FILL + LOCF
# ---------------------------------------------------------------------------


def events_timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per event type: missing calendar days are
    materialized (ClickHouse ``WITH FILL``), zero-filled for counts and
    LOCF-filled (``INTERPOLATE``-style carry-forward) for the running
    value — what every dashboard/forecast consumer needs before
    resampling. Money is exact integer cents.

    Scale posture: the rollup is one partial-aggregated shuffle; the
    calendar is generated per type from its own (min, max) day — a
    |types|-row aggregate exploded to |types|·|days| rows, NOT a scan
    fan-out; the LOCF window partitions by event_type. At 100 TB the
    dense frame is bounded by types × calendar days, independent of
    event count."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.col("event_type"), F.to_date("ts").alias("day")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("sum_cents"),
        )
    )
    cal = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
        )
    )
    dense = cal.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("sum_cents", F.lit(0)).cast("bigint").alias("sum_cents"),
        F.last("sum_cents", ignorenulls=True)
        .over(w)
        .cast("bigint")
        .alias("locf_cents"),
        F.col("n_events").isNull().alias("is_filled"),
    ).orderBy("event_type", "day")


EVENTS_TIMESERIES_GAP_FILL_SQL = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    ),
    cal AS (
        SELECT event_type,
               CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
              FROM daily GROUP BY event_type)
    ),
    dense AS (
        SELECT c.event_type, c.day, d.n_events, d.sum_cents
        FROM cal c LEFT JOIN daily d
          ON d.event_type = c.event_type AND d.day = c.day
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS day,
           CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(sum_cents, 0) AS BIGINT) AS sum_cents,
           CAST(LAST_VALUE(sum_cents IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS locf_cents,
           n_events IS NULL AS is_filled
    FROM dense
    ORDER BY event_type, day
"""


QUERIES: dict[str, tuple] = {
    "events_timeseries_gap_fill": (
        events_timeseries_gap_fill,
        EVENTS_TIMESERIES_GAP_FILL_SQL,
    ),
    "events_daily_ma_residual": (
        events_daily_ma_residual,
        EVENTS_DAILY_MA_RESIDUAL_SQL,
    ),
    "events_sliding_distinct_users": (
        events_sliding_distinct_users,
        EVENTS_SLIDING_DISTINCT_USERS_SQL,
    ),
    "basket_pair_lift": (basket_pair_lift, BASKET_PAIR_LIFT_SQL),
    "sessionize_events": (sessionize_events, SESSIONIZE_SQL),
    "window_range_frame": (window_range_frame, WINDOW_RANGE_FRAME_SQL),
    "events_time_bucket_rollup": (
        events_time_bucket_rollup,
        TIME_BUCKET_ROLLUP_SQL,
    ),
    "text_tfidf_topterms": (text_tfidf_topterms, TFIDF_SQL),
    "events_value_histogram": (events_value_histogram, VALUE_HISTOGRAM_SQL),
}
