"""Relational extension operators (SURVEY §2.4-2.6 extension IDs).

The reference has no ORDER BY / LIMIT / set ops / distinct aggs / window
surface beyond the latest-version dedup; these are the declared extensions,
all built-in in Spark. Determinism: decimal-cast inputs for double
aggregates, unique-key tiebreaks for every ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongo_to_clickhouse_spark.io import load_table

_DEC = "decimal(18,2)"


def _q(c: str) -> F.Column:
    return F.col(c).cast(_DEC)


# ---------------------------------------------------------------------------
# TPC-H Q1 — the headline aggregation (bench driver at sf0.1)
# ---------------------------------------------------------------------------

def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape over the lineitem fixture: 2 group keys, 8 aggregates.

    Arithmetic strategy (the vectorized-engine formulation): per-row work
    is INTEGER cents (money at fixed scale — one int64 multiply chain per
    row instead of a BigDecimal chain, ~2× faster end-to-end at sf0.1);
    ACCUMULATION width is chosen per column by its per-row magnitude
    bound: qty (≤5100 cents/row) and disc (≤100/row) stay int64 — their
    Q1 group sums reach int64 range only past ~10^15 rows, beyond any
    100 TB lineitem — while price (1e7 cents/row), disc_price (1e4-scaled)
    and charge (1e6-scaled) accumulate as decimal(38,0) (128-bit; their
    group sums cross int64 range around 100 TB). Conversion to the
    canonical money/avg types happens once per GROUP (4 rows), not per
    row, and every conversion is exact decimal multiplication or integer
    DIV — no double intermediate whose rounding could diverge between
    engines. One shuffle, map-side partial aggregation (check:
    HashAggregate(partial) under the scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(F.col(c) * 100).cast("bigint")  # noqa: E731
    qc, pc, dc, tc = [
        cents(c)
        for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    ]
    disc_cc = pc * (F.lit(100) - dc)  # 1e4-scaled cents·percent
    charge_ccc = disc_cc * (F.lit(100) + tc)  # 1e6-scaled
    wide = "decimal(38,0)"
    agg = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qc).alias("qty_c"),
            F.sum(pc.cast(wide)).alias("price_c"),
            F.sum(disc_cc.cast(wide)).alias("disc_price_cc"),
            F.sum(charge_ccc.cast(wide)).alias("charge_ccc"),
            F.sum(dc).alias("disc_c"),
            F.count("*").alias("count_order"),
        )
    )
    # exact descale: multiply by a decimal literal (never divide through
    # double); avg_* = integer micro-units via DIV, then an exact /1e6
    money = lambda col, lit, typ: F.round(  # noqa: E731
        F.col(col) * F.expr(f"CAST({lit} AS {typ})"), 2
    ).cast("decimal(38,2)")
    avg_micro = lambda col, mult: (  # noqa: E731
        F.expr(f"CAST(({col} * {mult}) DIV count_order AS DOUBLE)")
        / F.lit(1000000.0)
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        money("qty_c", "0.01", "DECIMAL(3,2)").alias("sum_qty"),
        money("price_c", "0.01", "DECIMAL(3,2)").alias("sum_base_price"),
        money("disc_price_cc", "0.0001", "DECIMAL(5,4)").alias("sum_disc_price"),
        money("charge_ccc", "0.000001", "DECIMAL(7,6)").alias("sum_charge"),
        avg_micro("qty_c", 10000).alias("avg_qty"),
        avg_micro("price_c", 10000).alias("avg_price"),
        avg_micro("disc_c", 10000).alias("avg_disc"),
        "count_order",
    )


TPCH_Q1_SQL = """
    WITH cents AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity * 100) AS BIGINT) AS qc,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
               CAST(round(l_discount * 100) AS BIGINT) AS dc,
               CAST(round(l_tax * 100) AS BIGINT) AS tc
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    ),
    sums AS (
        SELECT l_returnflag, l_linestatus,
               SUM(qc) AS qty_c,
               SUM(CAST(pc AS DECIMAL(38,0))) AS price_c,
               SUM(CAST(pc * (100 - dc) AS DECIMAL(38,0))) AS disc_price_cc,
               SUM(CAST(pc * (100 - dc) * (100 + tc) AS DECIMAL(38,0)))
                   AS charge_ccc,
               SUM(dc) AS disc_c,
               COUNT(*) AS count_order
        FROM cents
        GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           CAST(round(CAST(qty_c AS DECIMAL(38,0))
                      * CAST(0.01 AS DECIMAL(3,2)), 2)
                AS DECIMAL(38,2)) AS sum_qty,
           CAST(round(price_c * CAST(0.01 AS DECIMAL(3,2)), 2)
                AS DECIMAL(38,2)) AS sum_base_price,
           CAST(round(disc_price_cc * CAST(0.0001 AS DECIMAL(5,4)), 2)
                AS DECIMAL(38,2)) AS sum_disc_price,
           CAST(round(charge_ccc * CAST(0.000001 AS DECIMAL(7,6)), 2)
                AS DECIMAL(38,2)) AS sum_charge,
           CAST(CAST(qty_c * 10000 AS HUGEINT) // count_order AS DOUBLE)
               / 1000000.0 AS avg_qty,
           CAST(CAST(price_c * 10000 AS HUGEINT) // count_order AS DOUBLE)
               / 1000000.0 AS avg_price,
           CAST(CAST(disc_c * 10000 AS HUGEINT) // count_order AS DOUBLE)
               / 1000000.0 AS avg_disc,
           count_order
    FROM sums
"""


# ---------------------------------------------------------------------------
# §2.4 extension aggregates
# ---------------------------------------------------------------------------

def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


AGG_DISTINCT_COUNT_SQL = """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate. Estimators differ across engines, so
    the oracle checks the ESTIMATE'S CONTRACT (within 5% of exact), not the
    raw sketch value: both sides emit ok=true rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .select(
            "l_returnflag",
            (F.abs(F.col("approx") - F.col("exact")) / F.col("exact") < 0.05).alias(
                "within_5pct"
            ),
        )
    )


AGG_APPROX_DISTINCT_SQL = """
    SELECT l_returnflag,
           abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
               / COUNT(DISTINCT l_partkey) < 0.05 AS within_5pct
    FROM lineitem GROUP BY l_returnflag
"""


def agg_hll_partitioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the pattern that makes distinct counts
    tractable at 1000 executors: build an HLL SKETCH per group
    (hll_sketch_agg, a partial-aggregable binary), then UNION the
    sketches (hll_union_agg) instead of re-scanning, and estimate from
    the merged sketch. The two-level plan here (per-source sketches →
    global union) is exactly a datacenter rollup: per-day/per-shard
    sketches persisted once, any coarser rollup derived without touching
    the raw 100 TB again.

    Sketch bytes differ across engines by construction, so the oracle
    checks the estimator's CONTRACT (merged estimate within 5% of exact,
    group count) — same scheme as agg_approx_distinct."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.expr("hll_sketch_agg(doc_id, 14)").alias("sketch"),
    )
    merged = per_source.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias("est"),
    )
    exact = docs.agg(F.countDistinct("doc_id").alias("exact"))
    return merged.crossJoin(exact).select(
        "n_groups",
        (F.abs(F.col("est") - F.col("exact")) / F.col("exact") < 0.05).alias(
            "within_5pct"
        ),
    )


AGG_HLL_PARTITIONED_MERGE_SQL = """
    SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups,
           abs(approx_count_distinct(doc_id) - COUNT(DISTINCT doc_id))
               / COUNT(DISTINCT doc_id) < 0.05 AS within_5pct
    FROM documents
"""


def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile sketch (Greenwald-Khanna / KLL-style).
    Sketches differ across engines, so — like agg_approx_distinct — the
    oracle checks the estimator's CONTRACT: the approx p50 must sit within
    1% relative error of the exact continuous quantile."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (
            F.abs(
                F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
                - F.expr("percentile(l_extendedprice, 0.5)")
            )
            / F.expr("percentile(l_extendedprice, 0.5)")
            < 0.01
        ).alias("p50_within_1pct")
    )


AGG_APPROX_QUANTILE_SQL = """
    SELECT l_returnflag,
           abs(approx_quantile(l_extendedprice, 0.5)
               - quantile_cont(l_extendedprice, 0.5))
               / quantile_cont(l_extendedprice, 0.5) < 0.01 AS p50_within_1pct
    FROM lineitem GROUP BY l_returnflag
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus) — subtotals + grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(_q("l_quantity")), 2).cast("decimal(38,2)").alias("sum_qty"),
        F.count("*").alias("n"),
    )


AGG_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (continuous) per group, rounded for
    cross-engine float stability."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
    )


AGG_PERCENTILE_SQL = """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
    FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------

def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment by totalprice (unique-key tiebreak).
    Spark plans this as WindowGroupLimit — per-partition top-k heaps, no
    full sort of each group (the scale path for top-k per group)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


WINDOW_RANK_TOPK_SQL = """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rk <= 3
"""


def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user over event time (rows unbounded-preceding →
    current). Decimal-cast so the cumulative sum is engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(_q("value")).over(w).cast("decimal(38,2)").alias("running_value"),
    )


WINDOW_RUNNING_AGG_SQL = """
    SELECT event_id, user_id,
           SUM(CAST(value AS DECIMAL(18,2)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_value
    FROM events
"""


# ---------------------------------------------------------------------------
# §2.6 sort / limit / set ops
# ---------------------------------------------------------------------------

def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by extendedprice — Spark plans TakeOrderedAndProject
    (per-partition heaps + driver merge, no global sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
    )


SORT_LIMIT_TOPK_SQL = """
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
"""


def setop_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (dedup) of customer and supplier nation keys."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


SETOP_UNION_DEDUP_SQL = """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations present among both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


SETOP_INTERSECT_SQL = """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with customers but no high-balance suppliers
    (supplier side filtered so the difference is non-empty at every sf)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 8000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


SETOP_EXCEPT_SQL = """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event deltas per user: lag/lead navigation + seconds-since-
    previous (classic sessionization precursor)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).alias(
            "sec_since_prev"
        ),
    )


WINDOW_LAG_LEAD_SQL = """
    SELECT event_id, user_id,
           lag(event_id) OVER w AS prev_event_id,
           lead(event_id) OVER w AS next_event_id,
           CAST(epoch(date_trunc('second', ts))
                - epoch(date_trunc('second', lag(ts) OVER w)) AS BIGINT)
               AS sec_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def window_ntile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranking: quartiles + dense_rank + cumulative
    distribution of customer balances per market segment."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


WINDOW_NTILE_RANK_SQL = """
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER w AS quartile,
           dense_rank() OVER w AS drank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


def subquery_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate: customers above their segment's average
    balance (correlated aggregate — Catalyst rewrites to a join)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_ssq"
    )
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
        FROM customer_ssq o
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_ssq i
                           WHERE i.c_mktsegment = o.c_mktsegment)
        """
    )


SUBQUERY_SCALAR_AGG_SQL = """
    SELECT c_custkey, c_mktsegment,
           CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
    FROM customer o
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer i
                       WHERE i.c_mktsegment = o.c_mktsegment)
"""


def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last-observation-carried-forward) imputation: event values
    are NULLed on a planted schedule (event_id % 5 == 0) and re-imputed
    from the same user's most recent non-null observation — the standard
    sensor/price-series gap fill, as one ``last(..., ignorenulls)`` over
    a user-partitioned running frame. One shuffle keyed by user; rows
    with no prior observation stay NULL (exposed by the filled_is_null
    flag)."""
    ev = load_table(spark, sf_dir, "events")
    gappy = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
        F.round(F.col("value"), 2)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = ev.select(
        "event_id", "user_id", "ts", gappy.alias("gap_value")
    ).withColumn("filled", F.last("gap_value", ignorenulls=True).over(w))
    return staged.select(
        "event_id",
        "user_id",
        F.col("gap_value").isNull().alias("was_gap"),
        F.round(F.col("filled"), 2).alias("filled_value"),
        F.col("filled").isNull().alias("filled_is_null"),
    )


WINDOW_FORWARD_FILL_SQL = """
    WITH staged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_id % 5 = 0 THEN NULL
                    ELSE round(value, 2) END AS gap_value
        FROM events
    )
    SELECT event_id, user_id,
           gap_value IS NULL AS was_gap,
           round(LAST_VALUE(gap_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS filled_value,
           (LAST_VALUE(gap_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) IS NULL
               AS filled_is_null
    FROM staged
"""


def _pareto_sql(engine: str) -> str:
    intdiv = "DIV" if engine == "spark" else "//"
    return f"""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM lineitem GROUP BY l_suppkey
        ),
        tot AS (SELECT SUM(rev_cents) AS t FROM rev),
        deciled AS (
            SELECT l_suppkey, rev_cents,
                   NTILE(10) OVER (ORDER BY rev_cents DESC, l_suppkey)
                       AS decile
            FROM rev
        )
        SELECT CAST(decile AS INTEGER) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
               CAST((SUM(rev_cents) * 1000000) {intdiv} MAX(tot.t)
                    AS BIGINT) AS share_ppm
        FROM deciled CROSS JOIN tot
        GROUP BY decile ORDER BY decile
    """


def profile_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto/80-20) report: suppliers ranked
    into deciles by revenue with each decile's exact-ppm share — the
    who-carries-the-business diagnostic. The ntile window runs over the
    per-supplier AGGREGATE (|suppliers| rows, dim-bounded like
    domain_budget_waterfill's sources — whitelisted in
    test_plan_hygiene with that bound); the corpus contributes one
    partial-aggregated groupBy."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_pareto_sql("spark"))


PROFILE_PARETO_REVENUE_SQL = _pareto_sql("duck")


def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per return-flag partition — the two
    rank-normalizing window functions the registry didn't yet cover
    (both are exact rationals (rank−1)/(n−1) and rank_hi/n, so the
    6-dp round is engine-stable). Partitioned window; no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity"), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
    )


WINDOW_PERCENT_RANK_SQL = """
    SELECT l_returnflag, l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS qty,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume_dist
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_quantity, l_orderkey, l_linenumber)
"""


def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag (multiset) difference, completing the set-op
    family next to the DISTINCT-semantics except: each user's click
    multiplicity minus view multiplicity survives as that many rows.
    Plans as a single count-propagating aggregate join, not a dedup."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    return clicks.exceptAll(views)


SETOP_EXCEPT_ALL_SQL = """
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'view'
"""


ISLAND_BUCKET = 1024


def _gaps_islands_sql(engine: str) -> str:
    intdiv = "DIV" if engine == "spark" else "//"
    b = f"k {intdiv} {ISLAND_BUCKET}"
    return f"""
        WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
        staged AS (
            SELECT k, {b} AS b,
                   LAG(k) OVER (PARTITION BY {b} ORDER BY k) AS prev
            FROM keys
        ),
        islands AS (
            SELECT k, b,
                   SUM(CASE WHEN prev IS NULL OR k - prev > 1
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY b ORDER BY k
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS island_id
            FROM staged
        )
        SELECT b AS bucket, CAST(island_id AS BIGINT) AS island_id,
               MIN(k) AS island_start, MAX(k) AS island_end,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM islands GROUP BY b, island_id
        ORDER BY island_start
    """


def window_gaps_islands_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over the (sparse) order-key sequence — maximal
    runs of consecutive keys, the classic sequence-integrity audit
    ("which id ranges exist / where are the holes").

    The textbook formulation (LAG with no PARTITION BY, or the
    k − ROW_NUMBER() islands trick) serializes the ENTIRE key space
    through one task — the exact failure mode tests/test_plan_hygiene.py
    exists to catch. This is the distributed form: keys are bucketed
    into fixed ranges of {ISLAND_BUCKET} and every window partitions by
    the bucket, so detection is embarrassingly parallel; an island
    crossing a bucket boundary is reported clipped at the boundary
    (adjacent rows with island_end = b·{ISLAND_BUCKET} − 1 and
    island_start = b·{ISLAND_BUCKET} reassemble it exactly — a
    |buckets|-sized merge the CALLER does if unclipped spans are needed,
    cf. the same clip-and-merge contract in dedup_substring_spans).

    Scale posture: one DISTINCT shuffle + one bucket-partitioned window
    sort, both on uniform keys; output is one row per island."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_gaps_islands_sql("spark"))


WINDOW_GAPS_ISLANDS_BUCKETED_SQL = _gaps_islands_sql("duck")


COALESCE_SPAN_US = 300_000_000   # each event opens a 5-minute interval


def _interval_coalesce_sql(engine: str) -> str:
    """Engine-shared interval coalescing: every event opens a
    [ts, ts+5min) span; overlapping spans per user merge into maximal
    covered intervals (the continuous-time twin of gaps-and-islands —
    the \"total active time\" query behind billing, on-call coverage and
    session-overlap audits). New-island detection is the running MAX of
    prior interval ends; within an island the union is contiguous, so
    covered time = MAX(end) − MIN(start) per island — all exact µs
    BIGINTs."""
    epoch = (
        "unix_micros(CAST(ts AS TIMESTAMP))"
        if engine == "spark"
        else "CAST(epoch_us(ts) AS BIGINT)"
    )
    return f"""
        WITH sp AS (
            SELECT user_id, event_id, {epoch} AS s,
                   {epoch} + {COALESCE_SPAN_US} AS f
            FROM events
        ),
        flagged AS (
            SELECT user_id, s, f,
                   CASE WHEN MAX(f) OVER (
                            PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                          OR s > MAX(f) OVER (
                            PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                        THEN 1 ELSE 0 END AS nw,
                   event_id
            FROM sp
        ),
        islands AS (
            SELECT user_id, s, f,
                   SUM(nw) OVER (PARTITION BY user_id
                                 ORDER BY s, event_id
                                 ROWS UNBOUNDED PRECEDING) AS g
            FROM flagged
        ),
        merged AS (
            SELECT user_id, g,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   MAX(f) - MIN(s) AS covered
            FROM islands GROUP BY user_id, g
        )
        SELECT user_id,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(covered) AS BIGINT) AS covered_us
        FROM merged
        GROUP BY user_id
        ORDER BY user_id
    """


def window_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user merged-interval coverage — see _interval_coalesce_sql.

    Scale posture: one scan, then two user-partitioned running windows
    (per-user partitions — uniform user keys, the sessionize shape) and
    two user-keyed aggregates. Nothing global, nothing quadratic; the
    only shuffle is on user_id."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_interval_coalesce_sql("spark"))


WINDOW_INTERVAL_COALESCE_SQL = _interval_coalesce_sql("duck")


def _skyline_sql(engine: str) -> str:
    """Engine-shared 2-D skyline (Pareto frontier) per order priority:
    the orders not dominated by any other on (maximize total price,
    maximize recency) — the classic skyline operator (Börzsönyi 2001)
    via the sort-scan reduction: order by price DESC within the group;
    a row survives iff (a) its date strictly exceeds the date-max of
    all STRICTLY higher-priced rows (a RANGE ... 1 PRECEDING frame on
    integer cents, so price peers are excluded from the scan max), and
    (b) its date equals the date-max among its equal-price peers (the
    RANGE CURRENT ROW frame spans exactly the peer group). Two frames
    over ONE sort/shuffle, no pair join — the O(n log n) plan, not the
    O(n²) dominance join.

    Exactness: price compares in exact cents, dates in exact epoch
    days. Dominance is the standard non-strict form (≥ in both dims,
    > in at least one): equal-price-older rows are dominated, and rows
    IDENTICAL on (cents, day) are mutually non-dominating — all of
    them survive, which the old single-running-max scan got wrong
    (round-6 ADVICE: the second duplicate saw its own day as the
    running max and was dropped)."""
    epoch = (
        "CAST(floor(unix_micros(CAST(o_orderdate AS TIMESTAMP))"
        " / 86400000000) AS BIGINT)"
        if engine == "spark"
        else "CAST(floor(CAST(epoch_us(o_orderdate) AS BIGINT)"
        " / 86400000000) AS BIGINT)"
    )
    return f"""
        WITH pts AS (
            SELECT o_orderpriority AS grp, o_orderkey,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
                   {epoch} AS day
            FROM orders
        ),
        scanned AS (
            SELECT grp, o_orderkey, cents, day,
                   MAX(day) OVER (
                       PARTITION BY grp ORDER BY cents DESC
                       RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS best_day_above,
                   MAX(day) OVER (
                       PARTITION BY grp ORDER BY cents DESC
                       RANGE BETWEEN CURRENT ROW
                                 AND CURRENT ROW) AS peer_day_max
            FROM pts
        )
        SELECT grp, o_orderkey, cents, day
        FROM scanned
        WHERE (best_day_above IS NULL OR day > best_day_above)
          AND day = peer_day_max
        ORDER BY grp, cents DESC, o_orderkey
    """


def window_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority Pareto frontier over (price, recency) — see
    _skyline_sql. The window partitions by the 5-value priority group:
    at scale the sort-scan runs per group partition (for giant groups
    the gaps-and-islands bucket-clipping or a presort-sample pass
    applies — frontier sizes are tiny, O(log n) expected under random
    orders, so the output never explodes)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_skyline_sql("spark"))


WINDOW_SKYLINE_PARETO_SQL = _skyline_sql("duck")


GLOBAL_PCTS = (50, 90, 95, 99)


def agg_exact_global_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT global percentiles of the event values by the lower-rank
    (type-1) definition — value at rank ⌈p·n/100⌉ under the total order
    (value, event_id). ``agg_percentile`` covers grouped interpolated
    quantiles, where group partitions bound each window; the GLOBAL
    exact quantile is the case every engine approximates instead
    (a global ORDER BY window serializes the corpus through one task)
    — here the rank comes from the two-pass range-partitioned
    distributed sort-rank, so the plan stays shuffle-parallel and the
    answer is exact, not a sketch. Values compare in exact cents.

    Scale posture: one rank pass (range partitioner + per-partition
    row_numbers + 32-row triangular offsets) + one 1-row count
    broadcast + a 4-row target join."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )
    from mongo_to_clickhouse_spark.operators.rank import (
        distributed_global_rank,
    )

    def build():
        ev = load_table(spark, sf_dir, "events").selectExpr(
            "CAST(floor(value * 100) AS BIGINT) AS cents", "event_id"
        ).where("value IS NOT NULL")
        return distributed_global_rank(
            ev, [F.col("cents"), F.col("event_id")], rank_col="rk"
        ).select("cents", "rk")

    cached_barrier_view(spark, sf_dir, "gpct_ranked", build,
                        tables=("events",))
    targets = ", ".join(f"({p})" for p in GLOBAL_PCTS)
    return spark.sql(f"""
        SELECT t.p,
               CAST(MIN(r.cents) AS BIGINT) AS value_cents
        FROM (SELECT * FROM (VALUES {targets}) v(p)) t
        CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n
                    FROM gpct_ranked) c
        JOIN gpct_ranked r
          ON r.rk = CAST(ceil(t.p * c.n / 100.0) AS BIGINT)
        GROUP BY t.p
        ORDER BY t.p
    """)


AGG_EXACT_GLOBAL_PERCENTILES_SQL = f"""
    WITH ranked AS (
        SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
               row_number() OVER (
                   ORDER BY CAST(floor(value * 100) AS BIGINT),
                            event_id) AS rk
        FROM events WHERE value IS NOT NULL
    ),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked)
    SELECT t.p, CAST(MIN(r.cents) AS BIGINT) AS value_cents
    FROM (SELECT * FROM (VALUES {", ".join(f"({p})" for p in GLOBAL_PCTS)})
          v(p)) t
    CROSS JOIN c
    JOIN ranked r ON r.rk = CAST(ceil(t.p * c.n / 100.0) AS BIGINT)
    GROUP BY t.p
    ORDER BY t.p
"""


QUERIES: dict[str, tuple] = {
    "agg_exact_global_percentiles": (
        agg_exact_global_percentiles,
        AGG_EXACT_GLOBAL_PERCENTILES_SQL,
    ),
    "window_skyline_pareto": (window_skyline_pareto,
                              WINDOW_SKYLINE_PARETO_SQL),
    "window_interval_coalesce": (
        window_interval_coalesce,
        WINDOW_INTERVAL_COALESCE_SQL,
    ),
    "tpch_q1_pricing_summary": (tpch_q1_pricing_summary, TPCH_Q1_SQL),
    "window_gaps_islands_bucketed": (
        window_gaps_islands_bucketed,
        WINDOW_GAPS_ISLANDS_BUCKETED_SQL,
    ),
    "window_lag_lead": (window_lag_lead, WINDOW_LAG_LEAD_SQL),
    "window_ntile_rank": (window_ntile_rank, WINDOW_NTILE_RANK_SQL),
    "subquery_scalar_agg": (subquery_scalar_agg, SUBQUERY_SCALAR_AGG_SQL),
    "agg_distinct_count": (agg_distinct_count, AGG_DISTINCT_COUNT_SQL),
    "agg_approx_distinct": (agg_approx_distinct, AGG_APPROX_DISTINCT_SQL),
    "agg_hll_partitioned_merge": (agg_hll_partitioned_merge, AGG_HLL_PARTITIONED_MERGE_SQL),
    "agg_approx_quantile": (agg_approx_quantile, AGG_APPROX_QUANTILE_SQL),
    "agg_grouping_sets": (agg_grouping_sets, AGG_GROUPING_SETS_SQL),
    "agg_percentile": (agg_percentile, AGG_PERCENTILE_SQL),
    "window_rank_topk_per_group": (window_rank_topk_per_group, WINDOW_RANK_TOPK_SQL),
    "window_running_agg": (window_running_agg, WINDOW_RUNNING_AGG_SQL),
    "sort_limit_topk": (sort_limit_topk, SORT_LIMIT_TOPK_SQL),
    "setop_union_dedup": (setop_union_dedup, SETOP_UNION_DEDUP_SQL),
    "setop_intersect": (setop_intersect, SETOP_INTERSECT_SQL),
    "setop_except": (setop_except, SETOP_EXCEPT_SQL),
    "setop_except_all": (setop_except_all, SETOP_EXCEPT_ALL_SQL),
    "window_percent_rank": (window_percent_rank, WINDOW_PERCENT_RANK_SQL),
    "window_forward_fill": (window_forward_fill, WINDOW_FORWARD_FILL_SQL),
    "profile_pareto_revenue": (
        profile_pareto_revenue,
        PROFILE_PARETO_REVENUE_SQL,
    ),
}
