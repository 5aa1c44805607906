"""ClickHouse-signature query surface, re-expressed Spark-first.

The reference's entire sink side IS ClickHouse (src/main.rs:890-913
dual-table inserts; historical_data/src/main.rs re-aggregation), so a
user of the reference runs their analytics with ClickHouse's
parametric-aggregate / table-engine vocabulary.  This module implements
the four signature pieces of that vocabulary that the rest of the
registry didn't already cover, each as a declarative Spark plan with an
exactly-mirroring DuckDB oracle:

* ``events_sequence_match`` — ClickHouse ``sequenceMatch`` /
  ``sequenceCount``: per-user ordered event-pattern matching.
* ``events_retention_conditions`` — ClickHouse ``retention()``: the
  cohort-condition array aggregated to per-week retention counts.
* ``cdc_collapsing_merge`` — CollapsingMergeTree ``FINAL`` semantics:
  a ±1 sign stream collapsed by row identity, net-zero rows vanish.
* ``scalar_url_parse`` — the URL function family (``domain``,
  ``topLevelDomain``, ``cutWWW``, ``path``, ``queryString``,
  ``extractURLParameter``, ``fragment``) with ClickHouse's
  empty-string-on-missing convention.

Parity rules are the usual exact-arithmetic ones (see ``tpch_ext.py``):
money in integer cents, counts as BIGINT, ratios as integer ppm; the
missing-component convention is ``''`` on BOTH engines (Spark
``parse_url`` yields NULL, the oracle's ``regexp_extract`` yields ``''``
— the Spark side coalesces, which is exactly what ClickHouse's URL
functions return on failure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.io import load_table
from mongo_to_clickhouse_spark.queries.cdcops import _oplog_sql

# ---------------------------------------------------------------------------
# events_sequence_match — ClickHouse sequenceMatch('(?1).*(?2).*(?3)')
# ---------------------------------------------------------------------------

# event types (click/purchase/error/signup/view) have unique first
# letters, so the per-user ordered sequence is a compact char string and
# the ClickHouse patterns become plain regexes over it:
#   sequenceMatch('(?1).*(?2).*(?3)')(ts, signup, view, purchase)
#     == seq_str RLIKE 's.*v.*p'
#   sequenceCount('(?1)(?2)')(ts, view, purchase) with ClickHouse's
#   non-overlapping scan == regexp_count(seq_str, 'v[^p]*p')
_SEQ_SVP = "s.*v.*p"
_SEQ_VP = "v[^p]*p"


def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-pattern match (sequenceMatch/sequenceCount).

    Scale posture: ONE shuffle keyed by user_id; the per-user event
    string is bounded by that user's event count (the same per-key
    memory contract ClickHouse's sequenceMatch has — it also buffers the
    key's events). Skewed power-users are the known hazard; the regex
    work is JVM-side over the aggregated string, no Python. Order inside
    the aggregate is made deterministic by sorting (ts, event_id)
    structs — collect_list alone has no order guarantee across
    partitions."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            "ts", "event_id", F.substring("event_type", 1, 1).alias("ch")
        ).alias("e"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("e")), lambda x: x["ch"]),
            "",
        ).alias("seq_str"),
    )
    return per_user.select(
        "user_id",
        "n_events",
        "seq_str",
        F.col("seq_str").rlike(_SEQ_SVP).cast("int").alias("match_svp"),
        F.regexp_count("seq_str", F.lit(_SEQ_VP)).cast("int").alias("count_vp"),
    ).orderBy("user_id")


EVENTS_SEQUENCE_MATCH_SQL = f"""
    WITH s AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq_str
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events, seq_str,
           CAST(CASE WHEN regexp_matches(seq_str, '{_SEQ_SVP}')
                     THEN 1 ELSE 0 END AS INTEGER) AS match_svp,
           CAST(len(regexp_extract_all(seq_str, '{_SEQ_VP}'))
                AS INTEGER) AS count_vp
    FROM s ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# events_retention_conditions — ClickHouse retention(cond0, ..., cond3)
# ---------------------------------------------------------------------------

_RETENTION_WEEKS = 4


def events_retention_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention()``: cond_w = "user active in week w after
    the corpus anchor date"; a user is RETAINED in week w iff cond_0 AND
    cond_w. Emits one row per week with active / retained counts and the
    exact integer-ppm retention rate over the week-0 cohort.

    Scale posture: the anchor is a 1-row broadcast; the (user, week)
    distinct is one uniform shuffle; the per-user flag fold is the same
    exchange (user_id-keyed), and everything after is a single-row
    reduce + width-4 explode. ClickHouse computes the identical
    per-user condition array inside one aggregation pass."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    anchor = ev.agg(F.min("d").alias("anchor"))
    uw = (
        ev.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.expr("CAST(datediff(d, anchor) DIV 7 AS INT)").alias("week"),
        )
        .filter(F.col("week") < _RETENTION_WEEKS)
        .distinct()
    )
    per_user = uw.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("week") == w, 1).otherwise(0)).alias(f"w{w}")
            for w in range(_RETENTION_WEEKS)
        ]
    )
    tot = per_user.agg(
        F.sum("w0").alias("n_cohort"),
        *[F.sum(f"w{w}").alias(f"act{w}") for w in range(_RETENTION_WEEKS)],
        *[
            F.sum(F.col("w0") * F.col(f"w{w}")).alias(f"ret{w}")
            for w in range(_RETENTION_WEEKS)
        ],
    )
    rows = tot.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(w).alias("week"),
                        F.col(f"act{w}").cast("bigint").alias("active_users"),
                        F.col(f"ret{w}").cast("bigint").alias("retained_users"),
                        F.expr(
                            f"CAST(ret{w} * 1000000 DIV n_cohort AS BIGINT)"
                        ).alias("retention_ppm"),
                    )
                    for w in range(_RETENTION_WEEKS)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.week", "r.active_users", "r.retained_users", "r.retention_ppm").orderBy(
        "week"
    )


EVENTS_RETENTION_SQL = f"""
    WITH d AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
    anchor AS (SELECT MIN(d) AS anchor FROM d),
    uw AS (
        SELECT DISTINCT user_id,
               CAST(datediff('day', anchor, d) // 7 AS INTEGER) AS week
        FROM d, anchor
        WHERE datediff('day', anchor, d) // 7 < {_RETENTION_WEEKS}
    ),
    pu AS (
        SELECT user_id,
               {", ".join(
                   f"MAX(CASE WHEN week = {w} THEN 1 ELSE 0 END) AS w{w}"
                   for w in range(_RETENTION_WEEKS)
               )}
        FROM uw GROUP BY user_id
    ),
    tot AS (
        SELECT SUM(w0) AS n_cohort,
               {", ".join(
                   f"SUM(w{w}) AS act{w}" for w in range(_RETENTION_WEEKS)
               )},
               {", ".join(
                   f"SUM(w0 * w{w}) AS ret{w}"
                   for w in range(_RETENTION_WEEKS)
               )}
        FROM pu
    )
    SELECT * FROM (
        {" UNION ALL ".join(
            f"SELECT {w} AS week, CAST(act{w} AS BIGINT) AS active_users, "
            f"CAST(ret{w} AS BIGINT) AS retained_users, "
            f"CAST((ret{w} * 1000000) // n_cohort AS BIGINT) AS retention_ppm "
            f"FROM tot"
            for w in range(_RETENTION_WEEKS)
        )}
    ) ORDER BY week
"""


# ---------------------------------------------------------------------------
# cdc_collapsing_merge — CollapsingMergeTree FINAL
# ---------------------------------------------------------------------------

# the sign stream writes (-1, previous image) + (+1, new image) at every
# op — exactly how an app feeds CollapsingMergeTree; identity columns are
# the full row payload in exact units (cents; '' sentinels keep NULL out
# of the grouping key). Shares cdcops' epochs/images reconstruction so a
# pytest can assert FINAL == cdc_apply_oplog's direct answer.
_COLLAPSE_STAGES = """
    epochs AS (
        SELECT *,
               COALESCE(MAX(CASE WHEN op IN ('insert', 'replace', 'delete')
                                 THEN seq END)
                   OVER (PARTITION BY doc_id ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW), 0) AS epoch
        FROM oplog
    ),
    images AS (
        SELECT doc_id, seq,
               op != 'delete' AS exists_now,
               LAST_VALUE({A_IGN}) OVER (
                   PARTITION BY doc_id, epoch ORDER BY seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS img_a,
               LAST_VALUE({B_IGN}) OVER (
                   PARTITION BY doc_id, epoch ORDER BY seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS img_b
        FROM epochs
    ),
    trans AS (
        SELECT doc_id, seq, exists_now, img_a, img_b,
               LAG(exists_now) OVER (PARTITION BY doc_id ORDER BY seq)
                   AS prev_exists,
               LAG(img_a) OVER (PARTITION BY doc_id ORDER BY seq) AS prev_a,
               LAG(img_b) OVER (PARTITION BY doc_id ORDER BY seq) AS prev_b
        FROM trans_src
    )
"""

_CENTS_PREV = "COALESCE(CAST(round(prev_a * 100) AS BIGINT), CAST(-1 AS BIGINT))"
_CENTS_NOW = "COALESCE(CAST(round(img_a * 100) AS BIGINT), CAST(-1 AS BIGINT))"


def _collapse_stages(dialect: str) -> str:
    # Spark: LAST(x, true); DuckDB: LAST_VALUE(x IGNORE NULLS) — the one
    # window-syntax divergence between the engines, isolated here.
    body = _COLLAPSE_STAGES.replace("trans_src", "images")
    if dialect == "spark":
        return body.replace(
            "LAST_VALUE({A_IGN})", "LAST(field_a, true)"
        ).replace("LAST_VALUE({B_IGN})", "LAST(field_b, true)")
    return body.replace(
        "LAST_VALUE({A_IGN})", "LAST_VALUE(field_a IGNORE NULLS)"
    ).replace("LAST_VALUE({B_IGN})", "LAST_VALUE(field_b IGNORE NULLS)")


_COLLAPSE_FINAL = """
    SELECT doc_id, a_cents, field_b,
           CAST(SUM(sign) AS INTEGER) AS net_sign,
           CAST(COUNT(*) AS BIGINT) AS n_versions
    FROM signed
    GROUP BY doc_id, a_cents, field_b
    HAVING SUM(sign) != 0
    ORDER BY doc_id, a_cents, field_b
"""


def cdc_collapsing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree ``FINAL``: collapse the ±1 sign stream by full
    row identity; groups whose signs cancel vanish (superseded states and
    deleted docs), leaving net +1 exactly at each live doc's final state.

    This is the third ClickHouse table-engine emulation next to
    ReplacingMergeTree (``dedup_latest_version``) and the delta algebra
    (``cdc_incremental_agg``) — the write pattern the reference's sink
    tables would use if updates were modeled as cancel+state pairs.

    Scale posture: every window partitions by doc_id (one exchange for
    the whole reconstruction, same as cdc_apply_oplog); the sign
    explode is a width-2 fan-out; the collapse groupBy shuffles on
    (doc_id, payload) — uniform, pre-aggregated map-side. ClickHouse
    performs the identical cancellation incrementally at merge time;
    expressed relationally it is one GROUP BY ... HAVING SUM(sign)!=0."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("ch_events_src")
    return spark.sql(f"""
        WITH oplog AS ({_oplog_sql("ch_events_src")}),
        {_collapse_stages("spark")},
        signed AS (
            SELECT doc_id, d.sign, d.a_cents, d.field_b
            FROM trans
            LATERAL VIEW explode(array(
                named_struct(
                    'sign', CASE WHEN COALESCE(prev_exists, false)
                                 THEN -1 ELSE 0 END,
                    'a_cents', {_CENTS_PREV},
                    'field_b', COALESCE(prev_b, '__none__')),
                named_struct(
                    'sign', CASE WHEN exists_now THEN 1 ELSE 0 END,
                    'a_cents', {_CENTS_NOW},
                    'field_b', COALESCE(img_b, '__none__'))
            )) x AS d
            WHERE d.sign != 0
        )
        {_COLLAPSE_FINAL}
    """)


CDC_COLLAPSING_MERGE_SQL = f"""
    WITH oplog AS ({_oplog_sql("events")}),
    {_collapse_stages("duck")},
    signed AS (
        SELECT doc_id,
               CASE WHEN COALESCE(prev_exists, false)
                    THEN -1 ELSE 0 END AS sign,
               {_CENTS_PREV} AS a_cents,
               COALESCE(prev_b, '__none__') AS field_b
        FROM trans
        WHERE COALESCE(prev_exists, false)
        UNION ALL
        SELECT doc_id,
               CASE WHEN exists_now THEN 1 ELSE 0 END AS sign,
               {_CENTS_NOW} AS a_cents,
               COALESCE(img_b, '__none__') AS field_b
        FROM trans
        WHERE exists_now
    )
    {_COLLAPSE_FINAL}
"""


# ---------------------------------------------------------------------------
# scalar_url_parse — the ClickHouse URL function family
# ---------------------------------------------------------------------------


def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """protocol / domain / cutWWW / topLevelDomain / path / queryString /
    extractURLParameter / fragment over the deterministic fixture URLs
    (same synthesis as ``dedup_url_canonical`` — mixed-case hosts, UTM
    noise, fragments, trailing slashes on doc_id-derived subsets).

    The Spark side is the idiomatic ``parse_url`` (JVM codegen);
    missing components are coalesced to ``''`` — ClickHouse's own URL
    functions return the empty string on failure, and the oracle's
    ``regexp_extract`` does natively. Pure narrow projection fused into
    the scan: zero shuffles, the 100 TB cost is the scan itself."""
    docs = load_table(spark, sf_dir, "documents")
    scheme_host = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(
            F.lit("HTTPS://WWW."), F.upper(F.col("source")), F.lit(".Example.COM")
        ),
    ).otherwise(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com"))
    )
    url = F.concat(
        scheme_host,
        F.lit("/articles/"),
        (F.col("doc_id") % 100).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&ref=x")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#section2")).otherwise(F.lit("")),
    )
    with_url = docs.select("doc_id", url.alias("url"))

    def part(name: str) -> F.Column:
        return F.coalesce(F.parse_url("url", F.lit(name)), F.lit(""))

    host = part("HOST")
    domain_norm = F.regexp_replace(F.lower(host), "^www\\.", "")
    return with_url.select(
        "doc_id",
        "url",
        part("PROTOCOL").alias("protocol"),
        host.alias("host"),
        domain_norm.alias("domain_norm"),
        F.regexp_extract(domain_norm, "\\.([a-z0-9-]+)$", 1).alias("tld"),
        part("PATH").alias("path"),
        part("QUERY").alias("query_string"),
        F.coalesce(
            F.parse_url("url", F.lit("QUERY"), F.lit("utm_source")), F.lit("")
        ).alias("utm_source"),
        part("REF").alias("fragment"),
    ).orderBy("doc_id")


SCALAR_URL_PARSE_SQL = r"""
    WITH raw AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 1
                     THEN 'HTTPS://WWW.' || upper(source) || '.Example.COM'
                     ELSE 'https://' || source || '.example.com' END)
               || '/articles/' || CAST(doc_id % 100 AS VARCHAR)
               || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
               || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=x' ELSE '' END)
               || (CASE WHEN doc_id % 7 = 0 THEN '#section2' ELSE '' END) AS url
        FROM documents
    ),
    parts AS (
        SELECT doc_id, url,
               regexp_extract(url, '^([a-zA-Z]+)://', 1) AS protocol,
               regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1) AS host,
               regexp_replace(
                   lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1)),
                   '^www\.', '') AS domain_norm,
               regexp_extract(url, '^[a-zA-Z]+://[^/?#]*([^?#]*)', 1) AS path,
               regexp_extract(url, '\?([^#]*)', 1) AS query_string,
               regexp_extract(url, '[?&]utm_source=([^&#]*)', 1) AS utm_source,
               regexp_extract(url, '#(.*)$', 1) AS fragment
        FROM raw
    )
    SELECT doc_id, url, protocol, host, domain_norm,
           regexp_extract(domain_norm, '\.([a-z0-9-]+)$', 1) AS tld,
           path, query_string, utm_source, fragment
    FROM parts ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# scalar_ipv4_ops — the ClickHouse IPv4 function family
# ---------------------------------------------------------------------------


def _ipv4_sql(engine: str) -> str:
    """ClickHouse's IPv4 function family (IPv4NumToString /
    IPv4StringToNum / CIDR membership / subnet truncation) as pure
    integer+string expressions. Addresses derive deterministically from
    user ids by the Knuth multiplicative hash folded into the 32-bit
    space — exact BIGINT arithmetic in both engines, so the whole tier
    (including the string round-trip) is hash-checkable."""
    intdiv = "DIV" if engine == "spark" else "//"
    o = [
        f"(ip {intdiv} 16777216) % 256",
        f"(ip {intdiv} 65536) % 256",
        f"(ip {intdiv} 256) % 256",
        "ip % 256",
    ]
    ip_str = (
        "CAST(" + o[0] + " AS STRING) || '.' || CAST(" + o[1]
        + " AS STRING) || '.' || CAST(" + o[2] + " AS STRING)"
        + " || '.' || CAST(" + o[3] + " AS STRING)"
        if engine == "spark"
        else "CAST(" + o[0] + " AS VARCHAR) || '.' || CAST(" + o[1]
        + " AS VARCHAR) || '.' || CAST(" + o[2] + " AS VARCHAR)"
        + " || '.' || CAST(" + o[3] + " AS VARCHAR)"
    )
    return f"""
        WITH ips AS (
            SELECT DISTINCT user_id,
                   (user_id * 2654435761) % 4294967296 AS ip
            FROM events
        ),
        parts AS (
            SELECT user_id, ip, {ip_str} AS ip_str,
                   ({o[0]}) * 16777216 + ({o[1]}) * 65536
                       + ({o[2]}) * 256 + (ip % 256) AS ip_roundtrip,
                   (ip {intdiv} 16777216) % 256 = 10 AS in_10_slash_8,
                   (ip {intdiv} 256) * 256 AS subnet_24,
                   (ip {intdiv} 65536) * 65536 AS subnet_16
            FROM ips
        )
        SELECT user_id, ip, ip_str,
               ip_roundtrip = ip AS roundtrip_ok,
               in_10_slash_8, subnet_24, subnet_16
        FROM parts
        ORDER BY user_id
        LIMIT 200
    """


def scalar_ipv4_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IPv4 scalar tier — see _ipv4_sql. One distinct-user
    aggregate, then pure narrow maps; TakeOrderedAndProject caps the
    report."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ipv4_sql("spark"))


SCALAR_IPV4_OPS_SQL = _ipv4_sql("duck")


def _summing_merge_sql(engine: str) -> str:
    """ClickHouse SummingMergeTree FINAL semantics: rows sharing the
    ORDER BY key ((user_id, event_type)) collapse with numeric columns
    SUMMED; ClickHouse leaves non-summed columns as "any value from the
    set" — pinned here to MIN(event_id) so both engines (and any
    shuffle order) agree. Zero-sum groups SURVIVE —
    unlike CollapsingMergeTree, Summing keeps the key row (the
    documented difference cdc_collapsing_merge pins from the other
    side)."""
    del engine
    return """
        SELECT user_id, event_type,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               CAST(COUNT(*) AS BIGINT) AS n_merged,
               MIN(event_id) AS any_event_id
        FROM events
        GROUP BY user_id, event_type
        ORDER BY user_id, event_type
    """


def cdc_summing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree FINAL — see _summing_merge_sql. Completes the
    MergeTree-family trio: Replacing (dedup_latest_version),
    Collapsing (cdc_collapsing_merge), Summing (here) — the three
    background-merge semantics a ClickHouse sink user actually relies
    on.

    Scale posture: one map-side-combined aggregate keyed by the table's
    ORDER BY — exactly the merge ClickHouse amortizes in the
    background, expressed as the equivalent one-shuffle groupBy."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_summing_merge_sql("spark"))


CDC_SUMMING_MERGE_SQL = _summing_merge_sql("duck")


TOPK_WEIGHTED_K = 5


def _topk_weighted_sql(engine: str) -> str:
    """ClickHouse ``topKWeighted(K)(user_id, weight)`` re-expressed
    exactly: per event_type, the K users with the largest summed value
    weight (exact cents), deterministic tie-break by user_id. The
    approximate space-saving sketch ClickHouse uses is an ACCURACY
    trade its docs warn about; on an engine with a real shuffle the
    exact two-level aggregate is the same one pass, so exact is the
    default here (agg_heavy_hitters carries the sketch pattern when the
    key space itself cannot be shuffled)."""
    del engine
    return f"""
        WITH weights AS (
            SELECT event_type, user_id,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS weight_cents
            FROM events GROUP BY event_type, user_id
        )
        SELECT event_type, rk, user_id, weight_cents
        FROM (
            SELECT event_type, user_id, weight_cents,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY weight_cents DESC, user_id)
                        AS BIGINT) AS rk
            FROM weights
        ) ranked
        WHERE rk <= {TOPK_WEIGHTED_K}
        ORDER BY event_type, rk
    """


def agg_topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse topKWeighted: top {TOPK_WEIGHTED_K} users per event
    type by total event value — see _topk_weighted_sql.

    Scale posture: one corpus scan to the (type, user) weight aggregate
    (map-side combined); the rank window partitions by event_type over
    that aggregate and the filter truncates to K rows per partition —
    the window_rank_topk_per_group plan shape."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_topk_weighted_sql("spark"))


AGG_TOPK_WEIGHTED_SQL = _topk_weighted_sql("duck")


QUERIES: dict[str, tuple] = {
    "scalar_ipv4_ops": (scalar_ipv4_ops, SCALAR_IPV4_OPS_SQL),
    "agg_topk_weighted": (agg_topk_weighted, AGG_TOPK_WEIGHTED_SQL),
    "cdc_summing_merge": (cdc_summing_merge, CDC_SUMMING_MERGE_SQL),
    "events_sequence_match": (events_sequence_match, EVENTS_SEQUENCE_MATCH_SQL),
    "events_retention_conditions": (
        events_retention_conditions,
        EVENTS_RETENTION_SQL,
    ),
    "cdc_collapsing_merge": (cdc_collapsing_merge, CDC_COLLAPSING_MERGE_SQL),
    "scalar_url_parse": (scalar_url_parse, SCALAR_URL_PARSE_SQL),
}
