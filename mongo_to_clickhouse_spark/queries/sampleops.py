"""Deterministic sampling / dataset-split / profiling operators — the
remaining training-data-pipeline surface: repeatable corpus subsampling,
train/val/test splits, per-group quota samples, PPS (probability-
proportional-to-size) selection, and column profiling.

Everything is hash-deterministic (md5-derived integers, the same
``_md5_int`` construction as dedupops) rather than RNG-based, for two
reasons that matter at 100 TB:

* **Repeatability** — the same row lands in the same split on every run,
  on any cluster size, under any partitioning. RNG sampling
  (``df.sample``) is seed-and-partitioning dependent; hash sampling is a
  pure column expression, so backfills and incremental runs agree with
  historical runs row-for-row.
* **Oracle-checkability** — DuckDB computes the identical md5 integers,
  so even the "random" operators are exactly verified.

Scale posture: every sampler here is a narrow ``filter`` on a computed
column — zero shuffle, fully pushable behind any downstream exchange.
Only ``sample_split_summary`` (groupBy on a 3-value key) and
``sample_per_group_topk`` (window over ``lang``, bounded-cardinality
partitions) shuffle at all, and ``profile_column_stats`` is a single
full-scan aggregate producing O(#columns) rows.

Reference parity note: the reference engine has no sampling surface at
all (no $sample stage is used in its MQL, `src/main.rs` / `historical_
data/src/main.rs` scan everything); these are extension IDs required by
the training-pipeline north star, same status as the dedup/similarity
families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongo_to_clickhouse_spark.io import load_table

# 60-bit hash space (15 hex chars of md5) — same construction as
# dedupops._md5_int, identical in Spark and DuckDB.
HASH_SPACE = float(1 << 60)

SAMPLE_PCT = 10          # sample_hash_bernoulli keeps hash % 100 < 10
SPLIT_BUCKETS = 10       # train/val/test = 8/1/1 of hash % 10
PER_GROUP_K = 5          # quota per lang in sample_per_group_topk
PPS_SCALE = 2000.0       # keep prob = n_chars / PPS_SCALE, capped at 1


def _hash60(col):
    """Spark side of the shared 60-bit md5 hash (see dedupops)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def _hash60_sql(expr: str) -> str:
    """DuckDB side of the same hash."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


BOOT_B = 32  # Poisson-bootstrap resamples
# Prime draw modulus (smallest prime > 10^6): the per-(row, resample)
# uniform lives on [0, P) so the micro-unit Poisson thresholds below
# apply with ≤3e-6 relative distortion.
_BOOT_P = 1_000_003
# Poisson(1) inverse-CDF thresholds in micro units: weight = number of
# thresholds at or below the row's uniform draw (branch-free, 0..8)
_POIS_CUM_MICRO = (
    367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990,
)


def _bootstrap_body(events_rel: str, gen_b: str, h60,
                    seed_hint: str = "") -> str:
    """Engine-shared Poisson bootstrap over the event values: each (row,
    resample) pair draws a deterministic hash-uniform, maps it through
    the Poisson(1) inverse CDF to a replication weight (the distributed
    bootstrap — no global multinomial coordination, rows independent),
    aggregates each resample's weighted mean in exact cents, and ranks
    the {BOOT_B} means with a bounded ROW_NUMBER. ``gen_b`` is the
    dialect-specific 1..B generator applied per input row; ``h60`` spells
    the dialect's 60-bit md5→BIGINT.

    Draw construction (round 11, VERDICT r10 item 5): THREE md5 calls
    per input row (not one per (row, resample) — the old ×{BOOT_B} hash
    fan-out was the whole rehearsal cost) seed a degree-2 polynomial
    over the prime field F_{_BOOT_P}: u_b = (s1 + s2·b + s3·b²) mod P
    with s1,s2,s3 independent uniform hashes. Coefficients uniform on
    the field ⇒ draws are 3-wise independent across resamples, and
    pairwise independence is what the CI needs: resample means are
    row-sums, jointly Gaussian by CLT with cross-resample covariance
    driven by pairwise weight covariance — zero under pairwise
    independence, so the ranked quantiles estimate the same law as
    fully independent draws. Per-expanded-row work is 3 integer
    mul/adds (max term ~1e9, far from BIGINT range) instead of a
    string concat + md5."""
    w_terms = " + ".join(
        f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _POIS_CUM_MICRO
    )
    seed = {i: f"{h60(i)} % {_BOOT_P}" for i in (1, 2, 3)}
    return f"""
        WITH pts AS (
            SELECT event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM {events_rel} WHERE value IS NOT NULL
        ),
        seeds AS (
            SELECT {seed_hint} cents, {seed[1]} AS s1, {seed[2]} AS s2,
                   {seed[3]} AS s3
            FROM pts
        ),
        draws AS (
            SELECT cents, b, (s1 + s2 * b + s3 * b * b) % {_BOOT_P} AS u
            FROM (SELECT cents, s1, s2, s3, b FROM seeds {gen_b}) expanded
        ),
        resamples AS (
            SELECT b,
                   CAST(SUM(({w_terms}) * cents) AS BIGINT) AS sum_cents,
                   CAST(SUM({w_terms}) AS BIGINT) AS n_eff
            FROM draws GROUP BY b
        ),
        means AS (
            SELECT b,
                   CAST(floor(sum_cents * 10000.0
                              / CAST(n_eff AS DOUBLE)) AS BIGINT) AS m
            FROM resamples
        ),
        ranked AS (
            -- ROW_NUMBER over the {BOOT_B}-row means relation (bounded,
            -- whitelisted): the earlier triangular self-join referenced
            -- means twice, and Spark re-expanded the whole resample
            -- pipeline (corpus scan + x{BOOT_B} explode) per side
            SELECT b, m,
                   CAST(ROW_NUMBER() OVER (ORDER BY m, b) AS BIGINT) AS r
            FROM means
        ),
        point AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(floor(SUM(cents) * 10000.0
                              / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
                       AS point_mean_micro
            FROM pts
        ),
        ci AS (
            -- conditional aggregation, NOT scalar subqueries: each
            -- scalar subquery reference re-expanded the whole
            -- resample pipeline (corpus scan + x{BOOT_B} explode) in
            -- Spark's plan — 9 scans / 8 generates planned; this form
            -- reads ranked once (ranks are unique by construction, so
            -- MIN(CASE) picks the same single value)
            SELECT CAST(MIN(CASE WHEN r = 2 THEN m END) AS BIGINT)
                       AS p05,
                   CAST(MIN(CASE WHEN r = {BOOT_B - 1} THEN m END)
                        AS BIGINT) AS p95
            FROM ranked
        )
        SELECT p.n_rows, p.point_mean_micro,
               c.p05 AS boot_p05_micro,
               c.p95 AS boot_p95_micro,
               c.p95 - c.p05 AS ci_width_micro
        FROM point p CROSS JOIN ci c
    """


def sample_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean event value via the
    POISSON bootstrap (Chamandy et al., the only bootstrap that
    distributes: classic resampling needs a global multinomial draw per
    resample, Poisson(1) weights make every row independent — one pass,
    mergeable, reproducible from the hash seed). {BOOT_B} deterministic
    resamples; CI from the 2nd/31st ranked means (~94% coverage).

    Scale posture: the fan-out is a constant ×{BOOT_B} map (no shuffle
    until the B-group aggregate, which partial-aggregates map-side to
    {BOOT_B} groups) with THREE md5 calls per source row, not per
    expanded row (round 11 — the ×{BOOT_B} hash fan-out dominated the
    sf1 rehearsal); ranking is a bounded ROW_NUMBER over a {BOOT_B}-row
    relation. Exactness: weights and cent sums are exact integers; the
    mean is an explicit floor of a <2^53 double division."""
    from mongo_to_clickhouse_spark.operators.autoscale import corpus_count

    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("boot_events_src")
    # defensive repartition before the x{BOOT_B} explode (round 11): the
    # events scan is file-size-partitioned, so at sf1 the 32M expanded
    # rows ran in ~1 task (5.8x rehearsal ratio). Spark-only physical
    # hint, gated so small-fixture plans stay unchanged; the oracle body
    # is unaffected (hints are not semantics).
    n = corpus_count(spark, sf_dir, "events")
    hint = (
        f"/*+ REPARTITION({spark.sparkContext.defaultParallelism}) */"
        if n * BOOT_B > 2_000_000 else ""
    )
    body = _bootstrap_body(
        "boot_events_src",
        f"LATERAL VIEW explode(sequence(1, {BOOT_B})) tb AS b",
        _h60_spark_sql,
        seed_hint=hint,
    )
    return spark.sql(body)


def _h60_spark_sql(i: int) -> str:
    """Spark-SQL spelling of the 60-bit md5→BIGINT seed hash ``s{i}``."""
    return (
        "CAST(conv(substring(md5(concat(CAST(event_id AS STRING),"
        f" '_s{i}')), 1, 15), 16, 10) AS BIGINT)"
    )


def _h60_duck_sql(i: int) -> str:
    """DuckDB spelling of the same seed hash."""
    return (
        "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)"
        f" || '_s{i}'), 1, 15)) AS BIGINT)"
    )


SAMPLE_BOOTSTRAP_CI_SQL = _bootstrap_body(
    "events", f", unnest(range(1, {BOOT_B + 1})) AS tb(b)", _h60_duck_sql
)


def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample of documents: keep rows whose
    md5(doc_id) bucket falls under SAMPLE_PCT. A pure filter — no shuffle,
    no RNG state; at 100 TB this is a map-only pass that AQE/pushdown can
    place anywhere in the plan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(_hash60(F.col("doc_id")) % 100 < SAMPLE_PCT).select(
        "doc_id", "lang", "source", "n_chars"
    )


SAMPLE_HASH_BERNOULLI_SQL = f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_hash60_sql("doc_id")} % 100 < {SAMPLE_PCT}
"""


def sample_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split assignment (8/1/1 by hash bucket) with
    per-split accounting — the split itself is a narrow map; the summary
    groupBy shuffles on a 3-value key (a broadcastable aggregate at any
    scale)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _hash60(F.col("doc_id")) % SPLIT_BUCKETS
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket < 9, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


SAMPLE_SPLIT_SUMMARY_SQL = f"""
    SELECT CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket < 9 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM (SELECT {_hash60_sql("doc_id")} % {SPLIT_BUCKETS} AS bucket, n_chars
          FROM documents)
    GROUP BY 1
"""


def sample_per_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group quota sample: rank docs inside each lang
    by their hash and keep the first PER_GROUP_K — the scalable stand-in
    for per-stratum reservoir sampling (one window shuffle keyed on lang;
    with bounded stratum cardinality the plan is a single exchange)."""
    docs = load_table(spark, sf_dir, "documents")
    h = _hash60(F.col("doc_id"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PER_GROUP_K)
        .select("lang", "doc_id", F.col("rk").cast("bigint").alias("rk"))
    )


SAMPLE_PER_GROUP_TOPK_SQL = f"""
    SELECT lang, doc_id, rk FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_hash60_sql("doc_id")} ASC, doc_id ASC) AS rk
        FROM documents
    ) WHERE rk <= {PER_GROUP_K}
"""


def sample_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size Bernoulli selection: keep a doc
    with probability n_chars / PPS_SCALE (capped at 1), decided by the
    deterministic hash fraction. Comparison is done in integer space
    (hash · PPS_SCALE < n_chars · 2^60 ⇔ hash/2^60 < n_chars/PPS_SCALE)
    to avoid float-boundary divergence between engines."""
    docs = load_table(spark, sf_dir, "documents")
    h = _hash60(F.col("doc_id"))
    keep = h.cast("double") * PPS_SCALE < F.col("n_chars").cast("double") * HASH_SPACE
    return docs.filter(keep).select("doc_id", "lang", "n_chars")


SAMPLE_WEIGHTED_PPS_SQL = f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST({_hash60_sql("doc_id")} AS DOUBLE) * {PPS_SCALE}
          < CAST(n_chars AS DOUBLE) * {HASH_SPACE}
"""


def _class_balance_sql(engine: str) -> str:
    """Class balancing by downsampling to the minority class: every lang
    keeps exactly min-class-size docs, chosen by deterministic hash rank
    (reproducible across runs/cluster sizes, like every sampler here).
    Output is the per-class accounting proving exact balance.

    Scale shape: one class-count aggregate (broadcast 1-row min), one
    class-partitioned hash-rank window, one filter — the classifier-
    training prep (langid, quality) that prevents majority-class
    collapse."""
    h = (
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
        if engine == "spark"
        else _hash60_sql("doc_id")
    )
    return f"""
        WITH sized AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY {h}, doc_id) AS r
            FROM documents
        ),
        mn AS (
            SELECT MIN(cnt) AS min_cnt FROM (
                SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
            ) c
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM sized CROSS JOIN mn
        WHERE r <= mn.min_cnt
        GROUP BY lang ORDER BY lang
    """


def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample-to-minority class balancing — see _class_balance_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_class_balance_sql("spark"))


SAMPLE_CLASS_BALANCE_SQL = _class_balance_sql("duck")


TEMP_ALPHA_MILLI = 700   # temperature α = 0.7 (the mBERT/XLM-R value)


def _temperature_mix_sql(engine: str) -> str:
    """Temperature-scaled domain mixing (Devlin et al. mBERT; Conneau et
    al. XLM-R): sampling weight w_s ∝ n_s^α with α < 1 flattens the
    domain distribution — big domains are down-weighted, small ones
    boosted — before drawing a training mixture. n^α is computed as
    exp(α·ln n) with ln/exp evaluated once per SOURCE (|sources|-row
    relation) and immediately rounded to integer micro-units, so the
    normalization and per-source keep-rates are exact integer arithmetic
    (the text_perplexity_unigram determinism recipe applied to the mix
    math)."""
    intdiv = "DIV" if engine == "spark" else "//"
    return f"""
        WITH counts AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        ),
        w AS (
            SELECT source, n_docs,
                   CAST(round(exp({TEMP_ALPHA_MILLI} / 1000.0 * ln(n_docs))
                              * 1000000) AS BIGINT) AS w_micro
            FROM counts
        ),
        tot AS (SELECT SUM(w_micro) AS wt, SUM(n_docs) AS nt FROM w)
        SELECT w.source, w.n_docs, w.w_micro,
               CAST((w.w_micro * 1000000) {intdiv} tot.wt AS BIGINT)
                   AS share_ppm,
               CAST((w.n_docs * 1000000) {intdiv} tot.nt AS BIGINT)
                   AS raw_share_ppm
        FROM w CROSS JOIN tot
        ORDER BY w.source
    """


def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights per source — see
    _temperature_mix_sql. share_ppm vs raw_share_ppm exposes the
    flattening (α = {TEMP_ALPHA_MILLI}/1000). Scale posture: one corpus
    aggregate; everything after is |sources|-row math with 1-row
    broadcast totals."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_temperature_mix_sql("spark"))


SAMPLE_TEMPERATURE_MIX_SQL = _temperature_mix_sql("duck")


RESERVOIR_K = 100


def _reservoir_sql(engine: str) -> str:
    """Weighted reservoir sampling (Efraimidis–Spirakis A-Res): each doc
    draws u ∈ (0, 1] from its deterministic hash and scores
    −ln(u)/weight; the k SMALLEST scores are the exactly-k sample with
    inclusion probability proportional to weight. Scores are rounded to
    integer nano-units before ranking (ln is correctly-rounded libm on
    both engines — the text_perplexity_unigram determinism argument —
    and the rounding absorbs any last-ulp drift; ties break by doc_id)."""
    h = _hash60_sql("doc_id") if engine == "duck" else None
    if engine == "spark":
        h = ("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15),"
             " 16, 10) AS BIGINT)")
    return f"""
        SELECT doc_id, lang, n_chars, score_nano FROM (
            SELECT doc_id, lang, n_chars,
                   CAST(round(
                       -ln(({h} + 1) / CAST({HASH_SPACE + 1} AS DOUBLE))
                       / n_chars * 1e9) AS BIGINT) AS score_nano
            FROM documents WHERE n_chars > 0
        ) scored
        ORDER BY score_nano, doc_id LIMIT {RESERVOIR_K}
    """


def sample_reservoir_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k weighted sample (weight = n_chars) via the
    Efraimidis–Spirakis key trick — the distributed reservoir: unlike
    sample_weighted_pps (Bernoulli, variable size), this returns a fixed
    k, and unlike a sequential reservoir it has no scan order — the
    sample is a pure top-k over deterministic per-row scores, so it is
    reproducible across runs, partitionings, and cluster sizes, and
    merges across shards by concatenate + re-rank (keep the k smallest),
    exactly like the KMV sketch.

    Scale posture: narrow map to score each row + TakeOrderedAndProject
    (per-partition heaps of size k, no global sort, no window)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_reservoir_sql("spark"))


SAMPLE_RESERVOIR_WEIGHTED_SQL = _reservoir_sql("duck")


_CHECKSUM_TABLES = (
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("events", "event_id"),
)


def _replication_checksum_sql(engine: str) -> str:
    """Per-table key-set checksum: row count + ORDER-INSENSITIVE content
    signature (sum of truncated key hashes mod 1e12) + key min/max — the
    replication-validation query a source↔sink migration runs on both
    ends and diffs (the reference's whole raison d'être is keeping
    ClickHouse equal to Mongo; its at-least-once delivery makes this
    check operationally necessary — cf. cdc_snapshot_reconcile for the
    row-level version). Hash SUMS commute, so the signature is
    partition- and order-independent — computable shard-by-shard and
    added up, which is what makes it usable at 100 TB."""
    if engine == "spark":
        def h(col):
            return (f"CAST(conv(substring(md5(CAST({col} AS STRING)),"
                    f" 1, 15), 16, 10) AS BIGINT) % 1000000000000")
    else:
        def h(col):
            return (f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)),"
                    f" 1, 15)) AS BIGINT) % 1000000000000")
    parts = [
        f"""
        SELECT '{t}' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM({h(k)}) AS BIGINT) AS key_sig,
               CAST(MIN({k}) AS BIGINT) AS min_key,
               CAST(MAX({k}) AS BIGINT) AS max_key
        FROM {t}"""
        for t, k in _CHECKSUM_TABLES
    ]
    return " UNION ALL ".join(parts) + " ORDER BY table_name"


def profile_replication_checksum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Migration/replication validation checksums — see
    _replication_checksum_sql. One aggregate-only scan per table."""
    for t, _ in _CHECKSUM_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_replication_checksum_sql("spark"))


PROFILE_REPLICATION_CHECKSUM_SQL = _replication_checksum_sql("duck")


def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling of ``events`` — null count, approx-free distinct
    count, min/max (stringified) per column, one output row per column.
    One full-scan aggregate (map-side partial, O(#cols) result); the
    unpivot to rows is driver-free (stack over the single agg row)."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    one = ev.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_str, max_str)"
    )


_PROFILE_PARTS = "\n    UNION ALL\n".join(
    f"""
    SELECT '{c}' AS column_name,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           MIN(CAST({c} AS VARCHAR)) AS min_str,
           MAX(CAST({c} AS VARCHAR)) AS max_str
    FROM events"""
    for c in ["event_id", "user_id", "event_type", "value"]
)

PROFILE_COLUMN_STATS_SQL = _PROFILE_PARTS


# per-lang keep percentages for the stratified sampler (unlisted → 100)
STRATA_PCT = {"en": 50, "de": 30, "fr": 20}

MIX_BUDGET_PCT = 40      # domain_mix_sampler: keep ~40% of the corpus…
MIX_N_SOURCES = 20       # …spread evenly across the 20 sources
MIX_RATE_SPACE = 1_000_000


def _strata_pct_spark():
    expr = F.lit(100)
    for lang, pct in sorted(STRATA_PCT.items()):
        expr = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(expr)
    return expr


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Bernoulli sampling with a different keep-rate per lang
    (downsample over-represented languages, keep the tail whole — the
    static form of mixture rebalancing). Still a pure narrow filter: the
    rate lookup is a literal CASE, so the plan is scan → filter with
    full pushdown, zero shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    keep = _hash60(F.col("doc_id")) % 100 < _strata_pct_spark()
    return docs.filter(keep).select("doc_id", "lang", "source", "n_chars")


_STRATA_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{lang}' THEN {pct}"
        for lang, pct in sorted(STRATA_PCT.items())
    )
    + " ELSE 100 END"
)

SAMPLE_STRATIFIED_SQL = f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_hash60_sql("doc_id")} % 100 < {_STRATA_CASE_SQL}
"""


def domain_mix_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture sampling: hit a corpus-wide token budget
    (MIX_BUDGET_PCT% of docs) spread EVENLY across sources — the DoReMi-
    style static domain reweighting step of a pretraining pipeline.
    Over-represented sources are downsampled to the per-source quota;
    under-represented ones are kept whole (rate capped at 1).

    The keep-rate per source is derived from data (count per source) but
    stays exact: all arithmetic is integer (floor division into a 10^6
    rate space), so both engines compute identical rates and the hash
    filter picks identical rows.

    Scale posture: one tiny aggregate (groupBy source, 20 rows) is
    broadcast back onto the scan — the sampler itself remains a narrow
    filter; no full-data shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()  # control-plane scalar (1 job, O(files) work)
    quota = (total * MIX_BUDGET_PCT // 100) // MIX_N_SOURCES
    rates = (
        docs.groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .select(
            "source",
            F.least(
                F.lit(MIX_RATE_SPACE).cast("bigint"),
                # integer floor-div (`div`), NOT float `/`: a double
                # quotient landing one ulp above an integer boundary
                # would diverge from DuckDB's `//`
                F.expr(f"{quota * MIX_RATE_SPACE}L div cnt"),
            ).alias("rate_ppm"),
        )
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(_hash60(F.col("doc_id")) % MIX_RATE_SPACE < F.col("rate_ppm"))
        .select("doc_id", "source", "rate_ppm")
    )
    return kept


DOMAIN_MIX_SAMPLER_SQL = f"""
    WITH rates AS (
        SELECT source,
               LEAST(
                   {MIX_RATE_SPACE},
                   CAST(((SELECT COUNT(*) FROM documents)
                          * {MIX_BUDGET_PCT} // 100 // {MIX_N_SOURCES})
                        * {MIX_RATE_SPACE} // COUNT(*) AS BIGINT)
               ) AS rate_ppm
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, r.rate_ppm
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {_hash60_sql("d.doc_id")} % {MIX_RATE_SPACE} < r.rate_ppm
"""


WATERFILL_BUDGET_NUM = 3   # budget = 3/5 of the total token supply
WATERFILL_BUDGET_DEN = 5


def _waterfill_sql(engine: str) -> str:
    """Water-filling allocation in closed form over the cap-sorted
    sources: θ is found in the first segment where
    cum_below + cap_i · (remaining incl. i) ≥ budget, then
    θ = (budget − cum_below) DIV remaining — all exact integers (both
    integer divisions act on non-negative operands, so Spark's trunc
    and DuckDB's floor agree)."""
    if engine == "spark":
        ntok = "size(split(text, ' '))"
        intdiv = "DIV"
    else:
        ntok = "len(string_split(text, ' '))"
        intdiv = "//"
    return f"""
        WITH caps AS (
            SELECT source, CAST(SUM({ntok}) AS BIGINT) AS cap
            FROM documents GROUP BY source
        ),
        b AS (
            SELECT (SUM(cap) * {WATERFILL_BUDGET_NUM})
                   {intdiv} {WATERFILL_BUDGET_DEN} AS budget
            FROM caps
        ),
        ord AS (
            SELECT source, cap,
                   ROW_NUMBER() OVER (ORDER BY cap, source) AS i,
                   SUM(cap) OVER (ORDER BY cap, source) - cap AS cum_below,
                   COUNT(*) OVER () AS ns
            FROM caps
        ),
        th AS (
            SELECT (b.budget - cum_below) {intdiv} (ns - i + 1) AS theta
            FROM ord, b
            WHERE cum_below + cap * (ns - i + 1) >= b.budget
            ORDER BY i LIMIT 1
        )
        SELECT c.source, c.cap AS cap_tokens,
               CAST(LEAST(c.cap, th.theta) AS BIGINT) AS alloc_tokens,
               CAST(th.theta AS BIGINT) AS theta
        FROM caps c, th
        ORDER BY c.source
    """


def domain_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix budget allocation by WATER-FILLING: given per-source
    token supplies and a total token budget ({WATERFILL_BUDGET_NUM}/
    {WATERFILL_BUDGET_DEN} of the corpus), allocate
    alloc_s = min(cap_s, θ) with the threshold θ chosen so the
    allocations exactly exhaust the budget (up to integer remainder) —
    small sources are taken whole, large sources are capped at θ. This
    is the standard mixture-balancing step between domain_mix_sampler's
    fixed weights and the sampling itself (don't oversample what a
    domain can't supply; spread the slack across the big domains).

    Scale shape: one corpus aggregate to |sources| rows; everything
    after is window math over that tiny relation (the sort, cumulative
    sums, and segment search are all |sources|-bounded — driver-free and
    exact-integer, so the closed form replaces the iterative
    water-filling loop entirely)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_waterfill_sql("spark"))


DOMAIN_BUDGET_WATERFILL_SQL = _waterfill_sql("duck")


NEYMAN_BUDGET_PCT = 10   # total sample = 10% of the order population


def _neyman_sql(engine: str, sized_from: str | None = None) -> str:
    """Neyman-optimal stratified allocation + the draw itself.

    n_h ∝ N_h·S_h (the variance-minimizing allocation for a fixed total
    sample size — Neyman 1934), subject to n_h ≤ N_h. The cap makes the
    naive proportional rule lossy (a small high-variance stratum can
    saturate, stranding budget), so the allocation is solved EXACTLY as
    a water-fill: sort strata by capacity/weight ratio N_h/w_h, find the
    saturation frontier by integer cross-multiplication
    ((B − ΣN_below)·w_h < N_h·w_tail), take saturated strata whole, and
    split the remaining budget over the unsaturated tail proportional
    to w_h with LARGEST-REMAINDER rounding — so Σn_h equals the budget
    exactly whenever B ≤ ΣN_h (here B is 10% of the population, so
    always). floor(θ·w_h) < N_h on the unsaturated side guarantees the
    +1 remainder bump never overshoots a cap.

    Exactness: values are floored to hecto-dollars so the per-stratum
    power sums stay exact BIGINTs far below 2^63 (n·Σx² ≤ ~6e17 at
    sf1); S_h touches doubles only at the |strata|-row level (one
    correctly-rounded sqrt, immediately rounded to micro); the
    allocation arithmetic is exact integer cross-multiplication (all
    operands non-negative, so Spark's trunc-DIV and DuckDB's floor-//
    agree). The draw is the house md5-rank: deterministic on any
    cluster size, identically computable by DuckDB.

    ``sized_from``: name of a pre-materialized |strata|-row (stratum,
    big_n, s_micro) relation (Spark path). The allocation tail
    references the frontier chain from FOUR consumers (budget, seg, the
    pick fallback, base); as inline CTEs Catalyst re-expands the whole
    subtree — including the orders scan under strat — per reference
    (24 shuffles / 11 corpus scans planned). With the tiny relation
    checkpointed, re-expansion is grid-sized and the corpus is scanned
    exactly twice: the allocation aggregate and the draw."""
    intdiv = "DIV" if engine == "spark" else "//"
    h = (
        "CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))"
        " AS BIGINT)"
        if engine != "spark"
        else "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 15),"
        " 16, 10) AS BIGINT)"
    )
    vals_cte = """vals AS (
            SELECT o_orderpriority AS stratum, o_orderkey,
                   CAST(floor(o_totalprice / 100.0) AS BIGINT) AS x
            FROM orders
        )"""
    # standalone: distinct inner CTE names so inlining it under the
    # full query's WITH (which also defines vals) never shadows
    sized_body = """
        WITH strat AS (
            SELECT o_orderpriority AS stratum,
                   CAST(COUNT(*) AS BIGINT) AS big_n,
                   CAST(SUM(CAST(floor(o_totalprice / 100.0) AS BIGINT))
                        AS BIGINT) AS sx,
                   CAST(SUM(CAST(floor(o_totalprice / 100.0) AS BIGINT)
                            * CAST(floor(o_totalprice / 100.0) AS BIGINT))
                        AS BIGINT) AS sx2
            FROM orders GROUP BY 1
        )
        SELECT stratum, big_n,
               CAST(round(sqrt((big_n * sx2 - sx * sx)
                          / CAST(big_n * (big_n - 1) AS DOUBLE)) * 1e6)
                    AS BIGINT) AS s_micro
        FROM strat
    """
    if sized_from == "__BODY__":
        return sized_body
    if sized_from is None:
        sized = "sized"
        prefix = f"{vals_cte},\n        sized AS ({sized_body})"
    else:
        sized = sized_from
        prefix = vals_cte
    return f"""
        WITH {prefix},
        budget AS (
            SELECT (SUM(big_n) * {NEYMAN_BUDGET_PCT}) {intdiv} 100
                       AS n_total
            FROM {sized}
        ),
        weighted AS (
            -- allocation weight in MILLI (s_micro DIV 1000): the
            -- frontier cross-multiplications below are big_n*w_tail
            -- sized, and micro-scaled weights overflow BIGINT near
            -- sf0.5 (1.5e5 * 1e15); milli keeps them < ~1e18 at sf1
            -- with 7 significant digits of S_h, far beyond what an
            -- integer allocation can resolve
            SELECT stratum, big_n, s_micro,
                   big_n * (s_micro {intdiv} 1000) AS w
            FROM {sized}
        ),
        ratio_ord AS (
            -- capacity/weight ratio ascending = water-fill saturation
            -- order; w = 0 strata (S_h = 0) sort LAST via an explicit
            -- key (Spark yields NULL and DuckDB inf for x/0e0, which
            -- sort on opposite ends — never order by the raw ratio)
            SELECT stratum, big_n, s_micro, w,
                   ROW_NUMBER() OVER (
                       ORDER BY w = 0,
                                CASE WHEN w = 0 THEN 0e0
                                     ELSE CAST(big_n AS DOUBLE) / w END,
                                stratum) AS i
            FROM weighted
        ),
        frontier_scan AS (
            SELECT stratum, big_n, s_micro, w, i,
                   CAST(COALESCE(SUM(big_n) OVER (ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS cum_n_below,
                   CAST(SUM(w) OVER (ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS BIGINT) AS w_tail
            FROM ratio_ord
        ),
        seg AS (
            -- first stratum the water level does NOT saturate:
            -- (B - ΣN_below)·w_i < N_i·w_tail, exact integer cross-mult
            SELECT i AS i0, cum_n_below AS sat_n, w_tail AS w_rem
            FROM frontier_scan CROSS JOIN budget
            WHERE (n_total - cum_n_below) * w < big_n * w_tail
            ORDER BY i LIMIT 1
        ),
        pick AS (
            -- seg is empty iff the budget covers every positive-weight
            -- stratum whole (only reachable when zero-weight strata
            -- dominate the population); the fallback row saturates all
            -- of them and allocates nothing further. ORDER BY i0 keeps
            -- the genuine frontier when it exists.
            SELECT i0, sat_n, w_rem FROM (
                SELECT * FROM seg
                UNION ALL
                SELECT CAST(MAX(i) + 1 AS BIGINT),
                       CAST(SUM(CASE WHEN w > 0 THEN big_n
                                     ELSE 0 END) AS BIGINT),
                       CAST(1 AS BIGINT)
                FROM frontier_scan
            ) cand ORDER BY i0 LIMIT 1
        ),
        base AS (
            SELECT f.stratum, f.big_n, f.s_micro, b.n_total,
                   CASE WHEN f.w = 0 THEN CAST(0 AS BIGINT)
                        WHEN f.i < s.i0 THEN f.big_n
                        ELSE ((b.n_total - s.sat_n) * f.w) {intdiv} s.w_rem
                   END AS n_base,
                   CASE WHEN f.w = 0 OR f.i < s.i0 THEN CAST(-1 AS BIGINT)
                        ELSE ((b.n_total - s.sat_n) * f.w) % s.w_rem
                   END AS rem
            FROM frontier_scan f CROSS JOIN pick s CROSS JOIN budget b
        ),
        alloc AS (
            SELECT stratum, big_n, s_micro,
                   n_base + CASE WHEN rem >= 0 AND ROW_NUMBER() OVER (
                           PARTITION BY CASE WHEN rem >= 0 THEN 1 ELSE 0 END
                           ORDER BY rem DESC, stratum)
                       <= n_total - SUM(n_base) OVER ()
                       THEN 1 ELSE 0 END AS n_alloc
            FROM base
        ),
        ranked AS (
            SELECT v.stratum, v.x,
                   ROW_NUMBER() OVER (PARTITION BY v.stratum
                                      ORDER BY {h}, v.o_orderkey) AS r
            FROM vals v
        ),
        drawn AS (
            SELECT r.stratum,
                   CAST(COUNT(*) AS BIGINT) AS n_drawn,
                   CAST(SUM(r.x) AS BIGINT) AS sum_drawn
            FROM ranked r JOIN alloc a ON a.stratum = r.stratum
            WHERE r.r <= a.n_alloc
            GROUP BY r.stratum
        )
        SELECT a.stratum, a.big_n AS stratum_size, a.s_micro,
               CAST(a.n_alloc AS BIGINT) AS n_alloc, d.n_drawn,
               CAST(floor(d.sum_drawn * 1000000.0
                          / CAST(d.n_drawn AS DOUBLE)) AS BIGINT)
                   AS mean_drawn_hecto_micro
        FROM alloc a JOIN drawn d ON d.stratum = a.stratum
        ORDER BY a.stratum
    """


def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling over orders (strata =
    o_orderpriority, measurement = order value): allocate a
    {NEYMAN_BUDGET_PCT}% total budget across strata proportional to
    N_h·S_h — the allocation that minimizes the estimator variance for
    a fixed sample size — then DRAW the sample deterministically by
    md5-rank within each stratum. The survey-sampling companion to
    ``sample_stratified`` (fixed rates) and ``sample_weighted_pps``
    (size-proportional inclusion).

    Scale posture: one scan → the checkpointed |strata|-row moment
    relation (see _neyman_sql's sized_from note: inline, the allocation
    tail re-expanded the scan 11×); all allocation math is window
    arithmetic over that tiny leaf; the draw is one per-stratum rank
    window (partitions bounded by stratum sizes — for heavy strata the
    rank could ride ``distributed_global_rank``, not needed at
    priority-cardinality strata) + a broadcast join against the 5-row
    allocation."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")

    def build():
        return spark.sql(_neyman_sql("spark", sized_from="__BODY__"))

    sized = cached_barrier_view(
        spark, sf_dir, "neyman_sized", build, tables=("orders",)
    )
    return spark.sql(_neyman_sql("spark", sized_from=sized))


SAMPLE_NEYMAN_ALLOCATION_SQL = _neyman_sql("duck")


SKEW_TOPK = 10


def _skew_sql(engine: str) -> str:
    """Per-key skew diagnostics over the events join key: the top-K
    heaviest user_ids with their share of total rows in exact ppm
    (integer division — Spark DIV and DuckDB // agree on non-negative
    operands), plus a user_id = −1 summary row carrying the total row
    count and the cumulative top-K share. This is the report you run
    BEFORE a big join to decide whether a key needs salting/AQE
    skew-split — the operational companion to join_skew_salted."""
    intdiv = "DIV" if engine == "spark" else "//"
    return f"""
        WITH counts AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id
        ),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts),
        top AS (
            SELECT user_id, cnt FROM counts
            ORDER BY cnt DESC, user_id LIMIT {SKEW_TOPK}
        )
        SELECT t.user_id, t.cnt,
               CAST((t.cnt * 1000000) {intdiv} x.total AS BIGINT)
                   AS share_ppm
        FROM top t CROSS JOIN tot x
        UNION ALL
        SELECT CAST(-1 AS BIGINT) AS user_id, x.total AS cnt,
               CAST((s.topsum * 1000000) {intdiv} x.total AS BIGINT)
                   AS share_ppm
        FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS topsum FROM top) s
        CROSS JOIN tot x
        ORDER BY cnt DESC, user_id
    """


def profile_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report — see _skew_sql. Scale posture: one
    partial-aggregated groupBy on the key (the thing being measured),
    then TakeOrderedAndProject for the top-K (per-partition heaps, no
    global sort) and 1-row broadcast joins for the shares."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_skew_sql("spark"))


PROFILE_SKEW_REPORT_SQL = _skew_sql("duck")


SYSTEMATIC_INTERVAL = 10   # keep every 10th row of the hash-ordered frame


def sample_systematic_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every-k-th) sampling of orders: rank the population
    under the deterministic total order (md5 hash, key) and keep ranks
    ≡ 1 (mod {SYSTEMATIC_INTERVAL}) — the classic equal-interval design
    (hash order makes the implicit stratification uniform rather than
    insertion-ordered). Reported per priority stratum so the draw's
    balance is auditable next to the Bernoulli/stratified/Neyman tiers.

    Scale posture: the global rank rides the two-pass range-partitioned
    sort-rank (operators/rank.py — per-partition row_numbers + 32-row
    triangular offsets), never a no-partition window; the mod filter is
    a narrow map and the audit groupBy shuffles on the 5-value priority
    key. (hash, key) is a total order, so the decomposition equals the
    oracle's naive global row_number exactly."""
    from mongo_to_clickhouse_spark.operators.rank import (
        distributed_global_rank,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.expr("CAST(floor(o_totalprice / 100.0) AS BIGINT)").alias("hecto"),
        _hash60(F.col("o_orderkey")).alias("h"),
    )
    ranked = distributed_global_rank(
        orders, [F.col("h"), F.col("o_orderkey")], rank_col="rk",
        bucket_key=F.col("h"), bucket_tiebreak=F.col("o_orderkey"),
    )
    return (
        ranked.filter((F.col("rk") % SYSTEMATIC_INTERVAL) == 1)
        .groupBy(F.col("o_orderpriority").alias("stratum"))
        .agg(
            F.count("*").cast("bigint").alias("n_drawn"),
            F.sum("hecto").cast("bigint").alias("sum_hecto"),
            F.min("rk").cast("bigint").alias("first_rank"),
            F.max("rk").cast("bigint").alias("last_rank"),
        )
        .orderBy("stratum")
    )


SAMPLE_SYSTEMATIC_INTERVAL_SQL = f"""
    WITH ranked AS (
        SELECT o_orderpriority AS stratum,
               CAST(floor(o_totalprice / 100.0) AS BIGINT) AS hecto,
               row_number() OVER (
                   ORDER BY {_hash60_sql("o_orderkey")}, o_orderkey) AS rk
        FROM orders
    )
    SELECT stratum,
           CAST(COUNT(*) AS BIGINT) AS n_drawn,
           CAST(SUM(hecto) AS BIGINT) AS sum_hecto,
           CAST(MIN(rk) AS BIGINT) AS first_rank,
           CAST(MAX(rk) AS BIGINT) AS last_rank
    FROM ranked
    WHERE rk % {SYSTEMATIC_INTERVAL} = 1
    GROUP BY stratum
    ORDER BY stratum
"""


CHI2_TOP_CELLS = 5


def _chi2_body(docs_rel: str, cells_from: str | None = None) -> str:
    """Engine-shared chi-square test of independence between document
    language and source (the does-my-mix-drift-by-provider audit):

        X² = Σ_cells (O·N − R·C)² / (N·R·C)

    — the expected-count form cleared of the E denominator so every
    operand is an exact BIGINT count; each cell's contribution is ONE
    double expression over exact integers, ROUNDED (not floored) to
    micro — the quotient lands exactly on integers whenever n·r·c
    divides the squared deviation, and floor amplifies a 1-ulp
    cross-engine wobble at those boundaries while round() is stable —
    and the total is a pure BIGINT sum.
    Emits the total (sentinel '__total__' row, with dof = (r−1)(c−1))
    plus the top-{CHI2_TOP_CELLS} contributing cells so a significant
    statistic is immediately attributable.

    ``cells_from``: pre-materialized contingency cells (Spark path) —
    inline, cells is referenced twice (marginals + totals) and contrib
    twice (total row + ranked cells): four corpus scans planned; the
    checkpointed |langs|·|sources| grid leaves zero. The '__BODY__'
    sentinel returns the cell SQL itself so the barrier build shares
    this body."""
    cells_body = f"""
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM {docs_rel}
        GROUP BY lang, source
    """
    if cells_from == "__BODY__":
        return cells_body
    cells_rel = (
        f"cells AS (SELECT * FROM {cells_from})" if cells_from
        else f"cells AS ({cells_body})"
    )
    return f"""
        WITH {cells_rel},
        marg AS (
            SELECT lang, source, o,
                   CAST(SUM(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
                   CAST(SUM(o) OVER (PARTITION BY source) AS BIGINT) AS c,
                   n, n_langs, n_sources
            FROM cells
            CROSS JOIN (SELECT CAST(SUM(o) AS BIGINT) AS n,
                               CAST(COUNT(DISTINCT lang) AS BIGINT)
                                   AS n_langs,
                               CAST(COUNT(DISTINCT source) AS BIGINT)
                                   AS n_sources
                        FROM cells) tot
        ),
        contrib AS (
            SELECT lang, source, o,
                   CAST(round(
                       ((o * n - r * c) / (1.0 * n))
                       * ((o * n - r * c) / (1.0 * r * c)) * 1000000)
                       AS BIGINT) AS contrib_micro,
                   n, n_langs, n_sources
            FROM marg
        )
        SELECT lang, source, n_obs, chi2_micro, dof FROM (
            SELECT '__total__' AS lang, '__total__' AS source,
                   n AS n_obs,
                   CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro,
                   CAST((n_langs - 1) * (n_sources - 1) AS BIGINT) AS dof,
                   0 AS pick
            FROM contrib
            GROUP BY n, n_langs, n_sources
            UNION ALL
            SELECT lang, source, o, contrib_micro, NULL, rk FROM (
                SELECT lang, source, o, contrib_micro,
                       ROW_NUMBER() OVER (ORDER BY contrib_micro DESC,
                                          lang, source) AS rk
                FROM contrib
            ) ranked WHERE rk <= {CHI2_TOP_CELLS}
        ) unioned
        ORDER BY pick, chi2_micro DESC, lang, source
    """


def profile_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of lang × source — see _chi2_body.

    Scale posture: one scan → the CHECKPOINTED (lang, source) cell
    aggregate (map-side combined, |langs|·|sources|-bounded — see
    _chi2_body's cells_from note); the marginal windows, 1-row total
    broadcast, the ranking window and the final sum all run over that
    bounded contingency relation — the same boundedness class as the
    PSI/KS monitors."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    def build():
        load_table(spark, sf_dir, "documents").createOrReplaceTempView(
            "chi2_docs_src"
        )
        return spark.sql(
            _chi2_body("chi2_docs_src", cells_from="__BODY__")
        )

    cells = cached_barrier_view(
        spark, sf_dir, "chi2_cells", build, tables=("documents",)
    )
    return spark.sql(_chi2_body("chi2_docs_src", cells_from=cells))


PROFILE_CHI2_INDEPENDENCE_SQL = _chi2_body("documents")


def _ht_body(engine: str) -> str:
    """Engine-shared Horvitz–Thompson estimation of the corpus token
    total from the PPS sample: each sampled doc contributes y_i/π_i
    with π_i = min(1, n_chars/{PPS_SCALE:.0f}) — the inverse-inclusion
    weighting that makes any unequal-probability sample unbiased, and
    the estimation-theory half the ``sample_weighted_pps`` draw needs
    to be USEFUL (an unweighted mean over a PPS sample is biased toward
    long docs). True total rides along so the report carries its own
    error.

    Exactness: selection is the established integer-space hash
    comparison; contributions floor(tokens·SCALE·1e6/n_chars) are ONE
    double expression over exact integers per row; sums are BIGINT."""
    if engine == "spark":
        h = ("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15),"
             " 16, 10) AS BIGINT)")
        ntok = "size(split(text, ' '))"
    else:
        h = _hash60_sql("doc_id")
        ntok = "len(string_split(text, ' '))"
    return f"""
        WITH pop AS (
            SELECT doc_id, n_chars,
                   CAST({ntok} AS BIGINT) AS toks,
                   CAST({h} AS DOUBLE) * {PPS_SCALE}
                       < CAST(n_chars AS DOUBLE) * {HASH_SPACE} AS picked
            FROM documents
        ),
        est AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_population,
                   CAST(SUM(CASE WHEN picked THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_sampled,
                   CAST(SUM(toks) AS BIGINT) AS true_total_tokens,
                   CAST(SUM(CASE WHEN picked THEN
                            CAST(floor(toks * {PPS_SCALE} * 1000000.0
                                       / (CASE WHEN n_chars
                                               >= {PPS_SCALE:.0f}
                                               THEN {PPS_SCALE:.0f}
                                               ELSE n_chars END))
                                 AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS ht_estimate_micro
            FROM pop
        )
        SELECT n_population, n_sampled, true_total_tokens,
               ht_estimate_micro,
               CAST(floor(abs(ht_estimate_micro / 1000000.0
                              - true_total_tokens) * 1000000.0
                          / true_total_tokens) AS BIGINT) AS error_ppm
        FROM est
    """


def sample_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HT token-total estimate from the PPS sample — see _ht_body. One
    scan, narrow per-row expressions, one 1-row aggregate: map-only at
    any scale (the same plan family as the samplers it audits)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_ht_body("spark"))


SAMPLE_HORVITZ_THOMPSON_SQL = _ht_body("duck")


def _dataset_diff_sql(engine: str) -> str:
    """Engine-shared dataset-version diff: v2 derives from v1 by the
    deterministic edit script every 13th doc's text is PERTURBED, every
    17th doc is DROPPED (drop wins on common multiples) and every 19th
    doc spawns a NEW id — then the diff is one doc-keyed FULL OUTER
    JOIN comparing content hashes,
    classified added/removed/changed/unchanged with per-class counts
    and char mass. This is the version-audit a dataset registry runs
    between releases (the read-side twin of sink_merge_upsert's write
    path); at 100 TB it is one co-partitioned join on the uniform doc
    key."""
    concat = "||" if engine != "spark" else "||"
    return f"""
        WITH v1 AS (
            SELECT doc_id, md5(text) AS h, n_chars FROM documents
        ),
        v2 AS (
            SELECT doc_id,
                   md5(CASE WHEN doc_id % 13 = 0
                            THEN text {concat} ' [edited]'
                            ELSE text END) AS h,
                   n_chars
            FROM documents
            WHERE doc_id % 17 != 0
            UNION ALL
            SELECT doc_id + 10000000, md5(text {concat} ' [new]'), n_chars
            FROM documents WHERE doc_id % 19 = 0
        ),
        classed AS (
            SELECT CASE
                     WHEN v1.doc_id IS NULL THEN 'added'
                     WHEN v2.doc_id IS NULL THEN 'removed'
                     WHEN v1.h != v2.h THEN 'changed'
                     ELSE 'unchanged'
                   END AS class,
                   COALESCE(v1.n_chars, v2.n_chars) AS n_chars
            FROM v1 FULL OUTER JOIN v2 ON v2.doc_id = v1.doc_id
        )
        SELECT class,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS char_mass
        FROM classed
        GROUP BY class
        ORDER BY class
    """


def profile_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-to-release dataset diff — see _dataset_diff_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_dataset_diff_sql("spark"))


PROFILE_DATASET_DIFF_SQL = _dataset_diff_sql("duck")


def _fk_integrity_sql() -> str:
    """Engine-shared referential-integrity audit across the star
    schema's FK edges (lineitem→orders, lineitem→supplier,
    orders→customer, customer→nation, supplier→nation,
    embeddings→documents): per edge the child rowcount, orphan count
    (children whose parent key is missing) and orphan ppm — the
    data-quality gate a warehouse runs after every load (the
    reference's at-least-once delivery makes dangling keys a real
    failure mode, not a hypothetical). Each edge is one LEFT ANTI
    aggregate on the join key; identical SQL in both engines."""
    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("embeddings->documents", "embeddings", "vec_id",
         "documents", "doc_id"),
    ]
    selects = []
    for name, child, ck, parent, pk in edges:
        selects.append(f"""
            SELECT '{name}' AS fk_edge,
                   CAST(COUNT(*) AS BIGINT) AS n_children,
                   CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_orphans,
                   CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END)
                        * 1000000 {{intdiv}} COUNT(*) AS BIGINT)
                       AS orphan_ppm
            FROM {child} c
            LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
              ON p.{pk} = c.{ck}
        """)
    return " UNION ALL ".join(selects) + " ORDER BY fk_edge"


def profile_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema FK orphan audit — see _fk_integrity_sql. Six
    co-partitionable key joins (parents distinct-projected first —
    broadcast-sized dims at any scale except orders, which shares the
    fact's own key distribution)."""
    for t in ("lineitem", "orders", "supplier", "customer", "nation",
              "documents", "embeddings"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_fk_integrity_sql().replace("{intdiv}", "DIV"))


PROFILE_FK_INTEGRITY_SQL = _fk_integrity_sql().replace("{intdiv}", "//")


KFOLD_K = 5


def _group_kfold_body(engine: str) -> str:
    """Leakage-safe k-fold assignment: the fold is a deterministic hash
    of the GROUP key (source), so every doc of a source lands in the
    same fold — near-duplicates within a provider can never straddle a
    train/validation boundary (the group-k-fold rule sklearn users
    expect, here as one aggregate). The report carries the in-band
    leak proof (max folds touched by any source == 1) and the
    imbalance vs the ideal 1/k split in exact ppm."""
    if engine == "spark":
        h = ("pmod(CAST(conv(substring(md5(source), 1, 15), 16, 10)"
             f" AS BIGINT), {KFOLD_K})")
        toks = "size(regexp_extract_all(text, '[a-z0-9]+', 0))"
    else:
        h = ("CAST(('0x' || substr(md5(source), 1, 15)) AS BIGINT)"
             f" % {KFOLD_K}")
        toks = "len(regexp_extract_all(text, '[a-z0-9]+'))"
    return f"""
        WITH assigned AS (
            SELECT doc_id, source, CAST({h} AS BIGINT) AS fold,
                   CAST({toks} AS BIGINT) AS n_toks
            FROM documents
        ),
        src_spread AS (
            SELECT source, CAST(COUNT(DISTINCT fold) AS BIGINT) AS nf
            FROM assigned GROUP BY source
        ),
        leak AS (
            SELECT CAST(MAX(nf) AS BIGINT) AS max_folds_per_source
            FROM src_spread
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM assigned
        )
        SELECT a.fold,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(a.n_toks) AS BIGINT) AS sum_tokens,
               CAST(COUNT(DISTINCT a.source) AS BIGINT) AS n_sources,
               -- floor() is explicit: DuckDB CAST(double AS BIGINT)
               -- rounds where Spark truncates
               CAST(floor(COUNT(*) * {KFOLD_K} * 1000000e0 / t.n)
                    AS BIGINT) - 1000000 AS imbalance_ppm,
               l.max_folds_per_source
        FROM assigned a CROSS JOIN tot t CROSS JOIN leak l
        GROUP BY a.fold, t.n, l.max_folds_per_source
        ORDER BY a.fold
    """


def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped {KFOLD_K}-fold split by source with the in-band leakage
    proof — see _group_kfold_body. Completes the split tier:
    sample_split_summary (row-hash folds) leaks near-duplicates across
    folds when a provider ships them; grouping by source is the
    standard fix.

    Scale posture: one documents scan (map-side combined aggregates);
    the source-spread audit runs on the |sources| relation; no windows."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_group_kfold_body("spark"))


SAMPLE_GROUP_KFOLD_SQL = _group_kfold_body("duck")


# ---------------------------------------------------------------------------
# profile_mutual_information — MI / NMI between two categorical columns
# ---------------------------------------------------------------------------


def _mi_body() -> str:
    """Mutual information and normalized MI (NMI = MI / min(H_a, H_b))
    between market segment and nation over customers — the
    dependence-strength profiler that, unlike chi²/Cramér's V
    (profile_chi2_independence / agg_cramers_v), is comparable across
    tables and feeds feature-selection pipelines directly.

    Exactness: MI = Σ_ij (c_ij/N)·ln(c_ij·N / (r_i·c_j)); each ln() is
    evaluated ONCE per contingency cell on an exact integer ratio and
    immediately rounded to micro-nats (the corpusops ln-ppm
    discipline: correctly-rounded libm on both engines, then exact
    BIGINT weighted sums — shuffle order never matters). Entropies use
    the same per-margin lnppm, counted once per margin via a
    row_number guard. Empty cells never appear (GROUP BY emits only
    observed pairs; 0·ln0 = 0 by convention).

    Scale posture: one scan → the |segments|×|nations| contingency
    aggregate; margins/N come from windows OVER that ≤125-row relation
    (whitelisted bound), then one final 1-row aggregate.

    Engine-shared body: valid verbatim in Spark SQL and DuckDB."""
    return """
        WITH cells AS (
            SELECT c_mktsegment AS a, c_nationkey AS b,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM customer
            GROUP BY 1, 2
        ),
        enriched AS (
            SELECT a, b, c,
                   SUM(c) OVER (PARTITION BY a) AS ra,
                   SUM(c) OVER (PARTITION BY b) AS cb,
                   SUM(c) OVER () AS n,
                   ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY b ORDER BY a) AS rn_b
            FROM cells
        ),
        terms AS (
            SELECT n,
                   c * CAST(round(ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                                     / (CAST(ra AS DOUBLE)
                                        * CAST(cb AS DOUBLE))) * 1000000)
                            AS BIGINT) AS mi_w,
                   CASE WHEN rn_a = 1 THEN
                       ra * CAST(round(ln(CAST(ra AS DOUBLE)
                                          / CAST(n AS DOUBLE)) * 1000000)
                                 AS BIGINT) ELSE 0 END AS ha_w,
                   CASE WHEN rn_b = 1 THEN
                       cb * CAST(round(ln(CAST(cb AS DOUBLE)
                                          / CAST(n AS DOUBLE)) * 1000000)
                                 AS BIGINT) ELSE 0 END AS hb_w
            FROM enriched
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
               CAST(floor(SUM(mi_w) * 1.0 / MAX(n)) AS BIGINT)
                   AS mi_micro_nats,
               CAST(floor(-SUM(ha_w) * 1.0 / MAX(n)) AS BIGINT)
                   AS h_segment_micro,
               CAST(floor(-SUM(hb_w) * 1.0 / MAX(n)) AS BIGINT)
                   AS h_nation_micro,
               CASE WHEN -SUM(ha_w) <= 0 OR -SUM(hb_w) <= 0 THEN NULL
                    ELSE CAST(floor(SUM(mi_w) * 1000000.0 /
                              (CASE WHEN -SUM(ha_w) < -SUM(hb_w)
                                    THEN -SUM(ha_w) ELSE -SUM(hb_w) END))
                         AS BIGINT) END AS nmi_ppm
        FROM terms
    """


def profile_mutual_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MI / NMI dependence profile — see _mi_body."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer"
    )
    return spark.sql(_mi_body())


PROFILE_MUTUAL_INFORMATION_SQL = _mi_body()


# ---------------------------------------------------------------------------
# sample_timeseries_cv — rolling-origin (expanding-window) CV splits
# ---------------------------------------------------------------------------

_TSCV_FOLDS = 4


def _tscv_body(engine: str) -> str:
    """Rolling-origin cross-validation splits over event time (the
    time-series CV sklearn's TimeSeriesSplit implements — random
    k-fold leaks the future into training): the day range is cut into
    {_TSCV_FOLDS + 1} equal spans; fold f trains on everything before
    cutoff f and tests on the next span. The report carries the
    leakage accounting a forecasting pipeline audits: per fold, train
    and test day/event counts plus how many TEST users were already
    seen in training (user overlap is expected and quantified — the
    cold-start share is its complement).

    Exactness: cutoffs are pure integer floor divisions of the span;
    every count is exact (two-level aggregate for the per-user overlap
    flags).

    Scale posture: the fold table is {_TSCV_FOLDS} literal rows joined
    broadcast; per-(fold, user) flags aggregate map-side before the
    {_TSCV_FOLDS}-row report. The operator is inherently multi-pass
    (a user-level distinct AND an event-level count over different
    groupings); each pass is one uniform-keyed aggregate."""
    folds = ", ".join(f"({f})" for f in range(1, _TSCV_FOLDS + 1))
    if engine == "spark":
        ev_days = ("SELECT user_id, CAST(floor(unix_micros(CAST(ts AS"
                   " TIMESTAMP)) / 86400000000.0) AS BIGINT) AS day_idx"
                   " FROM events")
    else:
        ev_days = ("SELECT user_id, CAST(floor(CAST(epoch_us(ts) AS"
                   " BIGINT) / 86400000000.0) AS BIGINT) AS day_idx"
                   " FROM events")
    return f"""
        WITH ev AS ({ev_days}),
        ud AS (SELECT DISTINCT user_id, day_idx FROM ev),
        span AS (SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi,
                        MAX(day_idx) - MIN(day_idx) + 1 AS nd
                 FROM ud),
        folds AS (
            -- explicit floor: nd and f are nonnegative, but `/` is
            -- double division in both engines and CAST(double) rounds
            -- in DuckDB where Spark truncates
            SELECT f.f,
                   CAST(s.lo + floor((s.nd * f.f) * 1.0
                                     / ({_TSCV_FOLDS} + 1))
                        AS BIGINT) AS cutoff,
                   CAST(s.lo + floor((s.nd * (f.f + 1)) * 1.0
                                     / ({_TSCV_FOLDS} + 1))
                        AS BIGINT) AS test_end
            FROM (VALUES {folds}) AS f(f) CROSS JOIN span s
        ),
        flags AS (
            SELECT fo.f, u.user_id,
                   MAX(CASE WHEN u.day_idx < fo.cutoff THEN 1 ELSE 0
                       END) AS in_train,
                   MAX(CASE WHEN u.day_idx >= fo.cutoff
                             AND u.day_idx < fo.test_end THEN 1 ELSE 0
                       END) AS in_test
            FROM ud u CROSS JOIN folds fo
            GROUP BY fo.f, u.user_id
        ),
        users AS (
            SELECT f,
                   CAST(SUM(in_train) AS BIGINT) AS n_train_users,
                   CAST(SUM(in_test) AS BIGINT) AS n_test_users,
                   CAST(SUM(in_train * in_test) AS BIGINT)
                       AS n_overlap_users
            FROM flags GROUP BY f
        ),
        ev_counts AS (
            SELECT fo.f,
                   CAST(SUM(CASE WHEN e.day_idx < fo.cutoff THEN 1
                            ELSE 0 END) AS BIGINT) AS n_train_events,
                   CAST(SUM(CASE WHEN e.day_idx >= fo.cutoff
                             AND e.day_idx < fo.test_end THEN 1 ELSE 0
                            END) AS BIGINT) AS n_test_events
            FROM ev e CROSS JOIN folds fo
            GROUP BY fo.f
        )
        SELECT u.f AS fold,
               fo.cutoff, fo.test_end,
               c.n_train_events, c.n_test_events,
               u.n_train_users, u.n_test_users, u.n_overlap_users,
               CASE WHEN u.n_test_users = 0 THEN NULL
                    ELSE CAST(floor(u.n_overlap_users * 1000000.0
                                    / u.n_test_users) AS BIGINT)
               END AS warm_start_ppm
        FROM users u
        JOIN folds fo ON fo.f = u.f
        JOIN ev_counts c ON c.f = u.f
        ORDER BY fold
    """


def sample_timeseries_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin CV splits — see _tscv_body."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_tscv_body("spark"))


SAMPLE_TIMESERIES_CV_SQL = _tscv_body("duck")


# ---------------------------------------------------------------------------
# sample_downsample_head_heavy — cap head users at the p95 activity level
# ---------------------------------------------------------------------------


def _head_cap_body(engine: str) -> str:
    """Head-user downsampling: cap every user's event contribution at
    the p95 of the per-user activity distribution, keeping a
    DETERMINISTIC hash-spread sample of the capped users' events (an
    unbiased within-user subset, not the earliest ids) — the
    anti-dominance pass a behavioral-training pipeline runs so a few
    bot-grade users can't own the corpus.

    Exactness: the p95 cap comes from the per-user-count VALUE GRID
    (smallest count c with cum_users·1e6 ≥ 950000·n_users — integer
    cross-multiplication); the kept-set is a ROW_NUMBER under the
    multiplicative-spread rank; the report is exact integers.

    Scale posture: one scan → per-user counts (uniform shuffle); the
    cap derives from the count-value grid (bounded by max activity,
    not user count); the keep-rank window is (user)-partitioned; the
    report is a |types|-row aggregate."""
    del engine  # identical on both sides
    return """
        WITH pu AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id
        ),
        grid AS (
            SELECT cnt, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM pu GROUP BY cnt
        ),
        cum AS (
            SELECT cnt,
                   CAST(SUM(n_users) OVER (ORDER BY cnt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cu,
                   CAST(SUM(n_users) OVER () AS BIGINT) AS nu
            FROM grid
        ),
        cap AS (
            SELECT CAST(MIN(cnt) AS BIGINT) AS cap
            FROM cum WHERE cu * 1000000 >= 950000 * nu
        ),
        ranked AS (
            SELECT e.event_type, e.user_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.user_id
                       ORDER BY (e.event_id * 2654435761) % 1000000007,
                                e.event_id) AS rn
            FROM events e
        )
        SELECT r.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_before,
               CAST(SUM(CASE WHEN r.rn <= c.cap THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_after,
               CAST(floor((COUNT(*) - SUM(CASE WHEN r.rn <= c.cap THEN 1
                                          ELSE 0 END)) * 1000000.0
                          / COUNT(*)) AS BIGINT) AS removed_ppm,
               CAST(MAX(c.cap) AS BIGINT) AS cap_events_per_user
        FROM ranked r CROSS JOIN cap c
        GROUP BY r.event_type
        ORDER BY r.event_type
    """


def sample_downsample_head_heavy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """p95 head-user cap — see _head_cap_body."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_head_cap_body("spark"))


SAMPLE_DOWNSAMPLE_HEAD_HEAVY_SQL = _head_cap_body("duck")


# ---------------------------------------------------------------------------
# sample_ess_importance — effective sample size of importance weights
# ---------------------------------------------------------------------------

ESS_CLIP = 64   # weight cap for the clipped variant (tokens per doc)


def _ess_body(engine: str) -> str:
    """Kish effective-sample-size diagnostic for importance-weighted
    corpora — the number every reweighting scheme (DSIR, temperature
    mixing, domain up-sampling) must report before training trusts the
    weights: ESS = (Σw)²/Σw², and ESS/n ≪ 1 means a few heavy
    documents dominate the gradient. Weights here are the per-doc token
    counts (the length-proportional weighting packing pipelines
    implicitly apply); the CLIPPED twin caps w at {ESS_CLIP} — the
    standard variance/bias trade — and the report quantifies what the
    cap buys (ESS recovered) and costs (weight mass truncated), per
    source and corpus-wide (ROLLUP).

    Exactness: token counts are exact ints, Σw and Σw² exact BIGINTs,
    every reported ratio one floor(·1e6) cross-multiplication. Scale
    posture: one documents scan → map-side-combined per-source sums;
    the rollup adds one tiny re-aggregate."""
    toks = (
        "size(regexp_extract_all(text, '[a-z0-9]+', 0))"
        if engine == "spark"
        else "len(regexp_extract_all(text, '[a-z0-9]+'))"
    )
    return f"""
        WITH w AS (
            SELECT source, CAST({toks} AS BIGINT) AS w
            FROM documents
        ),
        c AS (
            SELECT source, w,
                   CASE WHEN w > {ESS_CLIP} THEN {ESS_CLIP} ELSE w END
                       AS wc
            FROM w WHERE w > 0
        ),
        g AS (
            SELECT COALESCE(source, '__total__') AS source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(w) AS BIGINT) AS sum_w,
                   CAST(SUM(w * w) AS BIGINT) AS sum_w2,
                   CAST(SUM(wc) AS BIGINT) AS sum_wc,
                   CAST(SUM(wc * wc) AS BIGINT) AS sum_wc2,
                   CAST(SUM(CASE WHEN w > {ESS_CLIP} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_clipped
            FROM c GROUP BY ROLLUP(source)
        )
        -- doubles BEFORE the squares: sum_w2 is exact BIGINT, but the
        -- ppm numerators square corpus-scale sums (overflow at ~3e9
        -- total tokens); identical double expressions in both engines
        SELECT source, n_docs, n_clipped,
               CAST(floor(CAST(sum_w AS DOUBLE) * sum_w * 1000000.0
                          / (CAST(n_docs AS DOUBLE) * sum_w2))
                    AS BIGINT) AS ess_frac_ppm,
               CAST(floor(CAST(sum_wc AS DOUBLE) * sum_wc * 1000000.0
                          / (CAST(n_docs AS DOUBLE) * sum_wc2))
                    AS BIGINT) AS ess_clipped_frac_ppm,
               CAST(floor((sum_w - sum_wc) * 1000000.0 / sum_w)
                    AS BIGINT) AS mass_truncated_ppm
        FROM g
        ORDER BY source
    """


def sample_ess_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weight ESS diagnostic — see _ess_body."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_ess_body("spark"))


SAMPLE_ESS_IMPORTANCE_SQL = _ess_body("duck")


QUERIES: dict[str, tuple] = {
    "sample_ess_importance": (
        sample_ess_importance,
        SAMPLE_ESS_IMPORTANCE_SQL,
    ),
    "sample_downsample_head_heavy": (
        sample_downsample_head_heavy,
        SAMPLE_DOWNSAMPLE_HEAD_HEAVY_SQL,
    ),
    "sample_timeseries_cv": (
        sample_timeseries_cv,
        SAMPLE_TIMESERIES_CV_SQL,
    ),
    "profile_mutual_information": (
        profile_mutual_information,
        PROFILE_MUTUAL_INFORMATION_SQL,
    ),
    "sample_group_kfold": (sample_group_kfold, SAMPLE_GROUP_KFOLD_SQL),
    "profile_fk_integrity": (profile_fk_integrity, PROFILE_FK_INTEGRITY_SQL),
    "profile_dataset_diff": (profile_dataset_diff, PROFILE_DATASET_DIFF_SQL),
    "sample_horvitz_thompson": (
        sample_horvitz_thompson,
        SAMPLE_HORVITZ_THOMPSON_SQL,
    ),
    "profile_chi2_independence": (
        profile_chi2_independence,
        PROFILE_CHI2_INDEPENDENCE_SQL,
    ),
    "sample_systematic_interval": (
        sample_systematic_interval,
        SAMPLE_SYSTEMATIC_INTERVAL_SQL,
    ),
    "sample_neyman_allocation": (
        sample_neyman_allocation,
        SAMPLE_NEYMAN_ALLOCATION_SQL,
    ),
    "profile_skew_report": (profile_skew_report, PROFILE_SKEW_REPORT_SQL),
    "domain_budget_waterfill": (
        domain_budget_waterfill,
        DOMAIN_BUDGET_WATERFILL_SQL,
    ),
    "sample_bootstrap_ci": (sample_bootstrap_ci, SAMPLE_BOOTSTRAP_CI_SQL),
    "sample_hash_bernoulli": (sample_hash_bernoulli, SAMPLE_HASH_BERNOULLI_SQL),
    "sample_stratified": (sample_stratified, SAMPLE_STRATIFIED_SQL),
    "domain_mix_sampler": (domain_mix_sampler, DOMAIN_MIX_SAMPLER_SQL),
    "sample_split_summary": (sample_split_summary, SAMPLE_SPLIT_SUMMARY_SQL),
    "sample_per_group_topk": (sample_per_group_topk, SAMPLE_PER_GROUP_TOPK_SQL),
    "sample_weighted_pps": (sample_weighted_pps, SAMPLE_WEIGHTED_PPS_SQL),
    "sample_reservoir_weighted": (
        sample_reservoir_weighted,
        SAMPLE_RESERVOIR_WEIGHTED_SQL,
    ),
    "sample_temperature_mix": (
        sample_temperature_mix,
        SAMPLE_TEMPERATURE_MIX_SQL,
    ),
    "sample_class_balance": (sample_class_balance, SAMPLE_CLASS_BALANCE_SQL),
    "profile_column_stats": (profile_column_stats, PROFILE_COLUMN_STATS_SQL),
    "profile_replication_checksum": (
        profile_replication_checksum,
        PROFILE_REPLICATION_CHECKSUM_SQL,
    ),
}
