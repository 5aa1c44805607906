"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (language ID, quality scoring, token
counting, fingerprinting, exact dedup). All pure column expressions
(JVM-side, codegen'd); shuffles only where aggregation demands it.

Scale posture: every per-document computation here is a narrow map —
at 100 TB these stream through executors with zero exchange; only the
groupBys (wordcount, lang stats, dedup) shuffle, each on a key with
bounded cardinality (vocab / lang / content-hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.config import TUNING
from mongo_to_clickhouse_spark.io import load_table

# Marker-token profiles for the language-ID heuristic: hit counts per
# profile are the unigram analogue of n-gram language profiles
# (Cavnar-Trenkle); deterministic and oracle-mirrorable.
LANG_MARKERS = {
    "query_heavy": ("query", "filter", "join", "scan"),
    "storage_heavy": ("table", "column", "row", "key"),
    "stream_heavy": ("stream", "window", "batch", "spark"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _tokens(col):
    return F.split(col, " ")


def text_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenize + explode + count — the classic wordcount.
    Map-side partial aggregation bounds the shuffle by vocabulary size."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


TEXT_TOKENIZE_WORDCOUNT_SQL = """
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
"""


def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum(F.col("n_chars").cast("decimal(18,2)")) / F.count("*"), 4)
        .cast("double")
        .alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


TEXT_LANG_STATS_SQL = """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           round(SUM(CAST(n_chars AS DECIMAL(18,2))) / COUNT(*), 4) AS avg_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
"""


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish regex word
    pieces (``[a-z0-9]+``) — the pretraining-pipeline token accounting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)).alias(
            "re_tokens"
        ),
    )


TEXT_TOKEN_COUNT_SQL = """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+', 0)) AS INTEGER) AS re_tokens
    FROM documents
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: token count, mean token length,
    stopword ratio, lexical diversity — the standard cheap pretraining
    filters (C4/Gopher-style rules on fixture-appropriate features)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    distinct_n = F.size(F.array_distinct(toks))
    mean_len = (F.length(F.col("text")) - (n - 1)) / n  # chars minus spaces
    stop_ratio = stop_hits / n
    diversity = distinct_n / n
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(diversity, 4).alias("lexical_diversity"),
        (
            (n >= 10) & (stop_ratio < 0.5) & (diversity > 0.2)
        ).alias("passes_quality"),
    )


TEXT_QUALITY_SCORE_SQL = f"""
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           round(mean_token_len, 4) AS mean_token_len,
           round(stop_ratio, 4) AS stopword_ratio,
           round(diversity, 4) AS lexical_diversity,
           (n_tokens >= 10 AND stop_ratio < 0.5 AND diversity > 0.2)
               AS passes_quality
    FROM (
        SELECT doc_id,
               len(toks) AS n_tokens,
               (length(text) - (len(toks) - 1)) / len(toks) AS mean_token_len,
               len(list_filter(toks, t -> t IN {STOPWORDS!r}))::DOUBLE / len(toks)
                   AS stop_ratio,
               len(list_distinct(toks))::DOUBLE / len(toks) AS diversity
        FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
    )
"""


def _flesch_sql(engine: str) -> str:
    """Flesch reading-ease from integer text counts: words (whitespace
    tokens), sentences (period runs, min 1), syllables approximated as
    vowel GROUPS (the standard cheap proxy). score = 206.835 −
    1.015·(W/S) − 84.6·(Syl/W); all three counts are exact integers and
    the score is one double expression (identical text both engines),
    rounded 4 dp. The readability band rides along as the categorical
    most consumers want."""
    if engine == "spark":
        words = "size(split(text, ' '))"
        sents = "greatest(regexp_count(text, '\\\\.') , 1)"
        syls = "greatest(regexp_count(lower(text), '[aeiou]+'), 1)"
    else:
        words = "len(string_split(text, ' '))"
        sents = "greatest(len(regexp_extract_all(text, '\\.')), 1)"
        syls = ("greatest(len(regexp_extract_all(lower(text),"
                " '[aeiou]+')), 1)")
    score = (
        "206.835 - 1.015 * (w / CAST(s AS DOUBLE))"
        " - 84.6 * (y / CAST(w AS DOUBLE))"
    )
    return f"""
        WITH counts AS (
            SELECT doc_id,
                   CAST({words} AS BIGINT) AS w,
                   CAST({sents} AS BIGINT) AS s,
                   CAST({syls} AS BIGINT) AS y
            FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
               round({score}, 4) AS flesch,
               CASE WHEN {score} >= 60 THEN 'easy'
                    WHEN {score} >= 30 THEN 'moderate'
                    ELSE 'hard' END AS band
        FROM counts ORDER BY doc_id
    """


def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring — see _flesch_sql. A pure narrow map
    (regex counts fuse into the scan); the readability tier of the cheap
    quality filters."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_flesch_sql("spark"))


TEXT_READABILITY_FLESCH_SQL = _flesch_sql("duck")


def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by marker-token profile scoring (unigram profile hits,
    argmax with deterministic tiebreak) — the n-gram-profile classifier
    shape on the fixture's synthetic vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    def _hits(markers):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = [
        _hits(markers).alias(f"s_{name}") for name, markers in LANG_MARKERS.items()
    ]
    scored = docs.select("doc_id", "lang", *scores)
    names = list(LANG_MARKERS)
    # argmax with name-order tiebreak: greatest(structs) trick
    best = F.greatest(
        *[
            F.struct(
                F.col(f"s_{n}").alias("score"),
                # invert name rank so ties resolve to the FIRST profile
                F.lit(len(names) - i).alias("rank"),
                F.lit(n).alias("name"),
            )
            for i, n in enumerate(names)
        ]
    )
    return scored.select(
        "doc_id",
        "lang",
        *[F.col(f"s_{n}") for n in names],
        best["name"].alias("predicted_profile"),
    )


_SCORE_SQL = ",\n               ".join(
    f"CAST(len(list_filter(toks, t -> t IN {markers!r})) AS INTEGER) AS s_{name}"
    for name, markers in LANG_MARKERS.items()
)
_NAMES = list(LANG_MARKERS)
_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN s_{n} >= greatest({', '.join('s_' + m for m in _NAMES)}) THEN '{n}'"
        for n in _NAMES
    )
    + " END"
)

TEXT_LANGID_NGRAM_SQL = f"""
    SELECT doc_id, lang, {', '.join('s_' + n for n in _NAMES)},
           {_CASE_SQL} AS predicted_profile
    FROM (
        SELECT doc_id, lang,
               {_SCORE_SQL}
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
    )
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted distinct token
    set — order/duplication-insensitive content identity (the cheap
    fingerprint tier below MinHash)."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens(F.col("text")))))
    return docs.select("doc_id", F.md5(canon).alias("fingerprint"))


TEXT_FINGERPRINT_SQL = """
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fingerprint
    FROM documents
"""


def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: groupBy(sha256(text)) keeping the
    smallest doc_id (deterministic keeper) + duplicate count. One shuffle
    on the hash — uniformly distributed, skew-free at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.sha2(F.col("text"), 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


DEDUP_EXACT_HASH_SQL = """
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY sha256(text)
"""


def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency: top-50 word bigrams (n-gram LM statistics /
    collocation mining). zip_with of the token array against its own tail
    builds bigrams without a self-join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(50)
    )


TEXT_NGRAM_FREQ_SQL = """
    SELECT bigram, COUNT(*) AS n FROM (
        SELECT unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM (SELECT string_split(text, ' ') AS toks FROM documents)
    )
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
"""


def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the token array: transform,
    filter, aggregate (fold), sort, distinct — the Catalyst-native array
    surface (no UDFs)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
        F.element_at(F.array_sort(F.array_distinct(toks)), 1).alias("first_token"),
        F.array_max(F.transform(toks, lambda t: F.length(t))).alias("max_token_len"),
    )


SCALAR_ARRAY_OPS_SQL = """
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_toks,
           CAST(len(list_filter(toks, t -> length(t) > 4)) AS INTEGER) AS n_long,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS INT)
               AS total_chars,
           list_sort(list_distinct(toks))[1] AS first_token,
           CAST(list_max(list_transform(toks, t -> length(t))) AS INT)
               AS max_token_len
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""


# ---------------------------------------------------------------------------
# BM25 retrieval (query-by-document top-k)
# ---------------------------------------------------------------------------

BM25_QUERY_DOC = 42   # query = the distinct terms of this document
BM25_TOPK = 10
BM25_K1 = "CAST(1.2 AS DOUBLE)"
BM25_B = "CAST(0.75 AS DOUBLE)"


def _bm25_sql(dialect: str, toks_src: str | None = None) -> str:
    """Okapi BM25 (Lucene idf variant) scored in integer micro-units.

    Float discipline (see PARITY_r02.md): avgdl is built from exact
    integer SUM/COUNT with ONE final division; each (doc, term) partial
    score is rounded to micro-units immediately, and only exact BIGINTs
    are summed — no cross-engine float-aggregation-order dependence.
    Constants are CAST to DOUBLE because bare ``0.5`` parses as DECIMAL
    in both dialects and decimal promotion rules differ.

    Plan diet (round 5): EVERYTHING derives from the single ``tf``
    relation — each posting carries dl = SUM(tf) OVER doc (identical to
    size(toks): split always yields ≥1 element, so no doc drops out —
    the Lucene-norms shape, doc length stored with the posting, so
    scoring needs no per-doc join), df is COUNT(*) per term, the
    query-term set is tf's rows for the query doc (tf is already
    distinct per (doc, term)), and the corpus stats fold over the
    distinct (doc, dl) pairs. Round 4 re-derived dl/dfreq/stats/qterms
    from separate passes over the token barrier — 21 exchanges for a
    textbook scoring query (round-4 verdict item); deriving from tf
    (checkpoint-memoized on the Spark side, exactly the inverted-index
    materialization a production retrieval stack builds once) cuts the
    plan to 8 true shuffles. df is pre-joined to the query terms so the
    per-term df lookup broadcasts (query-bounded), never vocab-sized."""
    if dialect == "spark":
        # the checkpointed inverted index already carries dl per posting
        # (the Lucene-norms shape — length stored alongside the posting),
        # so scoring needs NO per-doc join at all
        tf_cte = (
            f"SELECT doc_id, term, tf, dl FROM {toks_src}"
            if toks_src
            else "SELECT doc_id, term, tf, SUM(tf) OVER (PARTITION BY"
                 " doc_id) AS dl FROM (SELECT doc_id, term, COUNT(*) AS tf"
                 " FROM (SELECT doc_id, explode(split(text, ' ')) AS term"
                 " FROM documents) GROUP BY doc_id, term)"
        )
    else:
        tf_cte = (
            "SELECT doc_id, term, tf, SUM(tf) OVER (PARTITION BY doc_id)"
            " AS dl FROM (SELECT doc_id, term, COUNT(*) AS tf FROM"
            " (SELECT doc_id, unnest(string_split(text, ' ')) AS term"
            " FROM documents) GROUP BY doc_id, term)"
        )
    half = "CAST(0.5 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    # Global top-k: ORDER BY + LIMIT, which Spark plans as
    # TakeOrderedAndProject (per-partition bounded heaps + driver merge of
    # k-row heads) — NOT a no-partition ROW_NUMBER window, which would
    # serialize every per-doc total through one task at corpus scale. The
    # rank column is then a window over the k surviving rows (k=10).
    topk = f"""topk AS (
            SELECT doc_id, score_micro FROM totals
            ORDER BY score_micro DESC, doc_id
            LIMIT {BM25_TOPK}
        )"""
    if dialect == "spark":
        # rank the k=10 survivors via a triangular self-join (count of
        # strictly-better rows + 1) — zero WindowExec in the whole plan,
        # so the no-partition-window log grep stays a real scale signal
        rank_select = f"""
        SELECT t.doc_id, CAST(t.score_micro AS BIGINT) AS score_micro,
               CAST(1 + COUNT(u.doc_id) AS INTEGER) AS rank
        FROM topk t LEFT JOIN topk u
          ON u.score_micro > t.score_micro
             OR (u.score_micro = t.score_micro AND u.doc_id < t.doc_id)
        GROUP BY t.doc_id, t.score_micro"""
    else:
        rank_select = """
        SELECT doc_id, CAST(score_micro AS BIGINT) AS score_micro,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank
        FROM topk"""
    return f"""
        WITH tf AS ({tf_cte}),
        stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
            FROM (SELECT doc_id, MAX(dl) AS dl FROM tf GROUP BY doc_id)
        ),
        qdf AS (
            SELECT tf.term, COUNT(*) AS df
            FROM tf
            JOIN (SELECT term FROM tf WHERE doc_id = {BM25_QUERY_DOC}) q
              ON tf.term = q.term
            GROUP BY tf.term
        ),
        scored AS (
            SELECT tf.doc_id,
                   CAST(round(1000000 * (
                       ln((s.n_docs - qdf.df + {half})
                          / (qdf.df + {half}) + {one})
                       * (tf.tf * ({BM25_K1} + {one}))
                       / (tf.tf + {BM25_K1} * ({one} - {BM25_B}
                                               + {BM25_B} * tf.dl / s.avgdl))
                   )) AS BIGINT) AS term_score_micro
            FROM tf
            JOIN qdf ON qdf.term = tf.term
            CROSS JOIN stats s
        ),
        totals AS (
            SELECT doc_id, SUM(term_score_micro) AS score_micro
            FROM scored GROUP BY doc_id
        ),
        {topk}
        {rank_select}
        ORDER BY rank
    """


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval, query-by-document: score every document
    against the distinct terms of doc 42 and return the 10 best. (On this
    tiny shared vocabulary the query's terms hit most documents, so the
    winners are high-tf long documents, not necessarily doc 42 itself.)

    Scale posture: the (doc_id, term, tf) relation — the inverted index
    a production retrieval stack materializes ONCE — is built with a
    single exploded-token shuffle and checkpoint-memoized per (session,
    sf_dir); dl, df, the query-term set, and the corpus stats all fold
    over it (see _bm25_sql). The per-term df lookup is query-bounded and
    broadcasts; scoring is an equi-join on term + one partial-aggregated
    SUM per doc; the global top-k is TakeOrderedAndProject-class. This
    is the sparse-retrieval sibling of sim_cosine_topk for training-data
    curation (quality-biased sampling, decontamination lookups)."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )
    from mongo_to_clickhouse_spark.queries.corpusops import _toks_view

    toks = _toks_view(spark, sf_dir)

    def build():
        return spark.sql(
            f"SELECT doc_id, term, tf, SUM(tf) OVER (PARTITION BY doc_id)"
            f" AS dl FROM (SELECT doc_id, term, COUNT(*) AS tf FROM"
            f" (SELECT doc_id, explode(toks) AS term FROM {toks})"
            f" GROUP BY doc_id, term)"
        )

    tf_view = cached_barrier_view(spark, sf_dir, "bm25_tf", build)
    return spark.sql(_bm25_sql("spark", toks_src=tf_view))


TEXT_BM25_TOPK_SQL = _bm25_sql("duck")


FEATURE_HASH_DIM = TUNING.feature_hash_dim  # signed-hashing feature space


def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (HashingTF with signed buckets): every token is
    folded into a fixed {FEATURE_HASH_DIM}-dim feature space via
    bucket = h % D with sign = parity of the next hash bit — the
    unbounded-vocabulary text→vector bridge every large-scale pipeline
    uses because it needs NO vocabulary pass and no dictionary state.

    Output is the sparse form (doc_id, bucket, weight≠0). Scale shape:
    one explode of the corpus (from the memoized token barrier) and one
    partial-aggregated groupBy keyed by (doc_id, bucket) — uniform keys,
    map-side combine, nothing vocabulary-sized anywhere."""
    from mongo_to_clickhouse_spark.queries.corpusops import _toks_view

    view = _toks_view(spark, sf_dir)
    d = FEATURE_HASH_DIM
    return spark.sql(f"""
        WITH h AS (
            SELECT doc_id,
                   CAST(conv(substring(md5(tok), 1, 15), 16, 10)
                        AS BIGINT) AS h
            FROM (SELECT doc_id, explode(toks) AS tok FROM {view})
        )
        SELECT doc_id, h % {d} AS bucket,
               CAST(SUM(CASE WHEN (h DIV {d}) % 2 = 0
                             THEN 1 ELSE -1 END) AS BIGINT) AS weight
        FROM h
        GROUP BY doc_id, h % {d}
        HAVING SUM(CASE WHEN (h DIV {d}) % 2 = 0 THEN 1 ELSE -1 END) != 0
        ORDER BY doc_id, bucket
    """)


TEXT_FEATURE_HASHING_SQL = f"""
    WITH h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
    )
    SELECT doc_id, h % {FEATURE_HASH_DIM} AS bucket,
           CAST(SUM(CASE WHEN (h // {FEATURE_HASH_DIM}) % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS weight
    FROM h
    GROUP BY doc_id, h % {FEATURE_HASH_DIM}
    HAVING SUM(CASE WHEN (h // {FEATURE_HASH_DIM}) % 2 = 0
                    THEN 1 ELSE -1 END) != 0
    ORDER BY doc_id, bucket
"""


# ---------------------------------------------------------------------------
# text_cdc_chunking — content-defined chunking (rolling-hash boundaries)
# ---------------------------------------------------------------------------

CDC_WINDOW = 8      # rolling-hash window (chars)
CDC_BASE = 31       # polynomial base
CDC_DIVISOR = 64    # boundary when hash % divisor == 0 (~64-char chunks)
CDC_TOP_K = 20
_CDC_POWS = [CDC_BASE**k for k in range(CDC_WINDOW)]


def text_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rolling-hash boundary rule behind
    rsync/LBFS/FastCDC, and the chunk-level dedup primitive FineWeb-class
    pipelines use between paragraph- and document-granularity): a chunk
    boundary falls after position i whenever the polynomial hash of the
    trailing ``CDC_WINDOW`` chars ≡ 0 (mod ``CDC_DIVISOR``) — so
    boundaries survive insertions/deletions elsewhere in the document,
    unlike fixed-width windows. Emits the top-{CDC_TOP_K} chunks by
    corpus frequency (the duplicated-content report).

    EXACT-INTEGER: the hash is the plain polynomial value over ASCII
    codes (< 2^45 at W=8 — no modulus needed), so both engines agree
    bit-for-bit.

    Scale posture: boundary detection runs IN-ROW over array
    expressions (transform/filter/aggregate — JVM codegen, no Python,
    no per-char row explosion); only the resulting ~len/{CDC_DIVISOR}
    chunks per doc are exploded, then ONE uniform-keyed groupBy on the
    chunk text + TakeOrderedAndProject. At 100 TB this is scan + one
    bounded shuffle — the cheapest near-dup reducer after URL/exact
    hashing. No min/max chunk-length clamp: the clamp would make
    boundaries sequential (FastCDC's skip rule), breaking the
    per-position independence that makes this embarrassingly parallel;
    divisor tuning plays that role here."""
    # Spark evaluates higher-order-function lambdas interpreted, and
    # projection collapse inlines referenced array columns INTO lambda
    # bodies (re-evaluated per element — the explode-recompute trap, see
    # operators/materialize.py). So the boundary lambda references ONLY
    # the leaf `text` column with the window polynomial UNROLLED (8
    # substring·power terms, no inner lambda, no allocation) — measured
    # faster than both a codes-array formulation (inline recompute,
    # >300 s at sf0.001) and a rolling struct-accumulator fold (~30 s;
    # interpreted lambdas pay per struct/array allocation).
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier,
    )

    poly = " + ".join(
        f"ascii(substring(text, i - {k}, 1)) * {p}L"
        for k, p in enumerate(_CDC_POWS)
    )

    def build() -> DataFrame:
        from mongo_to_clickhouse_spark.operators.autoscale import (
            kernel_fanout,
        )

        # Per-row cost here is ~8 interpreted substring·power terms PER
        # CHARACTER — orders of magnitude above per-row bytes, so the
        # bytes-proportional scan partitioning under-parallelizes it
        # (>250× at the 100× rehearsal); count-gated fan-out per
        # SCALE.md §6n.
        docs = kernel_fanout(
            spark, sf_dir,
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        )
        return docs.selectExpr(
            "doc_id",
            "text",
            f"""CASE WHEN length(text) < {CDC_WINDOW}
                     THEN cast(array() as array<int>)
                ELSE filter(sequence({CDC_WINDOW}, length(text)),
                            i -> ({poly}) % {CDC_DIVISOR} = 0)
                END AS bnds""",
        )

    # checkpoint the boundary relation: the chunk-slicing lambdas below
    # reference it several times per row — inlined, Spark would re-run
    # the whole rolling fold per reference (measured 30× at sf0.001)
    staged = (
        cached_barrier(spark, sf_dir, "cdc_bnds", build)
        .selectExpr(
            "doc_id",
            "text",
            "concat(array(0), bnds, array(length(text))) AS b2",
        )
        .selectExpr(
            "doc_id",
            """filter(transform(sequence(1, size(b2) - 1),
                      j -> substring(text, element_at(b2, j) + 1,
                           element_at(b2, j + 1) - element_at(b2, j))),
                      c -> c != '') AS chunks""",
        )
        .select("doc_id", F.explode("chunks").alias("chunk"))
    )
    return (
        staged.groupBy("chunk")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .select(
            "chunk",
            F.length("chunk").cast("int").alias("chunk_len"),
            "n_occurrences",
            "n_docs",
        )
        .orderBy(F.desc("n_occurrences"), "chunk")
        .limit(CDC_TOP_K)
    )


TEXT_CDC_CHUNKING_SQL = f"""
    WITH staged AS (
        SELECT doc_id, text,
               list_transform(range(1, length(text) + 1),
                              i -> ascii(substring(text, i, 1))) AS codes
        FROM documents
    ),
    bounds AS (
        SELECT doc_id, text,
               [CAST(0 AS BIGINT)]
               || list_filter(range({CDC_WINDOW}, length(text) + 1),
                      i -> list_sum(list_transform(
                               range(0, {CDC_WINDOW}),
                               k -> codes[i - k]
                                    * ([{", ".join(str(p) for p in _CDC_POWS)}])[k + 1]))
                           % {CDC_DIVISOR} = 0)
               || [length(text)] AS b2
        FROM staged
    ),
    chunks AS (
        SELECT doc_id, unnest(
                   list_filter(
                       list_transform(range(1, len(b2)),
                           j -> substring(text, b2[j] + 1,
                                          b2[j + 1] - b2[j])),
                       c -> c != '')) AS chunk
        FROM bounds
    )
    SELECT chunk,
           CAST(length(chunk) AS INTEGER) AS chunk_len,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM chunks
    GROUP BY chunk
    ORDER BY n_occurrences DESC, chunk
    LIMIT {CDC_TOP_K}
"""


def _ocr_noise_sql(engine: str) -> str:
    """Engine-shared OCR/extraction-noise filter (the C4/RefinedWeb
    character-class rules): digit share, non-alphanumeric share and
    mean word length per document, each thresholded by exact integer
    cross-multiplication (no ratio doubles) into a reason bitmask —
    the cheap first gate in front of the LM-based quality tiers (OCR
    artifacts show as digit/symbol storms and absurd word lengths
    before any model sees them).

    Class counts come from length deltas of regexp_replace strips —
    one narrow map, identical regex semantics in both engines."""
    toks = "split(text, ' ')" if engine == "spark" else \
        "string_split(text, ' ')"
    nlen = "size" if engine == "spark" else "len"
    return f"""
        WITH scored AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_txt,
                   CAST(length(text)
                        - length(regexp_replace(text, '[0-9]', ''))
                        AS BIGINT) AS n_digits,
                   CAST(length(text)
                        - length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))
                        AS BIGINT) AS n_symbols,
                   CAST({nlen}({toks}) AS BIGINT) AS n_words
            FROM documents
        ),
        flagged AS (
            SELECT doc_id, n_chars_txt, n_digits, n_symbols, n_words,
                   (CASE WHEN n_digits * 5 > n_chars_txt
                         THEN 1 ELSE 0 END)
                 + (CASE WHEN n_symbols * 10 > n_chars_txt * 3
                         THEN 2 ELSE 0 END)
                 + (CASE WHEN n_chars_txt - (n_words - 1) > n_words * 12
                         THEN 4 ELSE 0 END)
                 + (CASE WHEN n_chars_txt - (n_words - 1) < n_words * 2
                         THEN 8 ELSE 0 END) AS reason_mask
            FROM scored
        )
        SELECT doc_id,
               CAST(n_digits * 1000000 {{intdiv}} n_chars_txt AS BIGINT)
                   AS digit_ppm,
               CAST(n_symbols * 1000000 {{intdiv}} n_chars_txt AS BIGINT)
                   AS symbol_ppm,
               reason_mask,
               reason_mask > 0 AS flagged
        FROM flagged
        ORDER BY doc_id
    """


def text_ocr_noise_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class OCR-noise gate — see _ocr_noise_sql. Pure narrow
    map over one scan; at 100 TB this fuses into the read with zero
    exchange."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_ocr_noise_sql("spark").replace("{intdiv}", "DIV"))


TEXT_OCR_NOISE_FILTER_SQL = _ocr_noise_sql("duck").replace("{intdiv}", "//")


def _html_extract_body(engine: str) -> str:
    """HTML → text extraction (the WARC→WET step of a web-crawl
    pipeline): strip <script>/<style> blocks (dotall), then all tags,
    then decode entities (&amp; LAST, so &amp;lt; survives as &lt; —
    the classic double-decode bug). The fixture's documents are plain
    text, so the page is synthesized in-band by the inverse transform
    (entity-encode + wrap in markup with a hostile script body
    containing < > &&); the round trip must restore the original text
    byte-for-byte — counted in-band as n_roundtrip_ok."""
    rr = (lambda s, p, r: f"regexp_replace({s}, '{p}', '{r}')") \
        if engine == "spark" else \
        (lambda s, p, r: f"regexp_replace({s}, '{p}', '{r}', 'g')")
    enc = ("replace(replace(replace(text, '&', '&amp;'),"
           " '<', '&lt;'), '>', '&gt;')")
    page = ("'<html><head><title></title>"
            "<script>if (a < b && c > 0) { x = \"&amp;\"; }</script>"
            "<style>p { margin: 0; }</style></head><body><p>'"
            f" || {enc} || '</p></body></html>'")
    stripped = rr(rr(rr("page", r"(?s)<script.*?</script>", ""),
                     r"(?s)<style.*?</style>", ""),
                  "<[^>]+>", "")
    decoded = ("replace(replace(replace(" + stripped +
               ", '&lt;', '<'), '&gt;', '>'), '&amp;', '&')")
    return f"""
        WITH pages AS (
            SELECT doc_id, source, text, {page} AS page
            FROM documents
        ),
        cleaned AS (
            SELECT doc_id, source, text, page, {decoded} AS clean
            FROM pages
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN clean = text THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_roundtrip_ok,
               CAST(SUM(length(page)) AS BIGINT) AS sum_page_chars,
               CAST(SUM(length(clean)) AS BIGINT) AS sum_clean_chars,
               CAST(floor(SUM(length(page) - length(clean)) * 1000000e0
                          / SUM(length(page))) AS BIGINT)
                   AS markup_overhead_ppm
        FROM cleaned
        GROUP BY source
        ORDER BY source
    """


def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate stripping with an in-band round-trip proof —
    see _html_extract_body. The extraction kernel (script/style
    removal, tag strip, entity decode in the only safe order) is what
    a crawl-ingest pipeline runs before every text operator in this
    registry; the synthesized page makes its correctness checkable
    against the known plain text.

    Scale posture: pure narrow maps over one documents scan (regex in
    JVM codegen, no Python); the rollup is map-side combined per
    source."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_html_extract_body("spark"))


TEXT_HTML_EXTRACT_SQL = _html_extract_body("duck")


# ---------------------------------------------------------------------------
# text_code_detect — heuristic code-vs-prose classifier per document
# ---------------------------------------------------------------------------

CODE_SYMBOL_PPM = 5_000   # ≥0.5% of chars are code punctuation
CODE_KW_MIN = 3           # or ≥3 programming keywords
_CODE_KW_RE = (
    r"\b(def|return|import|class|function|var|const|void|int|float|"
    r"public|private|static|struct|enum|typedef|lambda|elif|endif)\b"
)


def _code_detect_body(engine: str) -> str:
    """Heuristic code-detection filter (the pretraining-corpus router
    that decides prose-pipeline vs code-pipeline — the first gate The
    Stack / StarCoder-style curation runs): per document, count code
    punctuation ({{}};=()<>[]) by length-difference (JVM/codegen-safe,
    no per-row Python) and programming keywords by regex, then flag
    is_code when the symbol density or keyword count crosses the
    thresholds. Output is the per-(source, lang) routing report.

    Exactness: counts and ppm ratios are pure integers (ppm floors a
    non-negative exact ratio). Keyword counting is regexp_count on the
    Spark side and len(regexp_extract_all) in DuckDB — same RE2-safe
    pattern, word boundaries included.

    Scale posture: narrow maps over one documents scan; the report is
    a |sources|×|langs| map-side-combined aggregate."""
    if engine == "spark":
        # Spark's SQL string-literal parser eats single backslashes
        # (\b in a literal becomes a backspace char), so the word
        # boundary must be double-escaped on this side only — same
        # discipline as corpusops._EMAIL_RE usage (corpusops.py:359).
        kw_re = _CODE_KW_RE.replace("\\b", "\\\\b")
        kw = f"CAST(regexp_count(text, '{kw_re}') AS BIGINT)"
    else:
        kw = f"CAST(len(regexp_extract_all(text, '{_CODE_KW_RE}')) AS BIGINT)"
    sym_chars = ["{", "}", ";", "=", "(", ")", "<", ">", "[", "]"]
    sym = " + ".join(
        f"(length(text) - length(replace(text, '{c}', '')))"
        for c in sym_chars
    )
    return f"""
        WITH feats AS (
            SELECT source, lang,
                   CAST({sym} AS BIGINT) AS sym_ct,
                   {kw} AS kw_ct,
                   CAST(length(text) AS BIGINT) AS n
            FROM documents
        ),
        flagged AS (
            SELECT source, lang, sym_ct, kw_ct,
                   CASE WHEN n = 0 THEN 0
                        WHEN CAST(floor(sym_ct * 1000000.0 / n) AS BIGINT)
                             >= {CODE_SYMBOL_PPM} THEN 1
                        WHEN kw_ct >= {CODE_KW_MIN} THEN 1
                        ELSE 0 END AS is_code
            FROM feats
        )
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(is_code) AS BIGINT) AS n_code,
               CAST(floor(SUM(is_code) * 1000000.0 / COUNT(*)) AS BIGINT)
                   AS code_ppm,
               CAST(SUM(sym_ct) AS BIGINT) AS sym_chars,
               CAST(SUM(kw_ct) AS BIGINT) AS kw_hits
        FROM flagged
        GROUP BY source, lang
        ORDER BY source, lang
    """


def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing report — see _code_detect_body."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_code_detect_body("spark"))


TEXT_CODE_DETECT_SQL = _code_detect_body("duck")


QUERIES: dict[str, tuple] = {
    "text_code_detect": (text_code_detect, TEXT_CODE_DETECT_SQL),
    "text_html_extract": (text_html_extract, TEXT_HTML_EXTRACT_SQL),
    "text_ocr_noise_filter": (text_ocr_noise_filter,
                              TEXT_OCR_NOISE_FILTER_SQL),
    "text_cdc_chunking": (text_cdc_chunking, TEXT_CDC_CHUNKING_SQL),
    "text_feature_hashing": (text_feature_hashing, TEXT_FEATURE_HASHING_SQL),
    "text_ngram_freq": (text_ngram_freq, TEXT_NGRAM_FREQ_SQL),
    "scalar_array_ops": (scalar_array_ops, SCALAR_ARRAY_OPS_SQL),
    "text_tokenize_wordcount": (text_tokenize_wordcount, TEXT_TOKENIZE_WORDCOUNT_SQL),
    "text_lang_stats": (text_lang_stats, TEXT_LANG_STATS_SQL),
    "text_token_count": (text_token_count, TEXT_TOKEN_COUNT_SQL),
    "text_quality_score": (text_quality_score, TEXT_QUALITY_SCORE_SQL),
    "text_readability_flesch": (
        text_readability_flesch,
        TEXT_READABILITY_FLESCH_SQL,
    ),
    "text_langid_ngram": (text_langid_ngram, TEXT_LANGID_NGRAM_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
    "dedup_exact_hash": (dedup_exact_hash, DEDUP_EXACT_HASH_SQL),
    "text_bm25_topk": (text_bm25_topk, TEXT_BM25_TOPK_SQL),
}
