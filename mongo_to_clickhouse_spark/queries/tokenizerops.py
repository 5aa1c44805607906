"""Tokenizer-training and corpus-structure operators — the remaining
stages of a pretraining data pipeline between curation (corpusops) and
packing (pipelineops):

- ``tokenizer_bpe_pair_counts``: the distributed half of BPE vocabulary
  induction — adjacent-symbol pair frequencies over the corpus, the
  statistic each BPE merge round maximizes.
- ``text_paragraph_dedup``: exact dedup at paragraph granularity (the
  between-doc boilerplate remover that document-level hashing misses).
- ``corpus_quality_logreg``: linear quality-classifier scoring — the
  serving shape of the fastText/logreg quality filter stage.

The reference has no tokenizer/corpus tier (it is a fixed CDC ETL,
/root/reference/src/main.rs:362-397); these are north-star extension IDs
like the rest of the dedup/corpus family. All three are pure built-in
expression chains, DuckDB-oracle-checked, with the same integer-micro /
6-dp determinism rules as corpusops (see text_perplexity_unigram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.config import TUNING
from mongo_to_clickhouse_spark.io import load_table
from mongo_to_clickhouse_spark.queries.corpusops import _toks_view

BPE_TOP_K = TUNING.bpe_top_k          # merge candidates returned per round
PARA_TOKENS = TUNING.para_tokens      # paragraph unit: 16-token chunks
# Positional encoding for "global first occurrence": pos = doc_id * 2^20
# + chunk_idx. Valid while docs stay under 2^20 chunks (= 16 Mi tokens at
# W=16) and doc_id under 2^43 — both far above any real corpus row.
_POS_BASE = 1 << 20

# Stand-in weights for a trained quality classifier (micro-scaled
# integers so the logit is EXACT integer arithmetic in both engines; only
# the final sigmoid touches floating point, 6-dp rounded). The operator
# under test is the serving shape — per-doc feature extraction fused into
# the scan + a dot product — not the specific weights.
_W_TTR = 2        # type-token ratio (micro)
_W_STOP = -3      # stopword ratio (micro)
_W_LEN = 500      # clamped token count
_W_AWL = 1        # average word length (micro)
_BIAS = -2_000_000
_LEN_CLAMP = 200
_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokenizer_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K adjacent character-pair frequencies for BPE vocabulary
    induction (the per-round merge statistic of Sennrich-style BPE).

    Scale shape — the classic trick that makes BPE trainable on a 100 TB
    corpus: aggregate to the DISTINCT-WORD frequency table first (one
    uniform word-keyed shuffle over the corpus), then enumerate character
    pairs only over that vocabulary (millions of rows, not trillions)
    weighted by word count. The final pair aggregation is over a
    ~|alphabet|² key space with map-side combine, and the top-K is a
    TakeOrderedAndProject, never a global sort."""
    view = _toks_view(spark, sf_dir)
    return spark.sql(f"""
        WITH words AS (SELECT explode(toks) AS word FROM {view}),
        wc AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word),
        pairs AS (
            SELECT concat(substring(word, i, 1), ' ',
                          substring(word, i + 1, 1)) AS pair,
                   cnt
            FROM wc
            LATERAL VIEW explode(
                CASE WHEN length(word) >= 2
                     THEN sequence(1, length(word) - 1)
                     ELSE array() END) AS i
        )
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
        FROM pairs
        GROUP BY pair
        ORDER BY pair_count DESC, pair
        LIMIT {BPE_TOP_K}
    """)


TOKENIZER_BPE_PAIR_COUNTS_SQL = f"""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word),
    pairs AS (
        SELECT unnest(list_transform(
                   range(1, length(word)),
                   i -> substring(word, i, 1) || ' '
                        || substring(word, i + 1, 1))) AS pair,
               cnt
        FROM wc
    )
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT {BPE_TOP_K}
"""


def text_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity exact dedup: chunk each doc into fixed
    {PARA_TOKENS}-token paragraphs, hash each, and keep only the GLOBAL
    first occurrence (min (doc_id, chunk_idx)) of every distinct chunk —
    the boilerplate-paragraph remover (headers/footers/licence blocks)
    that document-level exact dedup cannot see.

    Scale shape: one explode of the corpus into chunk hashes (60-bit
    BIGINT keys like the gram operators), ONE shuffle keyed by the
    uniform chunk hash where a partitioned window computes the global
    argmin in place (no pair enumeration, no join back — the
    CTE-join formulation inlined the explode into BOTH consumers, so
    the corpus explode+md5 ran twice; the round-7 bench diff flagged
    the 1.5× as a regression when it was this shape all along). The
    window partitions by the uniform high-cardinality chunk hash, so
    no task ever sees more than one hash's duplicates.
    First-occurrence is an integer argmin over
    pos = doc_id * 2^20 + chunk_idx, exact in both engines."""
    view = _toks_view(spark, sf_dir)
    w = PARA_TOKENS
    return spark.sql(f"""
        WITH chunks AS (
            SELECT doc_id, c,
                   CAST(conv(substring(
                       md5(concat_ws(' ', slice(toks, c * {w} + 1, {w}))),
                       1, 15), 16, 10) AS BIGINT) AS chunk_h
            FROM {view}
            LATERAL VIEW explode(
                CASE WHEN size(toks) > 0
                     THEN sequence(0,
                          CAST(ceil(size(toks) / {w}.0) AS INT) - 1)
                     ELSE array() END) AS c
        ),
        flagged AS (
            SELECT doc_id, c,
                   MIN(doc_id * {_POS_BASE} + c)
                       OVER (PARTITION BY chunk_h) AS first_pos
            FROM chunks
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN doc_id * {_POS_BASE} + c = first_pos
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               round(1.0 - SUM(CASE WHEN doc_id * {_POS_BASE} + c = first_pos
                                    THEN 1 ELSE 0 END)
                         / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio
        FROM flagged
        GROUP BY doc_id
        ORDER BY doc_id
    """)


BOILER_DF = 5   # a chunk in ≥ this many DISTINCT docs is boilerplate


def text_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection by cross-document chunk frequency — the C4
    rule text_paragraph_dedup does NOT implement: paragraph dedup keeps
    each chunk's first occurrence, but a header/footer/licence block in
    {BOILER_DF}+ distinct documents is boilerplate EVERYWHERE, including
    its first occurrence. Per doc: chunk counts, boilerplate-chunk count
    and ratio, and the drop flag (> half the doc is boilerplate).

    Scale shape: the same single chunk-hash explode as paragraph dedup,
    one (chunk_h)-keyed distinct-doc count (uniform keys), and the
    ≤|hot chunks| boilerplate set joins back to the chunk stream — df
    thresholding bounds the broadcast side by construction."""
    view = _toks_view(spark, sf_dir)
    w = PARA_TOKENS
    return spark.sql(f"""
        WITH chunks AS (
            SELECT doc_id, c,
                   CAST(conv(substring(
                       md5(concat_ws(' ', slice(toks, c * {w} + 1, {w}))),
                       1, 15), 16, 10) AS BIGINT) AS chunk_h
            FROM {view}
            LATERAL VIEW explode(
                CASE WHEN size(toks) > 0
                     THEN sequence(0,
                          CAST(ceil(size(toks) / {w}.0) AS INT) - 1)
                     ELSE array() END) AS c
        ),
        df AS (
            SELECT chunk_h, COUNT(DISTINCT doc_id) AS ndocs
            FROM chunks GROUP BY chunk_h
        )
        SELECT c.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN d.ndocs >= {BOILER_DF} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boiler,
               round(SUM(CASE WHEN d.ndocs >= {BOILER_DF} THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS boiler_ratio,
               (SUM(CASE WHEN d.ndocs >= {BOILER_DF} THEN 1 ELSE 0 END) * 2
                > COUNT(*)) AS flagged
        FROM chunks c JOIN df d ON c.chunk_h = d.chunk_h
        GROUP BY c.doc_id
        ORDER BY c.doc_id
    """)


TEXT_BOILERPLATE_CHUNKS_SQL = f"""
    WITH toksrc AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    chunks AS (
        SELECT doc_id, c,
               CAST(('0x' || substr(md5(array_to_string(
                   list_slice(toks, c * {PARA_TOKENS} + 1,
                              c * {PARA_TOKENS} + {PARA_TOKENS}), ' ')),
                   1, 15)) AS BIGINT) AS chunk_h
        FROM (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / {PARA_TOKENS}.0)
                                        AS BIGINT))) AS c
            FROM toksrc WHERE len(toks) > 0
        )
    ),
    df AS (
        SELECT chunk_h, COUNT(DISTINCT doc_id) AS ndocs
        FROM chunks GROUP BY chunk_h
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN d.ndocs >= {BOILER_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           round(SUM(CASE WHEN d.ndocs >= {BOILER_DF} THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS boiler_ratio,
           (SUM(CASE WHEN d.ndocs >= {BOILER_DF} THEN 1 ELSE 0 END) * 2
            > COUNT(*)) AS flagged
    FROM chunks c JOIN df d ON c.chunk_h = d.chunk_h
    GROUP BY c.doc_id
    ORDER BY c.doc_id
"""


TEXT_PARAGRAPH_DEDUP_SQL = f"""
    WITH toksrc AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    chunks AS (
        SELECT doc_id, c,
               CAST(('0x' || substr(md5(array_to_string(
                   list_slice(toks, c * {PARA_TOKENS} + 1,
                              c * {PARA_TOKENS} + {PARA_TOKENS}), ' ')),
                   1, 15)) AS BIGINT) AS chunk_h
        FROM (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / {PARA_TOKENS}.0)
                                        AS BIGINT))) AS c
            FROM toksrc
        )
    ),
    firsts AS (
        SELECT chunk_h, MIN(doc_id * {_POS_BASE} + c) AS first_pos
        FROM chunks GROUP BY chunk_h
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN doc_id * {_POS_BASE} + c = first_pos
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(1.0 - SUM(CASE WHEN doc_id * {_POS_BASE} + c = first_pos
                                THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio
    FROM chunks JOIN firsts USING (chunk_h)
    GROUP BY doc_id
    ORDER BY doc_id
"""


_STOP_SPARK = ", ".join(f"'{s}'" for s in _STOPWORDS)


def corpus_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier scoring: per-doc features (type-token ratio,
    stopword ratio, clamped length, average word length) through a fixed
    logistic model — the serving shape of the fastText/logreg quality
    filter every pretraining pipeline runs.

    Embarrassingly parallel: feature extraction fuses into the documents
    scan (no shuffle at all — the whole query is one projection).
    Determinism: every feature is micro-scaled integer arithmetic; the
    logit z_micro is an exact BIGINT in both engines, `keep` is decided
    on the integer logit (z >= 0 ⇔ score >= 0.5, no float boundary), and
    only the final sigmoid touches floats, 6-dp rounded like
    text_perplexity_unigram."""
    view = _toks_view(spark, sf_dir)
    return spark.sql(f"""
        WITH feats AS (
            SELECT doc_id,
                   size(toks) AS n_tokens,
                   CAST(round(size(array_distinct(toks)) * 1e6
                              / greatest(size(toks), 1)) AS BIGINT)
                       AS ttr_micro,
                   CAST(round(size(filter(toks,
                        x -> x IN ({_STOP_SPARK}))) * 1e6
                              / greatest(size(toks), 1)) AS BIGINT)
                       AS stop_micro,
                   CAST(round((length(concat_ws(' ', toks))
                               - (size(toks) - 1)) * 1e6
                              / greatest(size(toks), 1)) AS BIGINT)
                       AS awl_micro
            FROM {view}
        ),
        logit AS (
            SELECT doc_id, n_tokens,
                   {_BIAS} + {_W_TTR} * ttr_micro
                           + {_W_STOP} * stop_micro
                           + {_W_LEN} * least(n_tokens, {_LEN_CLAMP})
                           + {_W_AWL} * awl_micro AS z_micro
            FROM feats
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               round(1.0 / (1.0 + exp(-z_micro / 1e6)), 6) AS quality_score,
               z_micro >= 0 AS keep
        FROM logit
        ORDER BY doc_id
    """)


_STOP_DUCK = ", ".join(f"'{s}'" for s in _STOPWORDS)

CORPUS_QUALITY_LOGREG_SQL = f"""
    WITH feats AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               CAST(round(len(list_distinct(toks)) * 1e6
                          / greatest(len(toks), 1)) AS BIGINT) AS ttr_micro,
               CAST(round(len(list_filter(toks,
                    x -> x IN ({_STOP_DUCK}))) * 1e6
                          / greatest(len(toks), 1)) AS BIGINT) AS stop_micro,
               CAST(round((length(array_to_string(toks, ' '))
                           - (len(toks) - 1)) * 1e6
                          / greatest(len(toks), 1)) AS BIGINT) AS awl_micro
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    logit AS (
        SELECT doc_id, n_tokens,
               {_BIAS} + {_W_TTR} * ttr_micro
                       + {_W_STOP} * stop_micro
                       + {_W_LEN} * least(n_tokens, {_LEN_CLAMP})
                       + {_W_AWL} * awl_micro AS z_micro
        FROM feats
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(1.0 / (1.0 + exp(-z_micro / 1e6)), 6) AS quality_score,
           z_micro >= 0 AS keep
    FROM logit
    ORDER BY doc_id
"""


BPE_MERGE_ROUNDS = TUNING.bpe_merge_rounds


def tokenizer_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE TRAINING loop (Sennrich-style): ``BPE_MERGE_ROUNDS``
    iterations of count-pairs → take the argmax pair → apply the merge
    to the word-frequency table → re-count. Returns the learned merge
    table (round, pair, pair_count) — the artifact a tokenizer trainer
    ships. Completes the tier tokenizer_bpe_pair_counts started (that id
    is one round's counting statistic; this is the iteration around it —
    round-4 verdict item 3).

    Distributed shape: everything runs on the DISTINCT-WORD frequency
    table (one corpus-wide shuffle total, amortized via the session
    token barrier), so per round the work is vocabulary-sized, not
    corpus-sized — the property that makes BPE trainable at 100 TB.
    Each round is: one explode+aggregate over the vocab's adjacent
    symbol pairs (map-side combined, ~|alphabet|²-bounded keys), a
    1-row TakeOrdered argmax broadcast into a narrow map that rewrites
    the word strings, and a vocab-row checkpoint to keep the DAG linear
    across rounds (same discipline as kmeans/pagerank).

    MERGE ENCODING — the piece that makes left-to-right non-overlapping
    BPE merging expressible as one built-in ``replace()``: words are
    kept as symbol strings with DOUBLE-space separators and a
    leading/trailing double space ('abc' → '  a  b  c  '). The pair
    (a, b) occurs as ' a  b ' (single outer spaces), and replacing it
    with ' ab ' consumes one space from each side's double — so
    consecutive occurrences ('aaaa' on pair (a,a)) merge exactly like
    BPE's sequential scan: '  a  a  a  a  ' → '  aa  aa  '. Both
    engines' replace() scans forward without re-examining replaced
    text, which IS the BPE merge rule. Multi-char symbols can never
    false-match because every symbol boundary keeps two spaces and
    corpus words cannot contain a space (they come from a space split).

    Exactness: integer counts; argmax tie-broken (count DESC, a, b);
    no floats anywhere. Oracle: the same rounds unrolled as DuckDB CTEs
    (kmeans/pagerank recipe)."""
    from mongo_to_clickhouse_spark.operators.literalrel import (
        literal_rows_df,
    )

    rows, _, _ = _bpe_train(spark, sf_dir)
    return literal_rows_df(
        spark, rows, "round int, pair string, pair_count bigint"
    ).orderBy("round")


def _bpe_pair_count_kernel(merges: list[tuple[str, str]]):
    """Arrow kernel for one BPE round (optimization round 2, guide §4.2
    / VERDICT r11 item 2): applies the merges learned so far to the
    spaced-symbol vocabulary and emits per-partition (a, b, pair_count)
    partials for every adjacent symbol pair. All three engines' replace
    primitives (Spark ``replace``, DuckDB ``replace``, Arrow
    ``replace_substring``) scan left-to-right non-overlapping — the BPE
    merge rule — so re-deriving round r's table from the round-0
    checkpoint is bit-identical to the old chain of per-round
    checkpointed ``replace`` barriers it replaces (2 jobs + 1 vocab
    checkpoint write per round -> 1 job, no writes). Pair extraction is
    fully vectorized: split offsets -> mask of non-terminal symbol
    positions -> (values[i], values[i+1]) takes -> one Arrow group_by
    per partition. Only vocabulary-bounded (a, b, count) partials cross
    the JVM boundary."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(it):
        parts = []
        for batch in it:
            w = batch.column(0)
            cnt = batch.column(1)
            for a, b in merges:
                w = pc.replace_substring(
                    w, pattern=f" {a}  {b} ", replacement=f" {a}{b} ")
            ls = pc.split_pattern(pc.utf8_trim(w, " "), "  ")
            offs = ls.offsets.to_numpy()
            lens = np.diff(offs)
            npairs = np.maximum(lens - 1, 0)
            total = int(offs[-1]) if len(offs) else 0
            if total == 0 or int(npairs.sum()) == 0:
                continue
            # every symbol position except the last of each word starts
            # a pair
            mask = np.ones(total, dtype=bool)
            mask[offs[1:] - 1] = False
            a_pos = np.nonzero(mask)[0]
            take_a = pa.array(a_pos, type=pa.int64())
            take_b = pa.array(a_pos + 1, type=pa.int64())
            vals = ls.values
            wts = np.repeat(cnt.to_numpy(zero_copy_only=False), npairs)
            parts.append(pa.table({
                "a": vals.take(take_a),
                "b": vals.take(take_b),
                "pair_count": pa.array(wts, type=pa.int64()),
            }))
        if parts:
            g = (pa.concat_tables(parts)
                 .group_by(["a", "b"]).aggregate([("pair_count", "sum")]))
            yield pa.RecordBatch.from_arrays(
                [g.column("a").combine_chunks(),
                 g.column("b").combine_chunks(),
                 g.column("pair_count_sum").combine_chunks()],
                names=["a", "b", "pair_count"],
            )

    return kernel


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Shared BPE training loop: returns (per-round merge-table rows as
    driver tuples, the checkpointed round-0 word-frequency table in
    spaced-symbol form, the learned merges). Optimization round 2
    restructure (guide §4.2, VERDICT r11 item 2): per round, ONE
    mapInArrow job — apply the merges learned so far, count adjacent
    pairs vectorized, reduce vocabulary-bounded partials through a
    narrow groupBy and take the (count DESC, a, b) argmax — instead of
    the old two checkpoint barriers (pair-count explode + vocabulary
    rewrite). The argmax stays a Spark TakeOrdered so tie-breaking is
    engine-native; the collected best pair is 1 row per round
    (control-plane bounded)."""
    from mongo_to_clickhouse_spark.operators.materialize import barrier

    view = _toks_view(spark, sf_dir)
    wc = barrier(spark.sql(f"""
        SELECT concat('  ', regexp_replace(word, '(?s)(.)', '$1  ')) AS w,
               cnt
        FROM (SELECT word, COUNT(*) AS cnt
              FROM (SELECT explode(toks) AS word FROM {view})
              GROUP BY word)
    """))
    merges: list[tuple[str, str]] = []
    rows: list[tuple[int, str, int]] = []
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        pr = wc.mapInArrow(
            _bpe_pair_count_kernel(list(merges)),
            "a string, b string, pair_count long",
        )
        best = (
            pr.groupBy("a", "b")
            .agg(F.sum("pair_count").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(1)
        ).collect()  # 1-row argmax: the round's best pair
        if not best:
            # tiny corpus fully merged: nothing left to count — later
            # rounds are empty too (same behavior as the old LEFT-join
            # no-op merge chain)
            break
        a, b = best[0]["a"], best[0]["b"]
        rows.append((r, f"{a} {b}", int(best[0]["pair_count"])))
        merges.append((a, b))
    return rows, wc, merges


def tokenizer_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus with the learned BPE merges — the serving half
    of the tokenizer tier (train = tokenizer_bpe_merge_rounds). Applies
    all {BPE_MERGE_ROUNDS} merges in order to the distinct-word table
    (an empty best-pair round simply applies nothing) and reports the
    resulting symbol vocabulary: the top-{BPE_TOP_K} (symbol,
    n_occurrences) rows, corpus-weighted — the statistic a tokenizer
    report prints (which merged units dominate the encoded corpus).

    Scale shape: identical to training (vocabulary-sized rounds off one
    corpus shuffle) plus ONE Arrow pass over the encoded vocabulary
    emitting per-partition (symbol, count) partials — symbols are
    ≲|alphabet|+R keys, uniform, map-side combined."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    _, wc, merges = _bpe_train(spark, sf_dir)

    def encode_kernel(it):
        parts = []
        for batch in it:
            w = batch.column(0)
            for a, b in merges:
                w = pc.replace_substring(
                    w, pattern=f" {a}  {b} ", replacement=f" {a}{b} ")
            ls = pc.split_pattern(pc.utf8_trim(w, " "), "  ")
            lens = np.diff(ls.offsets.to_numpy())
            wts = np.repeat(
                batch.column(1).to_numpy(zero_copy_only=False), lens)
            parts.append(pa.table({
                "symbol": ls.values,
                "n": pa.array(wts, type=pa.int64()),
            }))
        if parts:
            g = (pa.concat_tables(parts)
                 .group_by(["symbol"]).aggregate([("n", "sum")]))
            yield pa.RecordBatch.from_arrays(
                [g.column("symbol").combine_chunks(),
                 g.column("n_sum").combine_chunks()],
                names=["symbol", "n"],
            )

    return (
        wc.mapInArrow(encode_kernel, "symbol string, n long")
        .groupBy("symbol")
        .agg(F.sum("n").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "symbol")
        .limit(BPE_TOP_K)
    )


def _bpe_merge_duck_sql(apply_final_merge: bool = False) -> str:
    parts = [
        """wc0 AS (
            SELECT '  ' || regexp_replace(word, '(?s)(.)', '\\1  ', 'g') AS w,
                   cnt
            FROM (SELECT word, COUNT(*) AS cnt
                  FROM (SELECT unnest(string_split(text, ' ')) AS word
                        FROM documents)
                  GROUP BY word)
        )""",
    ]
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        parts.append(f"""pairs{r} AS (
            SELECT a, b, SUM(cnt) AS pair_count
            FROM (SELECT s[i] AS a, s[i + 1] AS b, cnt
                  FROM (SELECT s, cnt, unnest(range(1, len(s))) AS i
                        FROM (SELECT string_split(trim(w), '  ') AS s, cnt
                              FROM wc{r - 1})))
            GROUP BY a, b
        )""")
        parts.append(f"""best{r} AS (
            SELECT a, b, pair_count FROM pairs{r}
            ORDER BY pair_count DESC, a, b LIMIT 1
        )""")
        if r < BPE_MERGE_ROUNDS or apply_final_merge:
            parts.append(f"""wc{r} AS (
            SELECT CASE WHEN x.a IS NULL THEN w ELSE
                       replace(w, ' ' || x.a || '  ' || x.b || ' ',
                               ' ' || x.a || x.b || ' ') END AS w, cnt
            FROM wc{r - 1} LEFT JOIN best{r} x ON TRUE
        )""")
    if apply_final_merge:
        return f"""
            WITH {", ".join(parts)}
            SELECT symbol, CAST(SUM(cnt) AS BIGINT) AS n_occurrences
            FROM (SELECT unnest(string_split(trim(w), '  ')) AS symbol, cnt
                  FROM wc{BPE_MERGE_ROUNDS})
            GROUP BY symbol
            ORDER BY n_occurrences DESC, symbol
            LIMIT {BPE_TOP_K}
        """
    selects = [
        f"SELECT CAST({r} AS INTEGER) AS round, a || ' ' || b AS pair,"
        f" CAST(pair_count AS BIGINT) AS pair_count FROM best{r}"
        for r in range(1, BPE_MERGE_ROUNDS + 1)
    ]
    return (
        "WITH " + ", ".join(parts) + " "
        + " UNION ALL ".join(selects) + " ORDER BY round"
    )


TOKENIZER_BPE_MERGE_ROUNDS_SQL = _bpe_merge_duck_sql()
TOKENIZER_BPE_APPLY_SQL = _bpe_merge_duck_sql(apply_final_merge=True)


# ---------------------------------------------------------------------------
# tokenizer_wordpiece_apply — greedy longest-match-first WordPiece encode
# ---------------------------------------------------------------------------

WP_MAXLEN = 3       # max piece length considered (candidate lengths 1..3)
WP_VOCAB = 200      # vocabulary size per side (start / '##' continuation)
WP_MAX_PIECES = 8   # encode rounds; leftovers after that emit [TRUNC]
WP_TOP_K = 30


def _wp_vocab_sql(words_rel: str) -> str:
    """Deterministic WordPiece vocabulary: every ≤WP_MAXLEN-char
    substring of the distinct-word table, corpus-weighted, split into
    start pieces (position 1) and continuation pieces (elsewhere — the
    ``##`` side), keeping the WP_VOCAB most frequent per side (ties by
    piece text). This is the frequency-seeded stand-in for a trained
    WordPiece vocab; the operator under test is the greedy ENCODE."""
    return f"""
        SELECT is_start, piece, length(piece) AS len
        FROM (
            SELECT is_start, piece,
                   ROW_NUMBER() OVER (PARTITION BY is_start
                                      ORDER BY freq DESC, piece) AS rk
            FROM (
                SELECT p = 1 AS is_start, substring(w, p, l) AS piece,
                       SUM(cnt) AS freq
                FROM (SELECT w, cnt, p, l
                      FROM {words_rel}
                      {{POS_EXPLODE}}
                      ) cand
                WHERE p + l - 1 <= length(w)
                GROUP BY p = 1, substring(w, p, l)
            ) counted
        ) ranked
        WHERE rk <= {WP_VOCAB}
    """


def _wp_round_sql(st_rel: str, vocab_rel: str, hint: str = "") -> str:
    """One greedy step: per unfinished word, the LONGEST vocab piece
    prefixing the remainder (NULL when none — the [UNK] path)."""
    return f"""
        SELECT {hint} s.w, s.cnt, s.rem, s.is_start, MAX(v.len) AS bl
        FROM {st_rel} s
        LEFT JOIN {vocab_rel} v
          ON v.is_start = s.is_start
         AND v.piece = substring(s.rem, 1, v.len)
        WHERE s.rem != ''
        GROUP BY s.w, s.cnt, s.rem, s.is_start
    """


_WP_EMIT = """
    SELECT CASE WHEN bl IS NULL THEN '[UNK]'
                WHEN is_start THEN substring(rem, 1, bl)
                ELSE concat('##', substring(rem, 1, bl)) END AS piece,
           cnt
    FROM {m}
"""

_WP_NEXT = """
    SELECT w, cnt,
           CASE WHEN bl IS NULL THEN '' ELSE substr(rem, bl + 1) END AS rem,
           false AS is_start
    FROM {m}
"""


def _wordpiece_kernel(batches):
    """Arrow-batched greedy WordPiece encode over one w-hash partition:
    a bit-exact replica of the staged round SQL (``_wp_round_sql`` /
    ``_WP_EMIT`` / ``_WP_NEXT``), vectorized across every word in the
    partition. Per round the longest matching candidate at the cursor
    is taken (sort by length DESC — same piece text implies same
    length, so the argmax is unique), unmatched active words emit
    [UNK] and terminate, survivors past {WP_MAX_PIECES} rounds emit
    [TRUNC] — exactly the SQL chain's semantics. Emits per-piece
    PARTIAL counts for the global aggregate."""
    import numpy as np
    import pandas as pd

    frames = list(batches)
    if not frames:
        return
    df = pd.concat(frames, ignore_index=True)
    codes, _uniq = pd.factorize(df["w"])
    nw = len(_uniq)
    cnt_by_word = np.zeros(nw, np.int64)
    cnt_by_word[codes] = df["cnt"].to_numpy()
    wlen = np.zeros(nw, np.int64)
    wlen[codes] = df["wl"].to_numpy()
    ep = df["p"].to_numpy().astype(np.int64)
    el = df["len"].to_numpy().astype(np.int64)
    piece = df["piece"].to_numpy()

    pos = np.ones(nw, np.int64)      # 1-based cursor into the word
    alive = np.ones(nw, bool)        # False once [UNK]-terminated
    out_p: list = []
    out_c: list = []
    for _ in range(WP_MAX_PIECES):
        active = alive & (pos <= wlen)
        if not active.any():
            break
        mask = active[codes] & (ep == pos[codes]) & (ep > 0)
        matched = np.zeros(nw, bool)
        cc = np.empty(0, np.int64)
        if mask.any():
            cand = pd.DataFrame(
                {"c": codes[mask], "l": el[mask], "t": piece[mask]}
            )
            cand.sort_values(
                ["c", "l"], ascending=[True, False],
                inplace=True, kind="mergesort",
            )
            top = cand.drop_duplicates("c", keep="first")
            cc = top["c"].to_numpy()
            matched[cc] = True
        unk = active & ~matched
        if unk.any():
            u = np.nonzero(unk)[0]
            out_p.extend(["[UNK]"] * len(u))
            out_c.extend(cnt_by_word[u].tolist())
            alive[u] = False
        if len(cc):
            lens = top["l"].to_numpy().astype(np.int64)
            txt = top["t"].to_numpy()
            starts = pos[cc] == 1
            out_p.extend(
                t if s else "##" + t
                for t, s in zip(txt.tolist(), starts.tolist())
            )
            out_c.extend(cnt_by_word[cc].tolist())
            pos[cc] += lens
    trunc = alive & (pos <= wlen)
    if trunc.any():
        u = np.nonzero(trunc)[0]
        out_p.extend(["[TRUNC]"] * len(u))
        out_c.extend(cnt_by_word[u].tolist())
    part = pd.DataFrame({"piece": out_p, "part": out_c})
    yield part.groupby("piece", as_index=False, sort=False).sum()


def tokenizer_wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match-first WordPiece ENCODE (the BERT tokenizer's
    serving algorithm, Wu et al. 2016): per word, repeatedly take the
    longest vocabulary piece that prefixes the remainder — first match
    as a start piece, then as ``##`` continuations; no match → [UNK],
    leftovers after WP_MAX_PIECES rounds → [TRUNC]. Returns the
    top-{WP_TOP_K} (piece, corpus-weighted occurrences).

    Distributed shape (round-9 redesign — the r8 Viterbi discipline
    applied to the greedy encoder): the encode is PER-WORD LOCAL, so
    the previous {WP_MAX_PIECES} broadcast-join rounds, each behind a
    reliable checkpoint (~WP_MAX_PIECES barrier writes of pure fixed
    cost at ANY scale), were overhead. The candidate relation — every
    (word, position) × matching vocab piece, built once off the
    distinct-word table with a broadcast vocab join, plus one sentinel
    row per word so wholly-unmatched words still reach the kernel —
    is hash-partitioned by word and checkpointed; ONE ``mapInPandas``
    pass (``_wordpiece_kernel``, bit-exact vs the round SQL) replays
    the greedy state machine for the whole partition and emits
    per-piece partial counts; one piece-keyed aggregate + top-k
    finishes. The staged round chain remains, verbatim, as the DuckDB
    oracle (``_wordpiece_duck_sql``)."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )
    from mongo_to_clickhouse_spark.session import shuffle_partition_count

    view = _toks_view(spark, sf_dir)
    n_part = shuffle_partition_count(spark)

    def build_edges():
        spark.sql(f"""
            SELECT word AS w, COUNT(*) AS cnt
            FROM (SELECT explode(toks) AS word FROM {view})
            WHERE word != ''
            GROUP BY word
        """).createOrReplaceTempView("wp_words_v")
        spark.sql(
            _wp_vocab_sql("wp_words_v").replace(
                "{POS_EXPLODE}",
                "LATERAL VIEW explode(sequence(1, length(w))) tp AS p "
                f"LATERAL VIEW explode(sequence(1, {WP_MAXLEN})) tl AS l",
            )
        ).createOrReplaceTempView("wp_vocab_v")
        # start pieces can only ever match at p=1, continuations at
        # p>=2 (an [UNK] terminates the word), so the join prunes by
        # flag; the sentinel row keeps words with NO match anywhere
        # visible to the kernel (they emit [UNK] in round 1)
        return spark.sql(f"""
            SELECT /*+ BROADCAST(v) */ s.w, s.cnt, s.wl, s.p,
                   v.len, v.piece
            FROM (SELECT w, cnt, length(w) AS wl, p
                  FROM wp_words_v
                  LATERAL VIEW explode(sequence(1, length(w))) tp AS p
                 ) s
            JOIN wp_vocab_v v
              ON v.is_start = (s.p = 1)
             AND v.piece = substring(s.w, s.p, v.len)
            UNION ALL
            SELECT w, cnt, length(w) AS wl, 0 AS p, 0 AS len,
                   '' AS piece
            FROM wp_words_v
        """).repartition(n_part, "w")

    edges = cached_barrier_view(spark, sf_dir, "wp_edges_v", build_edges)
    # The kernel REQUIRES every candidate row of a word to land in one
    # partition. The barrier's parquet round-trip happens to preserve
    # the pre-barrier repartition(n_part, 'w') 1:1 today, but nothing
    # guarantees that across AQE/materialization changes — so re-hash
    # explicitly here. The relation is vocabulary-sized; the guard
    # shuffle is cheap. (ADVICE r9)
    spark.table(edges).repartition(n_part, "w").mapInPandas(
        _wordpiece_kernel, schema="piece string, part long"
    ).createOrReplaceTempView("wp_piece_parts")
    return spark.sql(f"""
        SELECT piece, CAST(SUM(part) AS BIGINT) AS n_occurrences
        FROM wp_piece_parts
        GROUP BY piece
        ORDER BY n_occurrences DESC, piece
        LIMIT {WP_TOP_K}
    """)


def _wordpiece_duck_sql() -> str:
    parts = [
        """wp_words AS (
            SELECT word AS w, COUNT(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word != ''
            GROUP BY word
        )""",
        "wp_vocab AS ("
        + _wp_vocab_sql("wp_words").replace(
            "{POS_EXPLODE}",
            ", unnest(range(1, length(w) + 1)) AS t1(p),"
            f" unnest(range(1, {WP_MAXLEN + 1})) AS t2(l)",
        )
        + ")",
        "wp_st0 AS (SELECT w, cnt, w AS rem, true AS is_start FROM wp_words)",
    ]
    sel_emits = []
    for r in range(1, WP_MAX_PIECES + 1):
        parts.append(
            f"wp_m{r} AS ({_wp_round_sql(f'wp_st{r - 1}', 'wp_vocab')})"
        )
        parts.append(f"wp_e{r} AS ({_WP_EMIT.format(m=f'wp_m{r}')})")
        parts.append(f"wp_st{r} AS ({_WP_NEXT.format(m=f'wp_m{r}')})")
        sel_emits.append(f"SELECT piece, cnt FROM wp_e{r}")
    sel_emits.append(
        f"SELECT '[TRUNC]' AS piece, cnt FROM wp_st{WP_MAX_PIECES}"
        f" WHERE rem != ''"
    )
    return f"""
        WITH {", ".join(parts)}
        SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n_occurrences
        FROM ({" UNION ALL ".join(sel_emits)})
        GROUP BY piece
        ORDER BY n_occurrences DESC, piece
        LIMIT {WP_TOP_K}
    """


TOKENIZER_WORDPIECE_APPLY_SQL = _wordpiece_duck_sql()


# ---------------------------------------------------------------------------
# tokenizer_unigram_viterbi — SentencePiece-style unigram LM (hard-EM round)
# ---------------------------------------------------------------------------

UNI_MAXLEN = 10      # words truncate to 10 chars (the WP [TRUNC] discipline)
UNI_PIECE_MAX = 4    # candidate piece lengths 1..4
UNI_MIN_FREQ = 3     # seed-vocab frequency floor (single chars always kept)
UNI_TOPK = 30


def _uni_vocab_sql(subs_rel: str) -> str:
    """Seed unigram vocabulary: substring candidates above the
    frequency floor plus ALL single characters (the SentencePiece
    character-coverage guarantee — every word stays segmentable), each
    scored ln(pf / total) in exact micro-nats over the kept set."""
    return f"""
        SELECT piece, pf,
               CAST(round(ln(pf / CAST(tot AS DOUBLE)) * 1e6) AS BIGINT)
                   AS score
        FROM (
            SELECT piece, pf, SUM(pf) OVER () AS tot
            FROM (
                SELECT piece, CAST(SUM(cnt) AS BIGINT) AS pf
                FROM {subs_rel}
                GROUP BY piece
            ) counted
            WHERE pf >= {UNI_MIN_FREQ} OR length(piece) = 1
        ) kept
    """


def _uni_fwd_sql(edges_rel: str, prev_rel: str, j: int) -> str:
    """One Viterbi forward step: best[{j}] = max over in-edges (i → {j})
    of best[i] + ln p(piece), argmax row kept with the deterministic
    (score, longer-piece, piece, i) tie-break."""
    return f"""
        SELECT w, j, s, from_i, piece FROM (
            SELECT e.w, CAST({j} AS INTEGER) AS j,
                   p.s + e.score AS s, e.i AS from_i, e.piece,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.w
                       ORDER BY p.s + e.score DESC,
                                length(e.piece) DESC, e.piece, e.i) AS rk
            FROM {edges_rel} e
            JOIN {prev_rel} p ON p.w = e.w AND p.j = e.i
            WHERE e.j = {j}
        ) ranked WHERE rk = 1
    """


def _uni_hop_sql(cur_rel: str, states_rel: str) -> str:
    """One backtrack hop: read the argmax choice ending at the current
    position, emit its piece, move to the choice's start."""
    return f"""
        SELECT c.w, c.cnt, b.from_i AS cur, b.piece
        FROM {cur_rel} c
        JOIN {states_rel} b ON b.w = c.w AND b.j = c.cur
        WHERE c.cur > 0
    """


_UNI_RESULT_SQL = """
    SELECT piece,
           CAST(expected_count AS BIGINT) AS expected_count,
           CAST(round(ln(expected_count / tot) * 1e6)
                AS BIGINT) AS m_step_score_micro
    FROM (SELECT piece, SUM(cnt) AS expected_count
          FROM {pieces} GROUP BY piece) agg
    CROSS JOIN (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot
                FROM {pieces}) t
    ORDER BY expected_count DESC, piece
    LIMIT {topk}
"""


def _viterbi_kernel(batches):
    """Arrow-batched Viterbi DP over one w-hash partition: a bit-exact
    replica of the staged forward/backtrack SQL (``_uni_fwd_sql`` /
    ``_uni_hop_sql``), vectorized across every word in the partition.
    Scores are exact BIGINT micro-nat sums, the per-stage argmax uses
    the SQL's (s DESC, piece-length DESC, piece ASC, i ASC) tie-break
    via a stable pandas sort (UTF-8 byte order == code-point order, so
    string comparison agrees with both engines' binary collation), and
    the backtrack emits (piece, word-count) exactly like the hop
    stages. Emits per-piece PARTIAL counts for the global aggregate."""
    import numpy as np
    import pandas as pd

    frames = list(batches)
    if not frames:
        return
    df = pd.concat(frames, ignore_index=True)
    codes, uniq = pd.factorize(df["w"])
    nw = len(uniq)
    wlen = np.minimum(
        np.fromiter((len(s) for s in uniq), dtype=np.int64, count=nw),
        UNI_MAXLEN,
    )
    cnt_by_word = np.zeros(nw, np.int64)
    cnt_by_word[codes] = df["cnt"].to_numpy()
    ei = df["i"].to_numpy(np.int64)
    ej = df["j"].to_numpy(np.int64)
    sc = df["score"].to_numpy(np.int64)
    plen = df["piece"].str.len().to_numpy(np.int64)
    piece = df["piece"].to_numpy()

    best = np.zeros((nw, UNI_MAXLEN + 1), np.int64)
    valid = np.zeros((nw, UNI_MAXLEN + 1), bool)
    from_i = np.zeros((nw, UNI_MAXLEN + 1), np.int64)
    best_piece = np.empty((nw, UNI_MAXLEN + 1), object)
    valid[:, 0] = True
    for j in range(1, UNI_MAXLEN + 1):
        mask = (ej == j) & valid[codes, ei]
        if not mask.any():
            continue
        c = codes[mask]
        cand = pd.DataFrame({
            "c": c,
            "s": best[c, ei[mask]] + sc[mask],
            "pl": plen[mask],
            "p": piece[mask],
            "i": ei[mask],
        })
        cand.sort_values(
            ["c", "s", "pl", "p", "i"],
            ascending=[True, False, False, True, True],
            inplace=True, kind="mergesort",
        )
        top = cand.drop_duplicates("c", keep="first")
        cc = top["c"].to_numpy()
        best[cc, j] = top["s"].to_numpy()
        valid[cc, j] = True
        from_i[cc, j] = top["i"].to_numpy()
        best_piece[cc, j] = top["p"].to_numpy()

    # backtrack: emit the argmax piece at each hop, inner-join
    # semantics (a word whose state is missing drops out, matching
    # _uni_hop_sql)
    out_pieces, out_cnts = [], []
    cur = wlen.copy()
    idx = np.nonzero(cur > 0)[0]
    while idx.size:
        v = valid[idx, cur[idx]]
        idx = idx[v]
        if not idx.size:
            break
        out_pieces.append(best_piece[idx, cur[idx]])
        out_cnts.append(cnt_by_word[idx])
        cur[idx] = from_i[idx, cur[idx]]
        idx = idx[cur[idx] > 0]
    if not out_pieces:
        return
    emitted = pd.DataFrame({
        "piece": np.concatenate(out_pieces),
        "part": np.concatenate(out_cnts),
    })
    yield emitted.groupby("piece", as_index=False)["part"].sum()


def tokenizer_unigram_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style unigram-LM tokenizer, one hard-EM round
    (Kudo 2018, Viterbi variant): seed piece probabilities from
    corpus substring frequencies, segment every word by exact Viterbi
    DP under those scores (best[j] = max over pieces ending at j of
    best[i] + ln p), then re-estimate piece scores from the chosen
    segmentations — the E-step counts and M-step scores of unigram
    training, with the soft forward-backward replaced by the argmax
    path (hard EM, the standard fast variant). Completes the tokenizer
    tier: BPE trains by merges, WordPiece encodes greedily, unigram
    segments GLOBALLY OPTIMALLY per word.

    Exactness: scores are micro-nat integers (ln evaluated once per
    vocab piece on exact counts); the DP is pure BIGINT addition with
    a fully deterministic argmax tie-break, so both engines replay
    identical paths and the DuckDB oracle unrolls the same
    {UNI_MAXLEN} forward + {UNI_MAXLEN} backtrack stages.

    Scale posture (round-8 redesign, the soft-EM lesson applied to the
    hard-EM path): the Viterbi DP is PER-WORD LOCAL — each word's
    lattice touches only its own ≤{UNI_MAXLEN}·{UNI_PIECE_MAX} edges —
    so the earlier 10 forward + 10 backtrack cluster-wide stages (each
    a reliable checkpoint: ~4 s of pure barrier-write fixed cost at
    ANY scale) were overhead. The scored edge relation is built once
    off the shared token barrier, hash-partitioned by word, and
    checkpointed; ONE ``mapInPandas`` pass (``_viterbi_kernel``, the
    bit-exact numpy/pandas replica of the stage SQL) runs the whole DP
    and backtrack per partition, emitting per-piece partial counts;
    one piece-keyed aggregate + top-k finishes. The 2×{UNI_MAXLEN}
    stage unroll remains, verbatim, as the DuckDB oracle."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    view = _toks_view(spark, sf_dir)
    from mongo_to_clickhouse_spark.session import shuffle_partition_count

    n_part = shuffle_partition_count(spark)

    def build_edges():
        spark.sql(f"""
            SELECT substring(word, 1, {UNI_MAXLEN}) AS w,
                   CAST(SUM(cnt) AS BIGINT) AS cnt
            FROM (SELECT word, COUNT(*) AS cnt
                  FROM (SELECT explode(toks) AS word FROM {view})
                  WHERE word != '' GROUP BY word) full_words
            GROUP BY substring(word, 1, {UNI_MAXLEN})
        """).createOrReplaceTempView("uni_words_v")
        spark.sql(f"""
            SELECT w, cnt, i, i + l AS j, substring(w, i + 1, l) AS piece
            FROM uni_words_v
            LATERAL VIEW explode(sequence(0, {UNI_MAXLEN - 1})) AS i
            LATERAL VIEW explode(sequence(1, {UNI_PIECE_MAX})) AS l
            WHERE i + l <= length(w)
        """).createOrReplaceTempView("uni_subs_v")
        spark.sql(_uni_vocab_sql("uni_subs_v")).createOrReplaceTempView(
            "uni_vocab_v"
        )
        # cnt rides along so the backtrack emission needs no second
        # join against the word table (the soft-EM edge shape)
        return spark.sql("""
            SELECT /*+ BROADCAST(v) */ s.w, s.cnt, s.i, s.j, s.piece,
                   v.score
            FROM uni_subs_v s JOIN uni_vocab_v v ON v.piece = s.piece
        """).repartition(n_part, "w")

    edges = cached_barrier_view(spark, sf_dir, "uni_edges_v", build_edges)
    spark.table(edges).mapInPandas(
        _viterbi_kernel, schema="piece string, part long"
    ).createOrReplaceTempView("vit_piece_parts")
    return spark.sql(_UNI_RESULT_SQL.format(
        pieces="(SELECT piece, part AS cnt FROM vit_piece_parts)",
        topk=UNI_TOPK,
    ))


def _unigram_duck_sql() -> str:
    parts = [
        f"""uni_words AS MATERIALIZED (
            SELECT substring(word, 1, {UNI_MAXLEN}) AS w,
                   CAST(SUM(cnt) AS BIGINT) AS cnt
            FROM (SELECT word, COUNT(*) AS cnt
                  FROM (SELECT unnest(string_split(text, ' ')) AS word
                        FROM documents) uw
                  WHERE word != '' GROUP BY word) full_words
            GROUP BY substring(word, 1, {UNI_MAXLEN})
        )""",
        f"""uni_subs AS MATERIALIZED (
            SELECT w, cnt, i, i + l AS j, substring(w, i + 1, l) AS piece
            FROM uni_words,
                 unnest(range(0, {UNI_MAXLEN})) AS ti(i),
                 unnest(range(1, {UNI_PIECE_MAX + 1})) AS tl(l)
            WHERE i + l <= length(w)
        )""",
        f"uni_vocab AS MATERIALIZED ({_uni_vocab_sql('uni_subs')})",
        """uni_edges AS MATERIALIZED (
            SELECT s.w, s.i, s.j, s.piece, v.score
            FROM uni_subs s JOIN uni_vocab v ON v.piece = s.piece
        )""",
        """uni_f0 AS MATERIALIZED (
            SELECT DISTINCT w, CAST(0 AS INTEGER) AS j,
                   CAST(0 AS BIGINT) AS s, CAST(0 AS INTEGER) AS from_i,
                   '' AS piece FROM uni_edges
        )""",
    ]
    for j in range(1, UNI_MAXLEN + 1):
        prev = " UNION ALL ".join(
            f"SELECT w, j, s FROM uni_f{i}"
            for i in range(max(0, j - UNI_PIECE_MAX), j)
        )
        parts.append(
            f"uni_f{j} AS MATERIALIZED "
            f"({_uni_fwd_sql('uni_edges', f'({prev})', j)})"
        )
    states = " UNION ALL ".join(
        f"SELECT w, j, from_i, piece FROM uni_f{j}"
        for j in range(1, UNI_MAXLEN + 1)
    )
    parts.append(f"uni_states AS MATERIALIZED ({states})")
    parts.append(f"""uni_cur0 AS MATERIALIZED (
        SELECT w, cnt, CAST(LEAST(length(w), {UNI_MAXLEN}) AS INTEGER)
                   AS cur
        FROM uni_words
    )""")
    emits = []
    for r in range(1, UNI_MAXLEN + 1):
        parts.append(
            f"uni_hop{r} AS MATERIALIZED "
            f"({_uni_hop_sql(f'uni_cur{r - 1}', 'uni_states')})"
        )
        emits.append(f"SELECT piece, cnt FROM uni_hop{r}")
        parts.append(
            f"uni_cur{r} AS MATERIALIZED "
            f"(SELECT w, cnt, cur FROM uni_hop{r})"
        )
    return (
        f"WITH {', '.join(parts)} "
        + _UNI_RESULT_SQL.format(
            pieces="(" + " UNION ALL ".join(emits) + ")", topk=UNI_TOPK
        )
    )


TOKENIZER_UNIGRAM_VITERBI_SQL = _unigram_duck_sql()


# ---------------------------------------------------------------------------
# tokenizer_unigram_em_soft — forward-backward (soft-EM) expected counts
# ---------------------------------------------------------------------------


def _em_legs(edges_rel: str, prefix: str, idxs: list[int],
             edge_pos: str, state_col: str,
             alias: str = "q") -> tuple[str, str]:
    """≤{UNI_PIECE_MAX} LEFT-JOIN legs against the individual stage
    relations instead of a UNION of them: checkpointing a plan that
    UNIONs checkpointed leaves trips a Spark attribute-rebinding bug
    (NoSuchElementException: key not found) — separate join legs with
    a COALESCE pick (exactly one matches per edge, selected by the
    edge's own position) express the same message sum union-free."""
    legs, picks = [], []
    for n, i in enumerate(idxs):
        legs.append(
            f"LEFT JOIN {prefix}{i} {alias}{n}"
            f" ON {alias}{n}.w = e.w AND e.{edge_pos} = {i}"
        )
        picks.append(f"{alias}{n}.{state_col}")
    return " ".join(legs), f"COALESCE({', '.join(picks)})"


# block-floating-point message representation: value = m · 2^(20·(x−1))
# with mantissa m normalized into [2^20, 2^40). Base-2 shifts are EXACT
# integer ops in both engines, so the dynamic range of a joint
# word-probability (p^10 underflows any fixed-point scale) costs no
# determinism — the engineered alternative to floats whose shuffle-order
# partial sums don't reproduce.
_EM_LO = 1 << 20
_EM_HI = 1 << 40


def _shr(engine: str, v: str, n: str) -> str:
    if engine == "spark":
        return f"shiftright(CAST({v} AS BIGINT), CAST({n} AS INT))"
    return f"(({v}) >> ({n}))"


def _em_msg_sql(engine: str, edges_rel: str, prefix: str,
                edge_pos: str, other_pos: str, j: int,
                idxs: list[int]) -> str:
    """One message stage (shared by α and β): per edge, the incoming
    state (m, x) times the edge weight p2 (base-2 micro), renormalized;
    terms aligned to the group's max exponent by exact truncating
    shifts; integer sum; one final renormalize. The incoming states
    join as per-index legs (see _em_legs)."""
    shr = lambda v, n: _shr(engine, v, n)  # noqa: E731
    legs, m_pick = _em_legs(edges_rel, prefix, idxs, edge_pos, "m")
    _, x_pick = _em_legs(edges_rel, prefix, idxs, edge_pos, "x")
    return f"""
        SELECT w, CAST({j} AS INTEGER) AS j,
               CASE WHEN msum >= {_EM_HI}
                    THEN CAST({shr("msum", "20")} AS BIGINT)
                    ELSE msum END AS m,
               CAST(CASE WHEN msum >= {_EM_HI} THEN xg + 1
                         ELSE xg END AS INTEGER) AS x
        FROM (
            SELECT w, CAST(SUM({shr("tm",
                                    "LEAST(20 * (xmax - tx), 62)")})
                           AS BIGINT) AS msum,
                   MAX(xmax) AS xg
            FROM (
                SELECT w, tm, tx, MAX(tx) OVER (PARTITION BY w) AS xmax
                FROM (
                    SELECT w,
                           CASE WHEN raw >= {_EM_HI}
                                THEN CAST({shr("raw", "20")} AS BIGINT)
                                ELSE raw END AS tm,
                           CASE WHEN raw >= {_EM_HI} THEN px
                                ELSE px - 1 END AS tx
                    FROM (
                        SELECT e.w, ({m_pick}) * e.p2 AS raw,
                               ({x_pick}) AS px
                        FROM {edges_rel} e
                        {legs}
                        WHERE e.{other_pos} = {j}
                          AND ({m_pick}) IS NOT NULL
                    ) t0
                ) t1
            ) t2
            GROUP BY w
        ) t3
    """


def _em_alpha_sql(engine: str, edges_rel: str, prefix: str,
                  j: int) -> str:
    """Forward message: α_j = Σ over in-edges α_i · p(piece)."""
    idxs = list(range(max(0, j - UNI_PIECE_MAX), j))
    return _em_msg_sql(engine, edges_rel, prefix, "i", "j", j, idxs)


def _em_beta_sql(engine: str, edges_rel: str, prefix: str,
                 wlen_rel: str, j: int) -> str:
    """Backward message: β_j = Σ over out-edges p(piece) · β_{i+l};
    the word's own final position initializes at exactly 1.0 (m = 2^20,
    x = 0). The init rides the word-length base with the aggregate
    LEFT-joined — never a UNION (see _em_legs) — and a word of length
    {j} has no out-edges from {j}, so the CASE branches are disjoint."""
    idxs = list(range(j + 1, min(j + UNI_PIECE_MAX, UNI_MAXLEN) + 1))
    inner = _em_msg_sql(engine, edges_rel, prefix, "j", "i", j, idxs)
    return f"""
        SELECT l.w, CAST({j} AS INTEGER) AS j,
               CASE WHEN l.wl = {j} THEN CAST({_EM_LO} AS BIGINT)
                    ELSE s.m END AS m,
               CAST(CASE WHEN l.wl = {j} THEN 0 ELSE s.x END
                    AS INTEGER) AS x
        FROM {wlen_rel} l
        LEFT JOIN ({inner}) s ON s.w = l.w
        WHERE l.wl = {j} OR s.m IS NOT NULL
    """


def _em_posterior_sql(engine: str, edges_rel: str, alpha_prefix: str,
                      beta_prefix: str, wlen_rel: str,
                      words_rel: str) -> str:
    """Edge posterior γ = α_i·p·β_j / α_L (the expected number of times
    the piece is used in the word under the current model), assembled
    from the block-float messages: the mantissa ratio is one double
    expression over exact integers and the exponent re-enters through
    pow(2, 20k) — EXACT powers of two in IEEE doubles, so the scale
    factor costs no rounding at all. The stage relations join as
    per-index legs, not a union view — the final plan would otherwise
    re-trip the union-of-checkpoints bug at collect time."""
    shr = lambda v, n: _shr(engine, v, n)  # noqa: E731
    a_legs, am_pick = _em_legs(edges_rel, alpha_prefix,
                               list(range(0, UNI_MAXLEN)), "i", "m",
                               alias="pa")
    _, ax_pick = _em_legs(edges_rel, alpha_prefix,
                          list(range(0, UNI_MAXLEN)), "i", "x",
                          alias="pa")
    b_legs, bm_pick = _em_legs(edges_rel, beta_prefix,
                               list(range(1, UNI_MAXLEN + 1)), "j", "m",
                               alias="pb")
    _, bx_pick = _em_legs(edges_rel, beta_prefix,
                          list(range(1, UNI_MAXLEN + 1)), "j", "x",
                          alias="pb")
    al_legs, alm_pick, alx_pick = [], [], []
    for i in range(1, UNI_MAXLEN + 1):
        al_legs.append(
            f"LEFT JOIN {alpha_prefix}{i} r{i}"
            f" ON r{i}.w = l.w AND l.wl = {i}"
        )
        alm_pick.append(f"r{i}.m")
        alx_pick.append(f"r{i}.x")
    return f"""
        alpha_l AS (
            SELECT l.w, COALESCE({", ".join(alm_pick)}) AS alm,
                   COALESCE({", ".join(alx_pick)}) AS alx
            FROM {wlen_rel} l
            {" ".join(al_legs)}
            WHERE COALESCE({", ".join(alm_pick)}) > 0
        ),
        posterior AS (
            SELECT e.w, e.piece,
                   CAST(round(
                       CAST({shr(f"(({am_pick}) * e.p2)", "20")}
                            AS DOUBLE)
                       * ({bm_pick}) / (1e0 * al.alm)
                       * pow(CAST(2 AS DOUBLE),
                             CAST(20 * (({ax_pick}) + ({bx_pick})
                                        - al.alx) - 20 AS DOUBLE))
                       * 1e6) AS BIGINT) AS e_micro
            FROM {edges_rel} e
            {a_legs}
            {b_legs}
            JOIN alpha_l al ON al.w = e.w
            WHERE ({am_pick}) IS NOT NULL AND ({bm_pick}) IS NOT NULL
        ),
        ecounts AS (
            SELECT p.piece,
                   CAST(SUM(wd.cnt * p.e_micro) AS BIGINT)
                       AS e_count_micro
            FROM posterior p JOIN {words_rel} wd ON wd.w = p.w
            GROUP BY p.piece
            HAVING SUM(wd.cnt * p.e_micro) > 0
        )
        SELECT piece, e_count_micro,
               CAST(round(ln(e_count_micro / tot) * 1e6) AS BIGINT)
                   AS m_step_score_micro
        FROM ecounts
        CROSS JOIN (SELECT CAST(SUM(e_count_micro) AS DOUBLE) AS tot
                    FROM ecounts) t
        ORDER BY e_count_micro DESC, piece
        LIMIT {UNI_TOPK}
    """


def _em_soft_kernel(batches):
    """Arrow-batched forward-backward over one w-hash partition: a
    bit-exact numpy replica of the staged block-floating-point message
    SQL (``_em_msg_sql`` / ``_em_beta_sql`` / ``_em_posterior_sql``),
    vectorized across every word in the partition at once. Integer
    shifts/sums replicate exactly; the single per-edge double
    expression evaluates in the oracle's operation order, so the result
    hash-matches the DuckDB stage unroll. Emits per-piece PARTIAL
    expected counts (map-side combine) for the downstream global
    aggregate."""
    import numpy as np
    import pandas as pd

    frames = list(batches)
    if not frames:
        return
    df = pd.concat(frames, ignore_index=True)
    codes, uniq = pd.factorize(df["w"])
    nw = len(uniq)
    wlen = np.fromiter((len(s) for s in uniq), dtype=np.int64, count=nw)
    ei = df["i"].to_numpy().astype(np.int64)
    ej = df["j"].to_numpy().astype(np.int64)
    p2 = df["p2"].to_numpy().astype(np.int64)
    cnt = df["cnt"].to_numpy().astype(np.int64)

    neg = np.iinfo(np.int64).min

    def message_stage(sel_pos, state_pos, st_m, st_x, st_v, j):
        """One α/β message stage: edges at ``sel_pos == j`` pull the
        incoming state at their ``state_pos`` index, multiply by p2,
        renormalize per term, align to the per-word max exponent by
        exact truncating shifts, integer-sum, renormalize the sum —
        mechanically the _em_msg_sql pipeline."""
        mask = (sel_pos == j) & st_v[codes, state_pos]
        if not mask.any():
            return None
        c = codes[mask]
        sp = state_pos[mask]
        raw = st_m[c, sp] * p2[mask]
        px = st_x[c, sp]
        hi = raw >= _EM_HI
        tm = np.where(hi, raw >> 20, raw)
        tx = np.where(hi, px, px - 1)
        xmax = np.full(nw, neg)
        np.maximum.at(xmax, c, tx)
        shift = np.minimum(20 * (xmax[c] - tx), 62)
        msum = np.zeros(nw, np.int64)
        np.add.at(msum, c, tm >> shift)
        has = xmax > neg
        big = msum >= _EM_HI
        m = np.where(big, msum >> 20, msum)
        x = np.where(big, xmax + 1, xmax)
        return has, m, x

    # forward: α_0 = (2^20, 0) for every word
    a_m = np.zeros((nw, UNI_MAXLEN + 1), np.int64)
    a_x = np.zeros((nw, UNI_MAXLEN + 1), np.int64)
    a_v = np.zeros((nw, UNI_MAXLEN + 1), bool)
    a_m[:, 0] = _EM_LO
    a_v[:, 0] = True
    for j in range(1, UNI_MAXLEN + 1):
        got = message_stage(ej, ei, a_m, a_x, a_v, j)
        if got is None:
            continue
        has, m, x = got
        a_m[:, j] = m
        a_x[:, j] = x
        a_v[:, j] = has

    # backward: β at the word's own final position initializes to
    # exactly 1.0 (m = 2^20, x = 0); no out-edges start there, so the
    # init rows and computed rows are disjoint (see _em_beta_sql)
    b_m = np.zeros((nw, UNI_MAXLEN + 1), np.int64)
    b_x = np.zeros((nw, UNI_MAXLEN + 1), np.int64)
    b_v = np.zeros((nw, UNI_MAXLEN + 1), bool)
    rows = np.arange(nw)
    b_m[rows, wlen] = _EM_LO
    b_v[rows, wlen] = True
    for j in range(UNI_MAXLEN - 1, -1, -1):
        got = message_stage(ei, ej, b_m, b_x, b_v, j)
        if got is None:
            continue
        has, m, x = got
        idx = np.nonzero(has)[0]
        b_m[idx, j] = m[idx]
        b_x[idx, j] = x[idx]
        b_v[idx, j] = True

    # posterior γ per edge = α_i·p·β_j / α_L in the oracle's exact
    # double-expression order (mantissa ratio × an exact power of two)
    al_m = a_m[rows, wlen]
    al_x = a_x[rows, wlen]
    al_v = a_v[rows, wlen] & (al_m > 0)
    pm = a_v[codes, ei] & b_v[codes, ej] & al_v[codes]
    if not pm.any():
        return
    c = codes[pm]
    am = a_m[c, ei[pm]]
    ax = a_x[c, ei[pm]]
    bm = b_m[c, ej[pm]]
    bx = b_x[c, ej[pm]]
    num = ((am * p2[pm]) >> 20).astype(np.float64)
    val = (num * bm.astype(np.float64)
           / (1.0 * al_m[c].astype(np.float64))
           * np.power(2.0, (20 * (ax + bx - al_x[c]) - 20)
                      .astype(np.float64))
           * 1e6)
    e_micro = np.floor(val + 0.5).astype(np.int64)
    part = pd.DataFrame(
        {"piece": df["piece"].to_numpy()[pm],
         "part": cnt[pm] * e_micro}
    ).groupby("piece", sort=False, as_index=False)["part"].sum()
    yield part


def tokenizer_unigram_em_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM SOFT EM round (full forward-backward, Kudo 2018 §3.2
    proper): expected piece counts marginalize over ALL segmentations
    of every word — the E-step SentencePiece actually trains with,
    next to ``tokenizer_unigram_viterbi``'s argmax-path variant. The
    lattice messages α (prefix mass) and β (suffix mass) propagate in
    MICRO-PROBABILITY INTEGERS (block floating point, base-2 shifts)
    with a truncating rescale per stage: integer addition commutes
    exactly, so the notorious non-reproducibility of distributed
    forward-backward (float partial sums in shuffle order) is
    engineered out, and the DuckDB oracle replays the identical
    {UNI_MAXLEN}+{UNI_MAXLEN} message stages. Edge probabilities
    quantize once (exp of the micro-nat seed score, floored at 1 micro
    so coverage paths never vanish).

    Scale posture (round-7 redesign): the lattice DP is PER-WORD LOCAL
    — each word's forward-backward touches only its own ≤{UNI_MAXLEN}·
    {UNI_PIECE_MAX} edges — so distributing it as 2·{UNI_MAXLEN}
    cluster-wide join stages (the round-6 shape: 63 shuffles, 58 SMJs
    in the posterior alone, ~8 s at sf0.1) was pure overhead. The edge
    relation is built once, hash-partitioned by word, and checkpointed;
    ONE ``mapInPandas`` pass runs the whole vectorized DP per partition
    (``_em_soft_kernel`` — the numpy replica of the oracle's stage SQL,
    bit-exact in its integer shifts and double expression), emitting
    per-piece partial expected counts; one piece-keyed aggregate
    finishes. Total: 2 data shuffles (edge build + piece aggregate) and
    a top-k — the plan shape survives 100×: per-partition memory is
    bounded by the edge-relation partition size, which the explicit
    repartition count controls. The staged join formulation remains,
    verbatim, as the DuckDB oracle (engine='duck' branches of
    _em_msg_sql/_em_beta_sql/_em_posterior_sql)."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    view = _toks_view(spark, sf_dir)
    from mongo_to_clickhouse_spark.session import shuffle_partition_count

    n_part = shuffle_partition_count(spark)

    def build_edges_pc():
        spark.sql(f"""
            SELECT substring(word, 1, {UNI_MAXLEN}) AS w,
                   CAST(SUM(cnt) AS BIGINT) AS cnt
            FROM (SELECT word, COUNT(*) AS cnt
                  FROM (SELECT explode(toks) AS word FROM {view})
                  WHERE word != '' GROUP BY word) full_words
            GROUP BY substring(word, 1, {UNI_MAXLEN})
        """).createOrReplaceTempView("uni_words_c")
        spark.sql(f"""
            SELECT w, cnt, i, i + l AS j, substring(w, i + 1, l) AS piece
            FROM uni_words_c
            LATERAL VIEW explode(sequence(0, {UNI_MAXLEN - 1})) AS i
            LATERAL VIEW explode(sequence(1, {UNI_PIECE_MAX})) AS l
            WHERE i + l <= length(w)
        """).createOrReplaceTempView("uni_subs_c")
        spark.sql(_uni_vocab_sql("uni_subs_c")).createOrReplaceTempView(
            "uni_vocab_c"
        )
        # cnt rides along so the expected-count weighting needs no
        # second join against the word table downstream
        return spark.sql("""
            SELECT /*+ BROADCAST(v) */ s.w, s.cnt, s.i, s.j, s.piece,
                   GREATEST(CAST(round(exp(v.score / 1e6) * 1048576.0)
                                 AS BIGINT), 1) AS p2
            FROM uni_subs_c s JOIN uni_vocab_c v ON v.piece = s.piece
        """).repartition(n_part, "w")

    edges = cached_barrier_view(
        spark, sf_dir, "uni_edges_pc", build_edges_pc
    )
    parts = spark.table(edges).mapInPandas(
        _em_soft_kernel, schema="piece string, part long"
    )
    parts.createOrReplaceTempView("em_piece_parts")
    return spark.sql(f"""
        SELECT piece, e_count_micro,
               CAST(round(ln(e_count_micro / tot) * 1e6) AS BIGINT)
                   AS m_step_score_micro
        FROM (
            SELECT piece, CAST(SUM(part) AS BIGINT) AS e_count_micro
            FROM em_piece_parts
            GROUP BY piece
            HAVING SUM(part) > 0
        ) ecounts
        CROSS JOIN (
            SELECT CAST(SUM(part) AS DOUBLE) AS tot
            FROM (
                SELECT CAST(SUM(part) AS BIGINT) AS part
                FROM em_piece_parts GROUP BY piece
                HAVING SUM(part) > 0
            )
        ) t
        ORDER BY e_count_micro DESC, piece
        LIMIT {UNI_TOPK}
    """)


def _unigram_em_duck_sql() -> str:
    parts = [
        f"""uni_words AS MATERIALIZED (
            SELECT substring(word, 1, {UNI_MAXLEN}) AS w,
                   CAST(SUM(cnt) AS BIGINT) AS cnt
            FROM (SELECT word, COUNT(*) AS cnt
                  FROM (SELECT unnest(string_split(text, ' ')) AS word
                        FROM documents) uw
                  WHERE word != '' GROUP BY word) full_words
            GROUP BY substring(word, 1, {UNI_MAXLEN})
        )""",
        f"""uni_subs AS MATERIALIZED (
            SELECT w, cnt, i, i + l AS j, substring(w, i + 1, l) AS piece
            FROM uni_words,
                 unnest(range(0, {UNI_MAXLEN})) AS ti(i),
                 unnest(range(1, {UNI_PIECE_MAX + 1})) AS tl(l)
            WHERE i + l <= length(w)
        )""",
        f"uni_vocab AS MATERIALIZED ({_uni_vocab_sql('uni_subs')})",
        """uni_edges_p AS MATERIALIZED (
            SELECT s.w, s.i, s.j, s.piece,
                   GREATEST(CAST(round(exp(v.score / 1e6) * 1048576.0)
                                 AS BIGINT), 1) AS p2
            FROM uni_subs s JOIN uni_vocab v ON v.piece = s.piece
        )""",
        f"""em_wlen AS MATERIALIZED (
            SELECT w, CAST(LEAST(length(w), {UNI_MAXLEN}) AS INTEGER)
                       AS wl
            FROM uni_words
        )""",
        """em_a0 AS MATERIALIZED (
            SELECT w, CAST(0 AS INTEGER) AS j,
                   CAST(1048576 AS BIGINT) AS m,
                   CAST(0 AS INTEGER) AS x FROM uni_words
        )""",
    ]
    for j in range(1, UNI_MAXLEN + 1):
        parts.append(
            f"em_a{j} AS MATERIALIZED "
            f"({_em_alpha_sql('duck', 'uni_edges_p', 'em_a', j)})"
        )
    parts.append(f"""em_b{UNI_MAXLEN} AS MATERIALIZED (
        SELECT w, CAST({UNI_MAXLEN} AS INTEGER) AS j,
               CAST({_EM_LO} AS BIGINT) AS m,
               CAST(0 AS INTEGER) AS x FROM em_wlen
        WHERE wl = {UNI_MAXLEN}
    )""")
    for j in range(UNI_MAXLEN - 1, -1, -1):
        parts.append(
            f"em_b{j} AS MATERIALIZED "
            f"({_em_beta_sql('duck', 'uni_edges_p', 'em_b', 'em_wlen', j)})"
        )
    return (
        f"WITH {', '.join(parts)}, "
        + _em_posterior_sql(
            "duck", "uni_edges_p", "em_a", "em_b", "em_wlen", "uni_words"
        )
    )


TOKENIZER_UNIGRAM_EM_SOFT_SQL = _unigram_em_duck_sql()


# ---------------------------------------------------------------------------
# tokenizer_vocab_coverage_curve — occurrence coverage vs vocab size
# ---------------------------------------------------------------------------

VOCAB_CURVE_KS = (64, 256, 1024, 4096)


def _vocab_curve_tail_sql(ranked_rel: str, intdiv: str) -> str:
    """Shared back half: given (freq, rk) token types ranked by
    (freq DESC, word), emit one row per candidate vocab size K with the
    share of token OCCURRENCES a top-K vocabulary covers — the curve a
    tokenizer team reads to pick vocab size (the Zipf head covers most
    mass; the tail buys OOV headroom). One pass computes every K's
    conditional sum; coverage in exact ppm."""
    cover_cols = ", ".join(
        f"CAST(SUM(CASE WHEN rk <= {k} THEN freq ELSE 0 END) AS BIGINT)"
        f" AS c{k}"
        for k in VOCAB_CURVE_KS
    )
    case_cov = " ".join(
        f"WHEN {k} THEN c{k}" for k in VOCAB_CURVE_KS
    )
    values = ", ".join(f"({k})" for k in VOCAB_CURVE_KS)
    return f"""
        SELECT vocab_k,
               CAST(CASE WHEN vocab_k < n_types THEN vocab_k
                         ELSE n_types END AS BIGINT) AS n_types_in_vocab,
               CAST((CASE vocab_k {case_cov} END) * 1000000 {intdiv} total
                    AS BIGINT) AS covered_ppm,
               CAST(1000000 - (CASE vocab_k {case_cov} END) * 1000000
                    {intdiv} total AS BIGINT) AS oov_ppm
        FROM (
            SELECT CAST(SUM(freq) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_types, {cover_cols}
            FROM {ranked_rel}
        ) agg
        CROSS JOIN (SELECT * FROM (VALUES {values}) v(vocab_k)) ks
        ORDER BY vocab_k
    """


def tokenizer_vocab_coverage_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vocab-size coverage curve — see _vocab_curve_tail_sql.

    Scale posture: one wordcount aggregate (vocabulary-bounded,
    map-side combined) ranked by the two-pass distributed sort-rank
    (operators/rank.py — at web scale the vocabulary is billions of
    types and a global ROW_NUMBER window would serialize them through
    one task), landed on a checkpoint barrier; the curve itself is ONE
    pass of conditional sums over that relation fanned to
    {len(VOCAB_CURVE_KS)} rows by a literal VALUES join."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )
    from mongo_to_clickhouse_spark.operators.rank import (
        distributed_global_rank,
    )

    def build():
        from mongo_to_clickhouse_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        freq = (
            docs.selectExpr("explode(split(text, ' ')) AS word")
            .groupBy("word")
            .agg(F.count("*").cast("bigint").alias("freq"))
        )
        return distributed_global_rank(
            freq, [F.col("freq").desc(), F.col("word")], rank_col="rk"
        ).select("freq", "rk")

    cached_barrier_view(spark, sf_dir, "vocab_ranked", build)
    return spark.sql(_vocab_curve_tail_sql("vocab_ranked", "DIV"))


TOKENIZER_VOCAB_COVERAGE_CURVE_SQL = _vocab_curve_tail_sql(
    """(
        SELECT freq, row_number() OVER (ORDER BY freq DESC, word) AS rk
        FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
              FROM (SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents) w
              GROUP BY word) f
    )""",
    "//",
)


# ---------------------------------------------------------------------------
# tokenizer_sentencepiece_normalize — pre-tokenization text normalization
# ---------------------------------------------------------------------------


def _sp_normalize_body(engine: str) -> str:
    """The SentencePiece-style pre-tokenization normalization cascade
    applied in the only safe order — (1) unicode punctuation folding
    (curly quotes/dashes → ASCII), (2) whitespace-class folding
    (tab/newline/CR → space, via chr() codes: Spark's string-literal
    parser EATS unknown backslash escapes, so a '\\x0b'-style regex
    class silently becomes the char class [x0b…] — caught by the
    oracle), (3) lowercase, (4) space collapse + trim — with per-rule
    changed-document accounting and the corpus char delta: the report
    that tells a tokenizer team what each rule actually touches before
    they bake it into the model's normalizer spec.

    Exactness: pure string builtins (replace/regexp_replace/lower/
    trim); counts and char sums are exact integers.

    Scale posture: narrow maps over one documents scan (JVM codegen,
    no Python); the report is one |sources|-row aggregate."""
    rr = (
        (lambda p, r, s: f"regexp_replace({s}, '{p}', '{r}')")
        if engine == "spark"
        else (lambda p, r, s: f"regexp_replace({s}, '{p}', '{r}', 'g')")
    )
    quotes = (
        "replace(replace(replace(replace(replace(text,"
        " '‘', ''''), '’', ''''), '“', '\"'),"
        " '”', '\"'), '—', '-')"
    )
    ctrl = ("replace(replace(replace(s1, chr(9), ' '), chr(10), ' '),"
            " chr(13), ' ')")
    collapse = f"trim({rr(' +', ' ', 'lower(s2)')})"
    return f"""
        WITH staged AS (
            SELECT doc_id, source, text,
                   {quotes} AS s1
            FROM documents
        ),
        staged2 AS (
            SELECT doc_id, source, text, s1, {ctrl} AS s2 FROM staged
        ),
        normed AS (
            SELECT doc_id, source, text, s1, s2, {collapse} AS s3
            FROM staged2
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN s1 <> text THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_punct_folded,
               CAST(SUM(CASE WHEN s2 <> s1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_ws_folded,
               CAST(SUM(CASE WHEN s3 <> lower(s2) THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_ws_collapsed,
               CAST(SUM(CASE WHEN s3 <> text THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_changed,
               CAST(SUM(length(text)) AS BIGINT) AS chars_before,
               CAST(SUM(length(s3)) AS BIGINT) AS chars_after
        FROM normed
        GROUP BY source
        ORDER BY source
    """


def tokenizer_sentencepiece_normalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pre-tokenization normalization cascade — see _sp_normalize_body."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_sp_normalize_body("spark"))


TOKENIZER_SENTENCEPIECE_NORMALIZE_SQL = _sp_normalize_body("duck")


QUERIES = {
    "tokenizer_sentencepiece_normalize": (
        tokenizer_sentencepiece_normalize,
        TOKENIZER_SENTENCEPIECE_NORMALIZE_SQL,
    ),
    "tokenizer_unigram_em_soft": (
        tokenizer_unigram_em_soft,
        TOKENIZER_UNIGRAM_EM_SOFT_SQL,
    ),
    "tokenizer_unigram_viterbi": (
        tokenizer_unigram_viterbi,
        TOKENIZER_UNIGRAM_VITERBI_SQL,
    ),
    "tokenizer_vocab_coverage_curve": (
        tokenizer_vocab_coverage_curve,
        TOKENIZER_VOCAB_COVERAGE_CURVE_SQL,
    ),
    "tokenizer_wordpiece_apply": (
        tokenizer_wordpiece_apply,
        TOKENIZER_WORDPIECE_APPLY_SQL,
    ),
    "tokenizer_bpe_pair_counts": (
        tokenizer_bpe_pair_counts,
        TOKENIZER_BPE_PAIR_COUNTS_SQL,
    ),
    "tokenizer_bpe_merge_rounds": (
        tokenizer_bpe_merge_rounds,
        TOKENIZER_BPE_MERGE_ROUNDS_SQL,
    ),
    "tokenizer_bpe_apply": (tokenizer_bpe_apply, TOKENIZER_BPE_APPLY_SQL),
    "text_paragraph_dedup": (text_paragraph_dedup, TEXT_PARAGRAPH_DEDUP_SQL),
    "text_boilerplate_chunks": (
        text_boilerplate_chunks,
        TEXT_BOILERPLATE_CHUNKS_SQL,
    ),
    "corpus_quality_logreg": (corpus_quality_logreg, CORPUS_QUALITY_LOGREG_SQL),
}
