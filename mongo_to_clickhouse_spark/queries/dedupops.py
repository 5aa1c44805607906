"""Approximate-dedup operators: MinHash+LSH, SimHash, n-gram Jaccard.

Everything is deterministic — token hashes are md5-derived integers,
permutations are fixed (a·x + b) mod p universal hashes — so even these
"approximate" pipelines are exactly mirrored by DuckDB oracle SQL.

The fixture corpus has no real duplicates, so each pair-finding query runs
over a PLANTED corpus: every 50th document gets a mutated copy (first
token dropped, doc_id + 1,000,000) built identically in both engines. The
LSH/banding machinery then has true positives to find, and the oracle
verifies the whole chain end-to-end (shingle → signature → band →
bucket-join → verify).

Scale posture: the banding join is the whole point — candidate generation
is an equi-join on (band_idx, band_signature), never a quadratic pair
enumeration. Signatures are one explode + one groupBy per doc (shuffle
keyed by doc_id); band buckets are uniformly distributed md5 values, so
the join is skew-free. This is the 100 TB text-dedup architecture
(MinHashLSH as in Lee et al., "Deduplicating Training Data Makes Language
Models Better").
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from mongo_to_clickhouse_spark.io import load_table

P = 2_147_483_647  # 2^31 - 1, Mersenne prime for (a·x + b) mod p
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

_rng = np.random.RandomState(7)
A = [int(v) for v in _rng.randint(1, P - 1, N_HASHES)]
B = [int(v) for v in _rng.randint(0, P - 1, N_HASHES)]

SIMHASH_BITS = 32
JACCARD_THRESHOLD = 0.5
# 32-bit SimHash over a ~100-word shared vocabulary is collision-prone;
# a tight radius keeps the pair set meaningful (planted mutations land at
# hamming ≈ 0 since dropping one token barely moves the sign sums).
HAMMING_THRESHOLD = 2


# ---------------------------------------------------------------------------
# shared SQL fragments, written twice (Spark SQL / DuckDB SQL) where the
# dialects diverge. Spark side still runs through Catalyst (spark.sql).
# ---------------------------------------------------------------------------

def _planted_corpus(dialect: str) -> str:
    """documents ∪ mutated copies (drop first token) of every 50th doc."""
    if dialect == "spark":
        cut = "substring(text, instr(text, ' ') + 1)"
    else:
        cut = "substr(text, strpos(text, ' ') + 1)"
    return f"""
        SELECT doc_id, text, lang, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, {cut} AS text, lang, source
        FROM documents WHERE doc_id % 50 = 0
    """


def _shingles(dialect: str) -> str:
    """corpus → (doc_id, trigram-shingle array, distinct)."""
    if dialect == "spark":
        return """
            SELECT doc_id,
                   array_distinct(
                     CASE WHEN size(toks) >= 3 THEN
                       transform(sequence(1, size(toks) - 2),
                                 i -> concat(element_at(toks, i), ' ',
                                             element_at(toks, i + 1), ' ',
                                             element_at(toks, i + 2)))
                     ELSE array() END) AS shingles
            FROM (SELECT doc_id, split(text, ' ') AS toks FROM corpus)
        """
    return """
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(toks) >= 3 THEN
                   list_transform(generate_series(1, len(toks) - 2),
                                  i -> toks[i] || ' ' || toks[i + 1] || ' '
                                       || toks[i + 2])
                 ELSE [] END) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
    """


def _md5_int(dialect: str, expr: str) -> str:
    """Deterministic 60-bit integer hash of a string, identical in both
    engines: int(md5(x)[:15], 16)."""
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _explode_shingles(dialect: str) -> str:
    if dialect == "spark":
        return (
            "SELECT doc_id, explode(shingles) AS shingle FROM shingled"
        )
    return "SELECT doc_id, unnest(shingles) AS shingle FROM shingled"


def _minhash_sig_sql(dialect: str) -> str:
    """(doc_id, mh0..mh15) minhash signature via k universal hashes over
    md5-int shingle hashes."""
    x = _md5_int(dialect, "shingle")
    mins = ",\n               ".join(
        f"MIN(({A[i]} * (x % {P}) + {B[i]}) % {P}) AS mh{i}"
        for i in range(N_HASHES)
    )
    return f"""
        SELECT doc_id, {mins}
        FROM (SELECT doc_id, {x} AS x FROM ({_explode_shingles(dialect)}))
        GROUP BY doc_id
    """


def _band_sql(dialect: str) -> str:
    """signature → (doc_id, band_idx, band_sig) rows, band_sig = md5 of the
    band's minima."""
    parts = []
    for b in range(N_BANDS):
        cols = ", ".join(
            f"CAST(mh{b * ROWS_PER_BAND + i} AS VARCHAR)"
            if dialect == "duck"
            else f"CAST(mh{b * ROWS_PER_BAND + i} AS STRING)"
            for i in range(ROWS_PER_BAND)
        )
        parts.append(
            f"SELECT doc_id, {b} AS band_idx, "
            f"md5(concat_ws(',', {cols})) AS band_sig FROM sigs"
        )
    return " UNION ALL ".join(parts)


def _jaccard_expr(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return (
            f"size(array_intersect({a}.shingles, {b}.shingles)) / "
            f"CAST(size(array_union({a}.shingles, {b}.shingles)) AS DOUBLE)"
        )
    return (
        f"len(list_filter({a}.shingles, s -> list_contains({b}.shingles, s))) / "
        f"CAST(len({a}.shingles) + len({b}.shingles)"
        f" - len(list_filter({a}.shingles, s -> list_contains({b}.shingles, s)))"
        f" AS DOUBLE)"
    )


def _minhash_full_sql(dialect: str, what: str) -> str:
    """Assemble the full WITH-chain; ``what`` = 'sigs' | 'pairs'."""
    sql = f"""
        WITH corpus AS ({_planted_corpus(dialect)}),
        shingled AS ({_shingles(dialect)}),
        sigs AS ({_minhash_sig_sql(dialect)})
    """
    if what == "sigs":
        return sql + "SELECT * FROM sigs"
    return sql + f""",
        bands AS ({_band_sql(dialect)}),
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id
        )
        SELECT c.a_id, c.b_id,
               round({_jaccard_expr(dialect, 'sa', 'sb')}, 6) AS jaccard
        FROM cand c
        JOIN shingled sa ON sa.doc_id = c.a_id
        JOIN shingled sb ON sb.doc_id = c.b_id
        WHERE {_jaccard_expr(dialect, 'sa', 'sb')} >= {JACCARD_THRESHOLD}
    """


def _register_docs(spark: SparkSession, sf_dir: str) -> None:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")


def dedup_minhash_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature (16 universal hashes over trigram
    shingles) on the planted corpus."""
    _register_docs(spark, sf_dir)
    return spark.sql(_minhash_full_sql("spark", "sigs"))


DEDUP_MINHASH_APPROX_SQL = _minhash_full_sql("duck", "sigs")


def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH dedup: shingle → signature → 4×4 banding →
    bucket equi-join → Jaccard verification ≥ 0.5. Finds the planted
    near-duplicate pairs."""
    _register_docs(spark, sf_dir)
    return spark.sql(_minhash_full_sql("spark", "pairs"))


DEDUP_MINHASH_LSH_PAIRS_SQL = _minhash_full_sql("duck", "pairs")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_sql(dialect: str, what: str) -> str:
    x = _md5_int(dialect, "tok")
    if dialect == "spark":
        bit = lambda j: f"(shiftright(x, {j}) & 1)"  # noqa: E731
        unnest_toks = (
            "SELECT doc_id, explode(array_distinct(split(text, ' '))) AS tok "
            "FROM corpus"
        )
    else:
        bit = lambda j: f"((x >> {j}) & 1)"  # noqa: E731
        unnest_toks = (
            "SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok "
            "FROM corpus"
        )
    sums = ",\n               ".join(
        f"SUM(CASE WHEN {bit(j)} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN s{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    sql = f"""
        WITH corpus AS ({_planted_corpus(dialect)}),
        bits AS (
            SELECT doc_id, {sums}
            FROM (SELECT doc_id, {x} AS x FROM ({unnest_toks}))
            GROUP BY doc_id
        ),
        hashes AS (SELECT doc_id, {assemble} AS simhash FROM bits)
    """
    if what == "hashes":
        return sql + "SELECT * FROM hashes"
    # pairs: band-blocked (upper/lower 16 bits) hamming-distance join
    if dialect == "spark":
        upper = "shiftright(simhash, 16)"
        hamming = "bit_count(a.simhash ^ b.simhash)"
    else:
        upper = "(simhash >> 16)"
        hamming = "bit_count(xor(a.simhash, b.simhash))"
    lower = "(simhash & 65535)"
    return sql + f""",
        banded AS (
            SELECT doc_id, simhash, 0 AS band_idx, {upper} AS band_val FROM hashes
            UNION ALL
            SELECT doc_id, simhash, 1 AS band_idx, {lower} AS band_val FROM hashes
        )
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
               {hamming} AS hamming
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
        WHERE {hamming} <= {HAMMING_THRESHOLD}
    """


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (sign-aggregated token-hash bits) on the
    planted corpus."""
    _register_docs(spark, sf_dir)
    return spark.sql(_simhash_sql("spark", "hashes"))


DEDUP_SIMHASH_SQL = _simhash_sql("duck", "hashes")


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 2-band blocking (upper/lower 16 bits — a
    pigeonhole screen: hamming ≤ 2 implies one band is untouched) + exact
    hamming verify."""
    _register_docs(spark, sf_dir)
    return spark.sql(_simhash_sql("spark", "pairs"))


DEDUP_SIMHASH_PAIRS_SQL = _simhash_sql("duck", "pairs")


# ---------------------------------------------------------------------------
# n-gram Jaccard (blocked exact pairwise)
# ---------------------------------------------------------------------------

def _ngram_jaccard_sql(dialect: str) -> str:
    return f"""
        WITH corpus AS ({_planted_corpus(dialect)}),
        shingled AS (
            SELECT s.doc_id, s.shingles, c.source
            FROM ({_shingles(dialect)}) s JOIN corpus c ON s.doc_id = c.doc_id
        )
        SELECT sa.doc_id AS a_id, sb.doc_id AS b_id,
               round({_jaccard_expr(dialect, 'sa', 'sb')}, 6) AS jaccard
        FROM shingled sa JOIN shingled sb
          ON sa.source = sb.source AND sa.doc_id < sb.doc_id
        WHERE {_jaccard_expr(dialect, 'sa', 'sb')} >= {JACCARD_THRESHOLD}
    """


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-Jaccard near-dup pairs, blocked by source (a real
    pipeline always blocks before pairwise comparison)."""
    _register_docs(spark, sf_dir)
    return spark.sql(_ngram_jaccard_sql("spark"))


DEDUP_NGRAM_JACCARD_SQL = _ngram_jaccard_sql("duck")


QUERIES: dict[str, tuple] = {
    "dedup_minhash_approx": (dedup_minhash_approx, DEDUP_MINHASH_APPROX_SQL),
    "dedup_minhash_lsh_pairs": (dedup_minhash_lsh_pairs, DEDUP_MINHASH_LSH_PAIRS_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_simhash_pairs": (dedup_simhash_pairs, DEDUP_SIMHASH_PAIRS_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL),
}
