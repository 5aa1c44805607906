"""Semantic pins for the tokenizer / corpus-structure tier on planted
corpora (the oracle harness checks fixture parity; these check the
operators do what they claim on hand-computable inputs)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mongo_to_clickhouse_spark.queries.tokenizerops import (
    PARA_TOKENS,
    corpus_quality_logreg,
    text_paragraph_dedup,
    tokenizer_bpe_pair_counts,
)


def _write_documents(dirpath, texts):
    os.makedirs(dirpath, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "documents.parquet"))
    return str(dirpath)


def test_bpe_pair_counts_hand_example(spark, tmp_path):
    # word counts: ab×3, abc×2, cd×1 → pairs: 'a b' = 3+2, 'b c' = 2,
    # 'c d' = 1
    sf = _write_documents(tmp_path / "bpe", ["ab abc ab cd", "abc ab"])
    rows = {
        r["pair"]: r["pair_count"]
        for r in tokenizer_bpe_pair_counts(spark, sf).collect()
    }
    assert rows == {"a b": 5, "b c": 2, "c d": 1}


def test_paragraph_dedup_keeps_global_first_occurrence(spark, tmp_path):
    para_a = " ".join(f"w{i}" for i in range(PARA_TOKENS))
    para_b = " ".join(f"x{i}" for i in range(PARA_TOKENS))
    para_c = " ".join(f"y{i}" for i in range(PARA_TOKENS))
    # doc 0 = A+B (both first occurrences), doc 1 = A+C (A is a dup)
    sf = _write_documents(
        tmp_path / "para", [f"{para_a} {para_b}", f"{para_a} {para_c}"]
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["dup_ratio"])
        for r in text_paragraph_dedup(spark, sf).collect()
    }
    assert got[0] == (2, 2, 0.0)
    assert got[1] == (2, 1, 0.5)


def test_bpe_ignores_single_char_words(spark, tmp_path):
    # 'a' contributes no pair; doc of only single-char words yields none
    sf = _write_documents(tmp_path / "bpe1", ["a b a", "ab"])
    rows = {
        r["pair"]: r["pair_count"]
        for r in tokenizer_bpe_pair_counts(spark, sf).collect()
    }
    assert rows == {"a b": 1}


def test_paragraph_dedup_partial_chunk_and_identical_docs(spark, tmp_path):
    # doc 0: 1 token = one partial chunk; doc 2 repeats doc 1 entirely
    body = " ".join(f"w{i}" for i in range(PARA_TOKENS + 3))  # 2 chunks
    sf = _write_documents(tmp_path / "para2", ["solo", body, body])
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["dup_ratio"])
        for r in text_paragraph_dedup(spark, sf).collect()
    }
    assert got[0] == (1, 1, 0.0)
    assert got[1] == (2, 2, 0.0)
    assert got[2] == (2, 0, 1.0)


def test_quality_logreg_keep_matches_score_and_orders_sanely(spark, tmp_path):
    rich = " ".join(f"tok{i}" for i in range(60))  # diverse, no stopwords
    stoppy = " ".join(["the of a and to in"] * 10)  # all stopwords
    sf = _write_documents(tmp_path / "lr", [rich, stoppy])
    rows = {r["doc_id"]: r for r in corpus_quality_logreg(spark, sf).collect()}
    for r in rows.values():
        assert 0.0 < r["quality_score"] < 1.0
        assert r["keep"] == (r["quality_score"] >= 0.5)
    assert rows[0]["quality_score"] > rows[1]["quality_score"]


def test_bpe_merge_rounds_learns_the_classic_merges(spark, tmp_path):
    # vocab {aaab: 2, ab: 1} — the textbook hand-computable case:
    #  r1: (a,a)=4 beats (a,b)=3; merge -> {aa a b: 2, a b: 1}
    #  r2: (a,b)=3 beats (aa,a)=2; merge -> {aa ab: 2, ab: 1}
    #  r3: (aa,ab)=2 (the only pair); merge -> single-symbol words
    #  r4: no pairs left -> no row (both engines agree on the short table)
    from mongo_to_clickhouse_spark.queries.tokenizerops import (
        tokenizer_bpe_merge_rounds,
    )

    sf = _write_documents(tmp_path / "bpem", ["aaab aaab", "ab"])
    rows = [
        (r["round"], r["pair"], r["pair_count"])
        for r in tokenizer_bpe_merge_rounds(spark, sf).collect()
    ]
    assert rows == [(1, "a a", 4), (2, "a b", 3), (3, "aa ab", 2)]


def test_bpe_merge_is_left_to_right_nonoverlapping(spark, tmp_path):
    # 'aaaa' with best pair (a,a) must merge to (aa, aa) — the sequential
    # BPE scan — not (aa, a, a) or a rescan artifact. After r1 the only
    # pair is (aa, aa).
    from mongo_to_clickhouse_spark.queries.tokenizerops import (
        tokenizer_bpe_merge_rounds,
    )

    sf = _write_documents(tmp_path / "bpeo", ["aaaa"])
    rows = {
        r["round"]: (r["pair"], r["pair_count"])
        for r in tokenizer_bpe_merge_rounds(spark, sf).collect()
    }
    assert rows[1] == ("a a", 3)
    assert rows[2] == ("aa aa", 1)


def test_bpe_apply_encodes_with_all_merges(spark, tmp_path):
    # {aaab: 2, ab: 1} after merges (a,a),(a,b),(aa,ab): 'aaab' encodes
    # to the single symbol 'aaab' (count 2) and 'ab' to 'ab' (the r2
    # merge, count 1... plus 'ab' also appears inside nothing else).
    # Round 4 finds no pairs — the empty-merge guard must leave the
    # vocabulary intact rather than wiping it.
    from mongo_to_clickhouse_spark.queries.tokenizerops import (
        tokenizer_bpe_apply,
    )

    sf = _write_documents(tmp_path / "bpea", ["aaab aaab", "ab"])
    got = {
        r["symbol"]: r["n_occurrences"]
        for r in tokenizer_bpe_apply(spark, sf).collect()
    }
    assert got == {"aaab": 2, "ab": 1}
