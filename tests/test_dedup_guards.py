"""Hot-key (df-cap) guards in the exact-Jaccard self-join and the
decontamination join: planted hot grams prove the guard PRUNES, and the
fixture sweeps (driver_sim / CORRECTNESS) prove it never binds on real
fixture data (cap ≫ max fixture df).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mongo_to_clickhouse_spark.queries import corpusops, dedupops


def _write_documents(tmp_path, rows):
    """rows: list of (doc_id, text, lang, source) matching the fixture
    documents schema."""
    d = str(tmp_path)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return d


def test_jaccard_df_cap_prunes_hot_shingle(spark, tmp_path, monkeypatch):
    # 100 same-source docs whose ONLY shingle is one shared hot trigram:
    # every pair has Jaccard 1.0 through that single hub key. df=100 over
    # the cap (64) → guard must drop the shingle and emit ZERO pairs
    # (instead of 100·99/2 = 4950 quadratic join rows). The planted-corpus
    # mutated copies (doc_id % 50 == 0) drop to 2 tokens → empty shingle
    # sets → inert.
    rows = [(i, "alpha beta gamma", "en", "web") for i in range(1, 101)]
    sf = _write_documents(tmp_path, rows)

    assert dedupops.dedup_ngram_jaccard(spark, sf).count() == 0

    # raising the cap above df restores the exact pairwise result — the
    # guard, not anything else, did the pruning
    monkeypatch.setattr(dedupops, "JACCARD_SHINGLE_DF_CAP", 1000)
    assert dedupops.dedup_ngram_jaccard(spark, sf).count() == 100 * 99 // 2


def test_jaccard_df_cap_transparent_below_cap(spark, tmp_path, monkeypatch):
    # two near-dup docs sharing low-df shingles: the guard must be
    # invisible (same pairs with cap at default and effectively-off)
    rows = [
        (1, "one two three four five six", "en", "web"),
        (2, "one two three four five seven", "en", "web"),
        (3, "totally different words here now", "en", "web"),
    ]
    sf = _write_documents(tmp_path, rows)
    got = sorted(
        (r.a_id, r.b_id, r.jaccard)
        for r in dedupops.dedup_ngram_jaccard(spark, sf).collect()
    )
    assert got == [(1, 2, 0.6)]  # 3 shared of 5 distinct trigrams

    monkeypatch.setattr(dedupops, "JACCARD_SHINGLE_DF_CAP", 10**9)
    got_off = sorted(
        (r.a_id, r.b_id, r.jaccard)
        for r in dedupops.dedup_ngram_jaccard(spark, sf).collect()
    )
    assert got_off == got


def test_decontam_df_cap_prunes_hot_gram(spark, tmp_path, monkeypatch):
    # one benchmark doc (doc_id 97·k) and 70 train docs all containing the
    # same 8-gram: train-side occurrence count 70 > cap 64 → the hub gram
    # is dropped and NO train doc is flagged; raising the cap flags all 70.
    gram = "g1 g2 g3 g4 g5 g6 g7 g8"
    rows = [(97, gram, "en", "bench")]
    rows += [(i, gram, "en", "web") for i in range(1, 71)]
    sf = _write_documents(tmp_path, rows)

    assert corpusops.decontaminate_ngram_overlap(spark, sf).count() == 0

    monkeypatch.setattr(corpusops, "DECONTAM_GRAM_DF_CAP", 1000)
    flagged = corpusops.decontaminate_ngram_overlap(spark, sf).collect()
    assert len(flagged) == 70
    assert all(r.n_shared_8grams == 1 for r in flagged)


@pytest.mark.parametrize(
    "cap,max_fixture_df",
    [(dedupops.JACCARD_SHINGLE_DF_CAP, 7), (corpusops.DECONTAM_GRAM_DF_CAP, 4)],
)
def test_caps_sit_well_above_fixture_df(cap, max_fixture_df):
    # measured at sf0.1 (the largest driver fixture); a cap at ≥4× that
    # df can never bind on fixture data, so oracle hashes are unaffected
    assert cap >= 4 * max_fixture_df


def test_containment_ratio_catches_quoted_benchmark(spark, tmp_path):
    # doc 0 (0 % BENCH_MODULUS == 0) is the benchmark: 10 tokens Q.
    # doc 1 quotes Q inside 30 tokens (A + Q + B): 23 8-grams total, 3
    # fully inside Q -> containment = 3_000_000 // 23 = 130434.
    # doc 2 shares nothing -> absent from the output.
    from mongo_to_clickhouse_spark.queries.corpusops import (
        decontaminate_containment_ratio,
    )

    q = " ".join(f"q{i}" for i in range(10))
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10))
    rows = [
        (0, q, "en", "bench"),
        (1, f"{a} {q} {b}", "en", "web"),
        (2, " ".join(f"c{i}" for i in range(30)), "en", "web"),
    ]
    sf = _write_documents(tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_shared"], r["containment_e6"])
        for r in decontaminate_containment_ratio(spark, sf).collect()
    }
    assert got == {1: (23, 3, 130434)}
