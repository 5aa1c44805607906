"""Content-defined chunking semantics: boundaries recomputed in pure
Python must match the operator, and the CDC selling point — an edit near
the head of a document does NOT move chunk boundaries in the tail —
must hold on planted documents.
"""

from __future__ import annotations

import os
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.textops import (
    CDC_BASE,
    CDC_DIVISOR,
    CDC_WINDOW,
    text_cdc_chunking,
)


def _chunks(text: str) -> list[str]:
    """Reference implementation: exact window polynomial, oldest char
    highest power, boundary after i when hash % divisor == 0."""
    n = len(text)
    bnds = [0]
    for i in range(CDC_WINDOW, n + 1):  # 1-based position i
        h = sum(
            ord(text[i - 1 - k]) * CDC_BASE**k for k in range(CDC_WINDOW)
        )
        if h % CDC_DIVISOR == 0:
            bnds.append(i)
    bnds.append(n)
    out = [text[a:b] for a, b in zip(bnds, bnds[1:])]
    return [c for c in out if c]


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["src0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_chunk_frequencies_match_reference_impl(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a structured streaming aggregation pipeline with watermarks",
        "the quick brown fox jumps over the lazy dog again and again",
        "short",  # below the hash window -> single chunk
    ]
    sf = _write_docs(tmp_path, texts)
    expected = Counter()
    for t in texts:
        expected.update(_chunks(t))
    got = {
        r["chunk"]: (r["n_occurrences"], r["chunk_len"])
        for r in text_cdc_chunking(spark, sf).collect()
    }
    # operator returns the top-K slice; every returned row must agree
    assert got, "no chunks returned"
    for chunk, (n, ln) in got.items():
        assert expected[chunk] == n
        assert len(chunk) == ln
    assert "short" in expected  # sub-window doc is one whole-text chunk


def test_edit_near_head_preserves_tail_chunks(spark, tmp_path):
    words = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega one "
        "two three four five six seven eight nine ten"
    ).split()
    base = " ".join(words * 3)
    edited = "EDITED! " + base
    ch_a, ch_b = _chunks(base), _chunks(edited)
    shared = set(ch_a) & set(ch_b)
    # the polynomial re-synchronizes after the edit: the documents must
    # share at least one identical tail chunk despite the head insert
    assert shared, "planted texts produced no shared chunk - retune fixture"
    sf = _write_docs(tmp_path, [base, edited])
    rows = text_cdc_chunking(spark, sf).collect()
    got_shared = {r["chunk"] for r in rows if r["n_docs"] == 2}
    assert got_shared == shared
