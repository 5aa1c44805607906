"""Greedy WordPiece encode vs an independent pure-Python reference of
the same spec (frequency-seeded vocab, longest-match-first, [UNK] on
miss, [TRUNC] after the round cap).
"""

from __future__ import annotations

import os
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.tokenizerops import (
    WP_MAX_PIECES,
    WP_MAXLEN,
    WP_TOP_K,
    WP_VOCAB,
    tokenizer_wordpiece_apply,
)


def _reference(texts):
    words = Counter()
    for t in texts:
        words.update(w for w in t.split(" ") if w)
    piece_freq: Counter = Counter()  # (is_start, piece) -> corpus freq
    for w, cnt in words.items():
        for p in range(1, len(w) + 1):
            for ln in range(1, WP_MAXLEN + 1):
                if p + ln - 1 <= len(w):
                    piece_freq[(p == 1, w[p - 1 : p - 1 + ln])] += cnt
    vocab = set()
    for side in (True, False):
        ranked = sorted(
            ((k, f) for k, f in piece_freq.items() if k[0] == side),
            key=lambda kv: (-kv[1], kv[0][1]),
        )
        vocab.update(k for k, _f in ranked[:WP_VOCAB])
    out: Counter = Counter()
    for w, cnt in words.items():
        rem, is_start = w, True
        for _r in range(WP_MAX_PIECES):
            if not rem:
                break
            best = None
            for ln in range(min(WP_MAXLEN, len(rem)), 0, -1):
                if (is_start, rem[:ln]) in vocab:
                    best = ln
                    break
            if best is None:
                out["[UNK]"] += cnt
                rem = ""
            else:
                out[(rem[:best] if is_start else "##" + rem[:best])] += cnt
                rem = rem[best:]
            is_start = False
        if rem:
            out["[TRUNC]"] += cnt
    top = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:WP_TOP_K]
    return dict(top)


def test_wordpiece_matches_reference(spark, tmp_path):
    texts = [
        "the streaming pipeline streams streaming data",
        "windowed aggregation over the streaming window",
        "zzqx unseenglyph",  # rare chars -> [UNK]/[TRUNC] paths
        "the the the pipeline pipeline window",
    ]
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
    got = {
        r["piece"]: r["n_occurrences"]
        for r in tokenizer_wordpiece_apply(spark, str(tmp_path)).collect()
    }
    assert got == _reference(texts)
