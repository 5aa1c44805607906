"""Planted semantics for perceptual-hash media dedup."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.pipelineops import (
    multimodal_phash_dedup,
)


def test_identical_payloads_confirmed_first(spark, tmp_path):
    texts = [
        "an identical media payload used twice in the corpus",
        "a completely different document about streaming engines",
        "an identical media payload used twice in the corpus",
        "yet another unrelated piece of text with other words",
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
    rows = multimodal_phash_dedup(spark, str(tmp_path)).collect()
    assert rows, "identical payloads produced no candidate pair"
    top = rows[0]
    assert (top["a_doc"], top["b_doc"]) == (0, 2)
    assert top["hamming"] == 0
    assert top["l1_micro"] == 0
    assert top["confirmed"]
    # no other pair may be confirmed: distinct digests give unrelated
    # features far beyond the L1 bound
    assert all(not r["confirmed"] for r in rows[1:])
