"""Planted-input semantics for DSIR importance weighting: raw docs that
share the target domain's vocabulary must outscore raw docs that don't
(and come out selected)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.corpusops import (
    DSIR_TARGET_MODULUS,
    corpus_importance_dsir,
)


def test_dsir_prefers_target_like_docs(spark, tmp_path):
    # Target docs (doc_id % M == 0) speak "alpha"; half the raw docs also
    # speak alpha, the other half speak "zeta". Alpha-speaking raw docs
    # must carry strictly higher weight and be selected.
    # texts are long (25 vocab repetitions) so bucket counts dominate the
    # +1/(N+B) Laplace smoothing — with B=1024 buckets a short target
    # corpus would damp every log-ratio toward 0 and blur the sign
    m = DSIR_TARGET_MODULUS
    rows = []
    for i in range(70):
        if i % m == 0:
            text = " ".join(["alpha beta gamma delta"] * 25)
        elif i % 2 == 0:
            # drawn from the target distribution (identical vocabulary —
            # a single out-of-target token would add a large unseen-bucket
            # penalty, which is exactly DSIR's job but not this pin's)
            text = " ".join(["alpha beta gamma delta"] * 25)
        else:
            text = " ".join(["zeta eta theta iota"] * 25)
        rows.append((i, text))
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["src0"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(table, os.path.join(sf, "documents.parquet"))
    got = {r["doc_id"]: r for r in corpus_importance_dsir(spark, sf).collect()}
    assert set(got) == {i for i in range(70) if i % m != 0}
    alpha = [r for i, r in got.items() if i % 2 == 0]
    zeta = [r for i, r in got.items() if i % 2 == 1]
    assert min(a["weight_micro"] for a in alpha) > max(
        z["weight_micro"] for z in zeta
    )
    assert all(a["selected"] for a in alpha)
    assert not any(z["selected"] for z in zeta)
