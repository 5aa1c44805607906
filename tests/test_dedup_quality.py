"""Quality guarantees for the approximate operators.

The strong guarantee: MinHash-LSH candidate generation must cover EVERY
pair the exact blocked trigram-Jaccard finds at the threshold (banding
theory: P[miss] ≈ (1-s^4)^4 < 0.1% at s ≥ 0.5, and the planted dups sit
at s ≈ 0.97). Everything is deterministic (fixed hash coefficients), so
this is exact, not flaky.

The ANN recall floors are determinism canaries: fixture vectors are
RANDOM (no neighbor structure), so absolute recall is inherently modest —
the pinned floors catch regressions in bucketing/assignment logic, not
"quality" in the embedding sense.
"""

from __future__ import annotations

from mongo_to_clickhouse_spark.queries.dedupops import (
    dedup_minhash_lsh_pairs,
    dedup_ngram_jaccard,
)
from mongo_to_clickhouse_spark.queries.vectorops import (
    sim_ann_ivf,
    sim_ann_lsh,
    sim_cosine_topk,
)


def test_minhash_lsh_covers_exact_jaccard_pairs(spark, sf_dir):
    lsh = {(r.a_id, r.b_id) for r in dedup_minhash_lsh_pairs(spark, sf_dir).collect()}
    exact = {(r.a_id, r.b_id) for r in dedup_ngram_jaccard(spark, sf_dir).collect()}
    missing = exact - lsh
    assert not missing, f"LSH missed true near-dup pairs: {sorted(missing)[:5]}"
    # planted mutations must be among the found pairs
    planted = {p for p in lsh if p[1] - p[0] == 1_000_000}
    assert planted, "no planted (doc, doc+1e6) pair found"


def test_ann_recall_floors(spark, sf_dir):
    brute = {(r.probe_id, r.neighbor_id) for r in sim_cosine_topk(spark, sf_dir).collect()}
    ivf = {(r.probe_id, r.neighbor_id) for r in sim_ann_ivf(spark, sf_dir).collect()}
    lsh = {(r.probe_id, r.neighbor_id) for r in sim_ann_lsh(spark, sf_dir).collect()}
    assert len(brute & ivf) / len(brute) >= 0.25
    assert len(brute & lsh) / len(brute) >= 0.15
