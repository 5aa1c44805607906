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
    dedup_substring_spans,
)
from mongo_to_clickhouse_spark.queries.textops import BM25_TOPK, text_bm25_topk
from mongo_to_clickhouse_spark.queries.vectorops import (
    sim_ann_ivf,
    sim_ann_lsh,
    sim_ann_pq,
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


def test_pq_recall_floor_and_distance_sanity(spark, sf_dir):
    brute = {(r.probe_id, r.neighbor_id) for r in sim_cosine_topk(spark, sf_dir).collect()}
    pq_rows = sim_ann_pq(spark, sf_dir).collect()
    pq = {(r.probe_id, r.neighbor_id) for r in pq_rows}
    # random vectors: the floor is a determinism canary (measured 0.34)
    assert len(brute & pq) / len(brute) >= 0.2
    # ADC distances are sums of squared L2 sub-distances: non-negative,
    # non-decreasing with rank within each probe
    by_probe: dict[int, list] = {}
    for r in sorted(pq_rows, key=lambda r: (r.probe_id, r.rank)):
        assert r.adc_micro >= 0
        by_probe.setdefault(r.probe_id, []).append(r.adc_micro)
    for dists in by_probe.values():
        assert dists == sorted(dists)


def test_substring_spans_planted_docs_fully_duplicated(spark, sf_dir):
    rows = dedup_substring_spans(spark, sf_dir).collect()
    planted = [r for r in rows if r.doc_id > 1_000_000]
    assert planted, "no planted docs long enough for an 8-token window"
    # a planted copy is the original minus its first token, so EVERY one
    # of its windows also occurs in the original: 100% duplicated
    assert all(r.dup_ppm == 1_000_000 for r in planted)
    for r in planted:
        assert r.longest_dup_tokens == r.n_windows + 7
    # and each original counterpart may lose at most its first window
    originals = {r.doc_id: r for r in rows}
    for p in planted:
        o = originals[p.doc_id - 1_000_000]
        assert o.n_dup_windows >= o.n_windows - 1
    # bounds hold everywhere
    for r in rows:
        assert 0 <= r.n_dup_windows <= r.n_windows
        assert 0 <= r.dup_ppm <= 1_000_000


def test_bm25_topk_shape(spark, sf_dir):
    rows = text_bm25_topk(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, BM25_TOPK + 1))
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_semdedup_keeps_one_per_cluster_of_identical_directions(spark, tmp_path):
    # 40 vectors in two far-apart direction groups (all-ones scaled ±1
    # with tiny per-vector jitter): every pair WITHIN a cluster has
    # cosine ≈ 1 (same direction), pairs across the ± groups have
    # cosine ≈ -1 — so each cluster must keep exactly its smallest
    # vec_id and drop the rest.
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mongo_to_clickhouse_spark.queries.vectorops import dedup_semdedup

    dim = 64
    vecs = []
    for i in range(40):
        base = 1.0 if i % 2 == 0 else -1.0
        vecs.append([base + (i % 7) * 1e-3] * dim)
    table = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 2 for i in range(40)], pa.int32()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(table, os.path.join(sf, "embeddings.parquet"))
    rows = dedup_semdedup(spark, sf).collect()
    assert sum(r["n_points"] for r in rows) == 40
    for r in rows:
        assert r["n_kept"] == 1, r
        assert r["n_dropped"] == r["n_points"] - 1, r


def test_bloom_prefilter_has_no_false_negatives(spark, tmp_path):
    # Planted: docs 0..99 historical (doc_id % 10 != 0 is historical, so
    # ids 1..9, 11..19, ... are historical); every new-batch doc with id
    # ending in 0 except 50 duplicates the text of historical doc id+1;
    # doc 50 carries unique text (definite-new). Bloom must flag every
    # true dup as maybe (no false negatives), and doc 50 must be clean
    # unless a (reported) false positive occurs.
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mongo_to_clickhouse_spark.queries.dedupops import (
        dedup_bloom_prefilter,
    )

    texts = {}
    for i in range(100):
        texts[i] = f"unique text body number {i} with filler words"
    for i in range(0, 100, 10):
        if i != 50:
            texts[i] = texts[i + 1]  # duplicate of a historical doc
    table = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "text": pa.array([texts[i] for i in range(100)]),
            "lang": pa.array(["en"] * 100),
            "source": pa.array(["src0"] * 100),
            "n_chars": pa.array(
                [len(texts[i]) for i in range(100)], pa.int64()
            ),
        }
    )
    sf = str(tmp_path)
    pq.write_table(table, os.path.join(sf, "documents.parquet"))
    got = {r["doc_id"]: r for r in dedup_bloom_prefilter(spark, sf).collect()}
    assert set(got) == set(range(0, 100, 10))
    for i, r in got.items():
        if r["is_dup"]:
            assert r["bloom_maybe"], f"false negative at {i}"
    assert got[0]["is_dup"] and got[0]["bloom_maybe"]
    assert not got[50]["is_dup"]


def test_incremental_minhash_matches_planted_sources(spark, sf_dir):
    # every planted mutated copy (doc_id >= 1e6) whose source is in the
    # historical side (source % 10 != 3) must match back to its source;
    # holdout originals are usually novel, but the fixture corpus
    # contains NATURAL near-dups (template-generated texts), so a
    # non-novel holdout is only required to carry a genuine
    # above-threshold match
    from mongo_to_clickhouse_spark.queries.dedupops import (
        dedup_incremental_minhash,
    )

    rows = {r["doc_id"]: r for r in
            dedup_incremental_minhash(spark, sf_dir).collect()}
    planted = {i: r for i, r in rows.items() if i >= 1_000_000}
    assert planted, "no planted mutated copies in the new batch"
    for i, r in planted.items():
        src = i - 1_000_000
        if src % 10 != 3:
            assert r["best_match"] == src, (i, r)
            assert not r["is_novel"]
    holdout = [r for i, r in rows.items() if i < 1_000_000]
    assert holdout
    from mongo_to_clickhouse_spark.queries.dedupops import JACCARD_THRESHOLD

    assert any(r["is_novel"] for r in holdout)
    for r in holdout:
        if not r["is_novel"]:
            assert r["best_jaccard"] >= JACCARD_THRESHOLD, r
