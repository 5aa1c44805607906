"""Semantic guarantees of the deterministic sampling/split operators —
beyond oracle parity (covered by test_oracle_parity): the statistical
and partition-invariance properties a training pipeline relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.io import load_table
from mongo_to_clickhouse_spark.queries import sampleops


def test_split_exhaustive_and_disjoint(spark, sf_dir):
    """Every document lands in exactly one split; counts add to |docs|."""
    n_docs = load_table(spark, sf_dir, "documents").count()
    summary = {
        r["split"]: r["n_docs"]
        for r in sampleops.sample_split_summary(spark, sf_dir).collect()
    }
    assert set(summary) <= {"train", "val", "test"}
    assert sum(summary.values()) == n_docs
    # 8/1/1 by construction: train strictly dominates at any fixture size
    assert summary["train"] > summary.get("val", 0)
    assert summary["train"] > summary.get("test", 0)


def test_bernoulli_rate_near_nominal(spark, sf_dir):
    """md5 buckets are uniform: the 10% sample lands within [5%, 15%]."""
    n_docs = load_table(spark, sf_dir, "documents").count()
    n_sample = sampleops.sample_hash_bernoulli(spark, sf_dir).count()
    assert 0.05 * n_docs <= n_sample <= 0.15 * n_docs


def test_sample_partition_invariant(spark, sf_dir):
    """Hash sampling is a pure column predicate — repartitioning the
    input must not change WHICH rows are kept (the property RNG
    df.sample lacks)."""
    kept = sampleops.sample_hash_bernoulli(spark, sf_dir)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    docs = load_table(spark, sf_dir, "documents").repartition(7, "lang")
    h = sampleops._hash60(F.col("doc_id"))
    ids2 = {
        r["doc_id"]
        for r in docs.filter(h % 100 < sampleops.SAMPLE_PCT)
        .select("doc_id")
        .collect()
    }
    assert ids == ids2


def test_per_group_quota_respected(spark, sf_dir):
    """At most PER_GROUP_K rows per lang, ranks are 1..k contiguous."""
    rows = sampleops.sample_per_group_topk(spark, sf_dir).collect()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["rk"])
    for lang, rks in by_lang.items():
        assert len(rks) <= sampleops.PER_GROUP_K, lang
        assert sorted(rks) == list(range(1, len(rks) + 1)), lang


def test_pps_favors_long_docs(spark, sf_dir):
    """PPS selection keeps longer documents at a higher rate: mean
    n_chars of the kept set exceeds the corpus mean."""
    docs = load_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    kept = sampleops.sample_weighted_pps(spark, sf_dir)
    kept_mean = kept.agg(F.avg("n_chars")).first()[0]
    assert kept.count() > 0
    assert kept_mean > corpus_mean


def test_profile_covers_all_columns(spark, sf_dir):
    rows = sampleops.profile_column_stats(spark, sf_dir).collect()
    assert {r["column_name"] for r in rows} == {
        "event_id",
        "user_id",
        "event_type",
        "value",
    }
    for r in rows:
        assert r["n_distinct"] > 0


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing must account every document exactly once, in order, with
    pack spans non-overlapping and ascending."""
    import duckdb

    from mongo_to_clickhouse_spark.queries.pipelineops import (
        PACK_BUDGET,
        pipeline_pack_sequences,
    )

    rows = pipeline_pack_sequences(spark, sf_dir).collect()
    n_docs_total = duckdb.sql(
        f"SELECT COUNT(*), SUM(len(string_split(text, ' ')))"
        f" FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    assert sum(r.n_docs for r in rows) == n_docs_total[0]
    assert sum(r.n_tokens for r in rows) == n_docs_total[1]
    prev_last = -1
    for r in sorted(rows, key=lambda r: r.pack_id):
        assert r.first_doc_id > prev_last, "doc spans must not overlap"
        assert r.first_doc_id <= r.last_doc_id
        prev_last = r.last_doc_id
        # a pack holds at least one doc and starts within budget bounds:
        # consecutive docs start < PACK_BUDGET tokens apart within a pack
        assert r.n_docs >= 1
    # budget sanity: mean tokens-started-per-pack hovers around the budget
    mean_started = sum(r.n_tokens for r in rows) / len(rows)
    assert 0.5 * PACK_BUDGET < mean_started < 2 * PACK_BUDGET


def test_waterfill_allocates_budget_exactly(spark, tmp_path):
    # caps [10, 20, 100] tokens, budget = 3/5 of 130 = 78: segments
    # 10*3=30 < 78, 10+20*2=50 < 78, 30+100 >= 78 -> theta=(78-30)/1=48
    # -> allocations [10, 20, 48], sum = budget exactly.
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mongo_to_clickhouse_spark.queries.sampleops import (
        domain_budget_waterfill,
    )

    texts, srcs = [], []
    for src, n in (("a", 10), ("b", 20), ("c", 100)):
        texts.append(" ".join(["w"] * n))
        srcs.append(src)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    rows = {
        r["source"]: (r["cap_tokens"], r["alloc_tokens"], r["theta"])
        for r in domain_budget_waterfill(spark, str(tmp_path)).collect()
    }
    assert rows == {"a": (10, 10, 48), "b": (20, 20, 48), "c": (100, 48, 48)}
    assert sum(a for _, a, _ in rows.values()) == 78
