"""Planted-fixture semantics for the round-8 batch: MinHash index
upsert (maintenance invariants + cross-operator consistency with the
probe report), sliding-window HDR quantiles (hand-checkable trailing
merges), and NDCG@k (perfect vs reversed rankings against a planted
graded truth)."""

from __future__ import annotations

import math

from mongo_to_clickhouse_spark.queries.dedupops import (
    N_BANDS,
    dedup_incremental_minhash,
    dedup_minhash_index_upsert,
)
from mongo_to_clickhouse_spark.queries.evalops import _ndcg_body, _ndcg_weights
from mongo_to_clickhouse_spark.queries.sketchops import (
    agg_sliding_window_quantile,
)

SF_DIR = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# dedup_minhash_index_upsert
# ---------------------------------------------------------------------------


def test_upsert_accounting_invariants(spark):
    rows = dedup_minhash_index_upsert(spark, SF_DIR).collect()
    assert {r.band_idx for r in rows} == set(range(N_BANDS))
    for r in rows:
        # inserts are append-only: exact row accounting per band
        assert r.rows_after == r.rows_before + r.rows_inserted
        # buckets can only grow, and never past the row count
        assert r.buckets_before <= r.buckets_after <= r.rows_after
        # sum(c^2) >= sum(c) with equality iff all buckets singleton
        assert r.pair_work_after >= r.rows_after
        assert r.max_bucket_after >= 1


def test_upsert_agrees_with_probe_report(spark):
    """The docs the probe report calls novel are EXACTLY the docs the
    upsert inserts: every new doc contributes one band row per band, so
    per-band rows_inserted == count(is_novel)."""
    probe = dedup_incremental_minhash(spark, SF_DIR).collect()
    n_novel = sum(1 for r in probe if r.is_novel)
    n_dup = len(probe) - n_novel
    assert n_novel > 0 and n_dup > 0  # the planted corpus has both
    rows = dedup_minhash_index_upsert(spark, SF_DIR).collect()
    for r in rows:
        assert r.rows_inserted == n_novel


# ---------------------------------------------------------------------------
# agg_sliding_window_quantile
# ---------------------------------------------------------------------------


def test_sliding_quantile_trailing_merge(spark, tmp_path):
    """Two bursts 10 hours apart: hour h0 sees only burst A, h0+10 only
    burst B (outside the 6h window), so their quantiles must differ
    exactly as the bursts do, and every estimate must be a valid HDR
    lower bound of the true quantile (rel err <= 2^-4)."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # burst A: 100 events of value 10.00 at hour 0
    for i in range(100):
        rows.append((i, t0, 1, "view", 10.0))
    # burst B: 100 events of value 640.00 at hour 10
    for i in range(100):
        rows.append((1000 + i, t0 + dt.timedelta(hours=10), 1, "view", 640.0))
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    out = agg_sliding_window_quantile(spark, str(tmp_path)).collect()
    hours = sorted({r.hour_idx for r in out})
    assert len(hours) == 2  # only observed hours appear
    by_hour = {h: {r.q_ppm: r for r in out if r.hour_idx == h}
               for h in hours}
    for h, true_cents in ((hours[0], 1000), (hours[1], 64000)):
        for q in (500_000, 950_000, 990_000):
            r = by_hour[h][q]
            assert r.n_window == 100  # no cross-burst leakage
            # HDR bound: lower <= true <= lower * (1 + 2^-4)
            assert r.est_cents_lower <= true_cents
            assert true_cents <= r.est_cents_lower * (1 + 2 ** -4)


def test_sliding_quantile_window_accumulates(spark, tmp_path):
    """Events in consecutive hours: the LAST hour's window must count
    all events within the trailing 6, and an hour 6+ later none."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h in range(6):  # hours 0..5: 10 events each
        for i in range(10):
            rows.append((eid, t0 + dt.timedelta(hours=h), 1, "view", 5.0))
            eid += 1
    rows.append((eid, t0 + dt.timedelta(hours=20), 1, "view", 5.0))
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    out = agg_sliding_window_quantile(spark, str(tmp_path)).collect()
    n_by_hour = {r.hour_idx: r.n_window for r in out}
    hours = sorted(n_by_hour)
    base = hours[0]
    assert n_by_hour[base + 5] == 60   # hour 5 sees hours 0..5
    assert n_by_hour[base + 20] == 1   # hour 20 sees only itself


# ---------------------------------------------------------------------------
# eval_retrieval_ndcg
# ---------------------------------------------------------------------------


def _plant_retrieval(spark, cand_rows):
    """truth: probe 0 with graded top-5 neighbors 1..5 (rank = id);
    cand_rows: (neighbor_id, sim) pairs the index surfaced."""
    spark.createDataFrame(
        [(0, n, 5, n) for n in range(1, 6)],
        "probe_id long, neighbor_id long, k long, rank long",
    ).createOrReplaceTempView("ndcg_truth")
    spark.createDataFrame(
        [(0, n, float(s)) for n, s in cand_rows],
        "probe_id long, neighbor_id long, sim double",
    ).createOrReplaceTempView("ndcg_cands")


def test_ndcg_perfect_ranking_is_million(spark):
    # index surfaces exactly the true top-5 in true order
    _plant_retrieval(spark, [(n, 1.0 - n / 10.0) for n in range(1, 6)])
    row = spark.sql(_ndcg_body("ndcg_truth", "ndcg_cands", "DIV", 5)).first()
    assert row.n_probes == 1
    assert row.mean_ndcg_ppm == 1_000_000
    assert row.n_perfect == 1


def test_ndcg_reversed_ranking_matches_hand_formula(spark):
    # index surfaces the top-5 in REVERSED order: rel at rank r is r
    _plant_retrieval(spark, [(n, n / 10.0) for n in range(1, 6)])
    row = spark.sql(_ndcg_body("ndcg_truth", "ndcg_cands", "DIV", 5)).first()
    wts = dict(_ndcg_weights(5))
    dcg = sum(r * wts[r] for r in range(1, 6))          # rel(rank r) = r
    idcg = sum((5 + 1 - r) * wts[r] for r in range(1, 6))
    assert row.mean_ndcg_ppm == dcg * 1_000_000 // idcg
    assert row.n_perfect == 0


def test_ndcg_empty_candidates_scores_zero(spark):
    _plant_retrieval(spark, [(99, 0.5)])  # only an irrelevant candidate
    row = spark.sql(_ndcg_body("ndcg_truth", "ndcg_cands", "DIV", 5)).first()
    assert row.mean_ndcg_ppm == 0
    assert row.min_ndcg_ppm == 0


def test_ndcg_weights_are_log2_discounts():
    for r, w in _ndcg_weights(5):
        assert w == round(1_000_000 / math.log2(r + 1))
