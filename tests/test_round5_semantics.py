"""Planted-input semantic pins for round-5 operators (oracle parity
checks the fixtures; these check the algorithms do what they claim on
hand-constructed cases)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] if len(r) > 2 else "en" for r in rows]),
            "source": pa.array(
                [r[3] if len(r) > 3 else "src0" for r in rows]
            ),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_waterfill_takes_small_sources_whole_and_caps_big(spark, tmp_path):
    # sources: tiny (10 tokens), mid (40), big (200); budget = 3/5 of 250
    # = 150 tokens. Water level θ: tiny+mid fit whole (50), θ on big =
    # 100 → alloc = (10, 40, 100).
    from mongo_to_clickhouse_spark.queries.sampleops import (
        domain_budget_waterfill,
    )

    rows = [
        (1, " ".join(["a"] * 10), "en", "tiny"),
        (2, " ".join(["b"] * 40), "en", "mid"),
        (3, " ".join(["c"] * 200), "en", "big"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = {r["source"]: r for r in domain_budget_waterfill(spark, sf).collect()}
    assert got["tiny"]["alloc_tokens"] == 10
    assert got["mid"]["alloc_tokens"] == 40
    assert got["big"]["alloc_tokens"] == 100


def test_temperature_mix_flattens_toward_small_sources(spark, tmp_path):
    # two sources 90/10: α=0.7 must give the small source MORE than its
    # raw 10% share and the big one less than 90%.
    from mongo_to_clickhouse_spark.queries.sampleops import (
        sample_temperature_mix,
    )

    rows = [(i, "x y z", "en", "big" if i < 90 else "small")
            for i in range(100)]
    sf = _write_docs(tmp_path, rows)
    got = {r["source"]: r for r in sample_temperature_mix(spark, sf).collect()}
    assert got["small"]["share_ppm"] > got["small"]["raw_share_ppm"]
    assert got["big"]["share_ppm"] < got["big"]["raw_share_ppm"]
    assert abs(got["small"]["share_ppm"] + got["big"]["share_ppm"]
               - 1_000_000) <= 1


def test_reservoir_returns_exactly_k_and_prefers_heavy_docs(spark, tmp_path):
    # 500 docs: 250 heavy (100 tokens) vs 250 light (2 tokens) — the
    # weighted reservoir must return exactly K rows with heavy docs
    # strongly over-represented (weight ratio 50:1 → expect >> half).
    from mongo_to_clickhouse_spark.queries.sampleops import (
        RESERVOIR_K,
        sample_reservoir_weighted,
    )

    rows = [
        (i, " ".join(["w"] * (100 if i % 2 == 0 else 2)))
        for i in range(500)
    ]
    sf = _write_docs(tmp_path, rows)
    got = sample_reservoir_weighted(spark, sf).collect()
    assert len(got) == RESERVOIR_K
    heavy = sum(1 for r in got if r["doc_id"] % 2 == 0)
    assert heavy > RESERVOIR_K * 0.7, heavy


def test_gaps_islands_finds_planted_runs(spark, tmp_path):
    # keys: 1..5, 100..101, 2000 — three islands (all within one bucket
    # of 1024 except 2000 which starts bucket 1)
    from mongo_to_clickhouse_spark.queries.relational_ext import (
        window_gaps_islands_bucketed,
    )

    keys = list(range(1, 6)) + [100, 101] + [2000]
    orders = pa.table({"o_orderkey": pa.array(keys, pa.int64())})
    sf = str(tmp_path)
    pq.write_table(orders, os.path.join(sf, "orders.parquet"))
    got = sorted(
        (r["island_start"], r["island_end"], r["n_keys"])
        for r in window_gaps_islands_bucketed(spark, sf).collect()
    )
    assert got == [(1, 5, 5), (100, 101, 2), (2000, 2000, 1)]


def test_sliding_distinct_users_counts_trailing_window(spark, tmp_path):
    # user 1 active on day 1 only; user 2 on day 5; window 7 days →
    # days 1-4 have 1 active, days 5-7 have 2.
    from mongo_to_clickhouse_spark.queries.analytics_ext import (
        events_sliding_distinct_users,
    )

    import datetime

    def ts(day):
        return datetime.datetime(2024, 1, day, 12, 0, 0)

    rows = [(1, ts(1), 1), (2, ts(5), 2), (3, ts(7), 1)]
    events = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    sf = str(tmp_path)
    pq.write_table(events, os.path.join(sf, "events.parquet"))
    got = {r["day"]: r["n_active_users"] for r in
           events_sliding_distinct_users(spark, sf).collect()}
    assert got["2024-01-01"] == 1
    assert got["2024-01-04"] == 1
    assert got["2024-01-05"] == 2
    assert got["2024-01-07"] == 2


def test_pit_join_reads_the_version_valid_at_order_date(spark, tmp_path):
    # customer 10 (updated key): order before cutover sees v1, order
    # after sees v2 (+10000 cents); customer 7 always sees v1.
    from mongo_to_clickhouse_spark.queries.joinops import join_point_in_time

    customer = pa.table(
        {
            "c_custkey": pa.array([10, 7], pa.int64()),
            "c_acctbal": pa.array([100.0, 50.0]),
        }
    )
    import datetime

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([10, 10, 7], pa.int64()),
            "o_orderdate": pa.array(
                [
                    datetime.date(1995, 1, 1),
                    datetime.date(1996, 1, 1),
                    datetime.date(1996, 1, 1),
                ]
            ),
        }
    )
    sf = str(tmp_path)
    pq.write_table(customer, os.path.join(sf, "customer.parquet"))
    pq.write_table(orders, os.path.join(sf, "orders.parquet"))
    got = {r["o_orderkey"]: r for r in join_point_in_time(spark, sf).collect()}
    assert got[1]["version"] == 1 and got[1]["bal_cents"] == 10000
    assert got[2]["version"] == 2 and got[2]["bal_cents"] == 20000
    assert got[3]["version"] == 1 and got[3]["bal_cents"] == 5000


def test_basket_lift_ranks_the_planted_exclusive_pair_highest(spark, tmp_path):
    # suppliers 1&2 co-occur in 10 orders and NEVER separately (perfect
    # association); suppliers 5,6,7 co-occur randomly with everything.
    import itertools

    pairs = []
    oid = 0
    for _ in range(10):
        pairs += [(oid, 1), (oid, 2)]
        oid += 1
    for a, b in itertools.combinations([5, 6, 7], 2):
        for _ in range(10):
            pairs += [(oid, a), (oid, b)]
            oid += 1
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([o for o, _ in pairs], pa.int64()),
            "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(lineitem, os.path.join(sf, "lineitem.parquet"))
    from mongo_to_clickhouse_spark.queries.analytics_ext import (
        basket_pair_lift,
    )

    got = basket_pair_lift(spark, sf).collect()
    assert (got[0]["sa"], got[0]["sb"]) == (1, 2)
    # exclusive pair: confidence = 100%
    assert got[0]["confidence_ppm"] == 1_000_000
    assert got[0]["lift_ppm"] > got[-1]["lift_ppm"]


def test_zipf_slope_is_negative_and_near_minus_one_on_zipfian_text(
    spark, tmp_path
):
    # synthesize a corpus whose word frequencies follow 1/rank exactly:
    # word_r appears round(1000/r) times, r = 1..50
    words = []
    for r in range(1, 51):
        words += [f"w{r:03d}"] * round(1000 / r)
    rows = [(i, " ".join(words[i::20])) for i in range(20)]
    sf = _write_docs(tmp_path, rows)
    from mongo_to_clickhouse_spark.queries.evalops import corpus_zipf_slope

    row = corpus_zipf_slope(spark, sf).collect()[0]
    assert row["n_types"] == 50
    assert -1.2 < row["zipf_slope"] < -0.8, row


def test_fuzzy_name_finds_every_planted_typo_pair(spark, sf_dir):
    # every (k, k+1e6) planted typo pair must survive the blocking +
    # sorted-neighborhood reduction (the digit-suffix sort key keeps
    # typo and source adjacent), at distance exactly 1
    from mongo_to_clickhouse_spark.queries.dedupops import dedup_fuzzy_name
    from mongo_to_clickhouse_spark.io import load_table

    pairs = {(r["a_id"], r["b_id"]): r["distance"]
             for r in dedup_fuzzy_name(spark, sf_dir).collect()}
    planted_keys = [
        r["c_custkey"]
        for r in load_table(spark, sf_dir, "customer")
        .filter("c_custkey % 25 = 0")
        .select("c_custkey")
        .collect()
    ]
    assert planted_keys
    for k in planted_keys:
        assert pairs.get((k, k + 1_000_000)) == 1, k


def test_bitmap_distinct_is_exact_on_planted_sets(spark, tmp_path):
    # users straddle word boundaries (61, 62, 63, 124) deliberately
    import datetime

    rows = [("signup", u) for u in [1, 61, 62, 63, 124, 124, 1]] + [
        ("click", u) for u in [62, 200]
    ]
    events = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1)] * len(rows),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for _, u in rows], pa.int64()),
            "event_type": pa.array([t for t, _ in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    sf = str(tmp_path)
    pq.write_table(events, os.path.join(sf, "events.parquet"))
    from mongo_to_clickhouse_spark.queries.sketchops import (
        agg_bitmap_distinct,
    )

    got = {r["event_type"]: r for r in agg_bitmap_distinct(spark, sf).collect()}
    assert got["signup"]["n_distinct"] == 5
    assert got["click"]["n_distinct"] == 2
    assert got["__ALL__"]["n_distinct"] == 6  # 62 shared across types
    assert all(r["matches_exact"] for r in got.values())


def test_hamming_binary_ranks_identical_sign_pattern_first(spark, tmp_path):
    # vector 10 duplicates probe 0's sign pattern exactly (hamming 0);
    # vector 11 flips every dim (hamming 64); others are mixed
    dim = 64
    base = [1.0 if j % 3 else -1.0 for j in range(dim)]
    vecs = []
    for i in range(12):
        if i == 10:
            vecs.append([v * 2.0 for v in base])       # same signs
        elif i == 11:
            vecs.append([-v for v in base])            # all flipped
        elif i == 0:
            vecs.append(base)
        else:
            vecs.append(
                [(1.0 if (i + j) % 2 else -1.0) for j in range(dim)]
            )
    table = pa.table(
        {
            "vec_id": pa.array(range(12), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * 12, pa.int32()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(table, os.path.join(sf, "embeddings.parquet"))
    from mongo_to_clickhouse_spark.queries.vectorops import sim_hamming_binary

    rows = [r for r in sim_hamming_binary(spark, sf).collect()
            if r["probe_id"] == 0]
    byrank = sorted(rows, key=lambda r: r["rank"])
    assert byrank[0]["neighbor_id"] == 10 and byrank[0]["hamming"] == 0
    assert all(r["neighbor_id"] != 11 for r in byrank), byrank


def test_forward_fill_imputes_from_last_observation(spark, tmp_path):
    import datetime

    # user 1: events 5 (gap), 7, 10 (gap), 12 in time order →
    # 5 has no prior (stays null), 10 fills from 7
    rows = [(5, 1, 1.11), (7, 1, 2.22), (10, 1, 3.33), (12, 1, 4.44)]
    events = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, 0, i) for i in
                 range(len(rows))],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([r[2] for r in rows]),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    sf = str(tmp_path)
    pq.write_table(events, os.path.join(sf, "events.parquet"))
    from mongo_to_clickhouse_spark.queries.relational_ext import (
        window_forward_fill,
    )

    got = {r["event_id"]: r for r in window_forward_fill(spark, sf).collect()}
    assert got[5]["was_gap"] and got[5]["filled_is_null"]
    assert got[10]["was_gap"] and got[10]["filled_value"] == 2.22
    assert not got[7]["was_gap"] and got[7]["filled_value"] == 2.22
    assert got[12]["filled_value"] == 4.44
