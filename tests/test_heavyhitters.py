"""Misra-Gries kernel: the no-false-negative guarantee must hold under
eviction pressure (capacity far below distinct-key count) — the regime
the sf-scale oracle check cannot reach (its vocab fits in capacity)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.operators.heavyhitters import (
    _mg_update,
    misra_gries_candidates,
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=300),
    st.integers(min_value=2, max_value=8),
)
def test_mg_guarantee_any_stream(stream, capacity):
    """Any key with count > N/capacity must survive; counter error is
    bounded by N/capacity; at most `capacity` counters are held."""
    counters: dict = {}
    for x in stream:
        _mg_update(counters, capacity, x, 1)
    assert len(counters) <= capacity
    n = len(stream)
    for key in set(stream):
        true = stream.count(key)
        if true * capacity > n:
            assert key in counters, (key, true, n, capacity)
        if key in counters:
            assert 0 < counters[key] <= true
            assert true - counters[key] <= n / capacity


def test_mg_batch_update_matches_item_at_a_time():
    """The counts-at-once arithmetic must equal feeding items singly."""
    stream = [1, 1, 1, 2, 2, 3, 4, 5, 5, 5, 5, 6, 7, 1, 1]
    singly: dict = {}
    for x in stream:
        _mg_update(singly, 3, x, 1)
    batched: dict = {}
    for x in sorted(set(stream), key=stream.index):
        _mg_update(batched, 3, x, stream.count(x))
    # batched processes a PERMUTATION of the stream — final counter sets
    # may differ, but both are valid MG runs: same size bound and the
    # guarantee keys (count > N/cap) present in both
    n = len(stream)
    for d in (singly, batched):
        assert len(d) <= 3
        assert {k for k in set(stream) if stream.count(k) * 3 > n} <= set(d)


def test_two_phase_heavy_hitters_exact_under_eviction(spark):
    """With capacity 8 over ~200 distinct skewed keys across 8
    partitions, candidates must still cover every key at support 1/8,
    so sketch-pruned recount == plain groupBy."""
    df = (
        spark.range(0, 20_000, 1, 8)
        .select(
            F.when(F.col("id") % 3 == 0, F.col("id") % 2)  # 2 hot keys, ~17% each
            .otherwise(F.col("id") % 200 + 100)  # ~200 cold keys
            .cast("string")
            .alias("k")
        )
    )
    capacity = 8
    cands = {r.k for r in misra_gries_candidates(df, "k", capacity).collect()}
    counts = {r.k: r.cnt for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    n = sum(counts.values())
    heavy = {k for k, c in counts.items() if c * capacity > n}
    assert heavy, "fixture must contain heavy keys"
    assert heavy <= cands
    # exact recount over candidates equals the direct answer
    recount = {k: counts[k] for k in cands if counts[k] * capacity > n}
    assert recount == {k: c for k, c in counts.items() if c * capacity > n}
