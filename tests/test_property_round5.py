"""Property-based invariants for the round-5 mixture/sketch operators,
checked through the DuckDB oracle side (Spark ≡ oracle is separately
pinned by the driver compare at every sf; these pin the ALGORITHMS'
invariants on arbitrary generated inputs, fast and in-process)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from mongo_to_clickhouse_spark.queries.sampleops import (
    DOMAIN_BUDGET_WATERFILL_SQL,
    RESERVOIR_K,
    SAMPLE_RESERVOIR_WEIGHTED_SQL,
    SAMPLE_TEMPERATURE_MIX_SQL,
    WATERFILL_BUDGET_DEN,
    WATERFILL_BUDGET_NUM,
)


def _docs_con(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR,"
                " lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?, ?, ?)",
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
    )
    return con


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 60), st.integers(1, 8)),  # (n_tokens, src)
        min_size=2,
        max_size=40,
    )
)
def test_waterfill_never_overspends_and_respects_caps(spec):
    rows = [(" ".join(["w"] * n), f"s{src}") for n, src in spec]
    con = _docs_con(rows)
    out = con.execute(DOMAIN_BUDGET_WATERFILL_SQL).fetchall()
    total_cap = sum(r[1] for r in out)
    budget = total_cap * WATERFILL_BUDGET_NUM // WATERFILL_BUDGET_DEN
    allocs = [r[2] for r in out]
    caps = [r[1] for r in out]
    theta = out[0][3]
    assert all(0 <= a <= c for a, c in zip(allocs, caps))
    assert sum(allocs) <= budget
    # water level: any source with cap <= theta is taken whole
    for a, c in zip(allocs, caps):
        if c <= theta:
            assert a == c
    # unused budget is bounded by the integer-division remainder spread
    # over the at-theta sources
    n_at_theta = sum(1 for c in caps if c > theta)
    assert budget - sum(allocs) <= max(n_at_theta, 1) + theta


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(1, 200), min_size=1, max_size=300)  # n_chars>0
)
def test_reservoir_is_exactly_k_distinct_input_rows(sizes):
    rows = [("x" * n, "s") for n in sizes]
    con = _docs_con(rows)
    out = con.execute(SAMPLE_RESERVOIR_WEIGHTED_SQL).fetchall()
    assert len(out) == min(RESERVOIR_K, len(sizes))
    ids = [r[0] for r in out]
    assert len(set(ids)) == len(ids)
    assert set(ids) <= set(range(len(sizes)))


@settings(max_examples=20, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 6), st.integers(1, 500), min_size=2, max_size=7
    )
)
def test_temperature_mix_flattens_and_normalizes(counts):
    rows = []
    for src, n in counts.items():
        rows += [("a b c", f"s{src}")] * n
    con = _docs_con(rows)
    out = con.execute(SAMPLE_TEMPERATURE_MIX_SQL).fetchall()
    # shares sum to 1e6 up to one ppm of truncation per source
    assert abs(sum(r[3] for r in out) - 1_000_000) <= len(out)
    # α<1 flattening is a RELATIVE property: the boost ratio share/raw
    # is non-increasing in source size (the crossover point is not the
    # uniform share, so absolute gain/loss claims are false in general).
    # Cross-multiplied integer comparison with ppm-truncation slack.
    rows_sorted = sorted(out, key=lambda r: r[1])  # by n_docs
    for (*_, share_i, raw_i), (*_, share_j, raw_j) in zip(
        rows_sorted, rows_sorted[1:]
    ):
        slack = raw_i + raw_j + 2  # one truncated ppm on each factor
        assert share_i * raw_j >= share_j * raw_i - slack * 1_000
    # and size ordering is preserved: bigger source never ends below a
    # smaller one
    for a, b in zip(rows_sorted, rows_sorted[1:]):
        assert a[3] <= b[3] + 1


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["signup", "purchase", "click"]),
                  st.integers(0, 25)),
        min_size=2, max_size=200,
    )
)
def test_kmv_is_exact_below_k(events):
    # with <= 26 distinct users per group (< KMV_K=32), every sketch is
    # the full distinct set, so every estimate must be EXACT
    from mongo_to_clickhouse_spark.queries.sketchops import (
        AGG_KMV_THETA_SKETCH_SQL,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
                " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
                " props VARCHAR)")
    con.executemany(
        "INSERT INTO events VALUES (?, TIMESTAMP '2024-01-01', ?, ?,"
        " 1.0, '{}')",
        [(i, u, t) for i, (t, u) in enumerate(events)],
    )
    # the intersection scope needs both groups present
    con.execute("INSERT INTO events VALUES (90001, TIMESTAMP"
                " '2024-01-01', 0, 'signup', 1.0, '{}'),"
                " (90002, TIMESTAMP '2024-01-01', 0, 'purchase',"
                " 1.0, '{}')")
    for row in con.execute(AGG_KMV_THETA_SKETCH_SQL).fetchall():
        scope, exact, n_sk, theta, est = row
        assert est == exact, row
