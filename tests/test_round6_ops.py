"""Planted-fixture semantics for the round-6 batch: k-core onion
layers, Neyman-optimal stratified allocation, and the PSI drift
monitor."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.graphops import graph_kcore_onion
from mongo_to_clickhouse_spark.queries.sampleops import (
    sample_neyman_allocation,
)
from mongo_to_clickhouse_spark.queries.statsops import sample_psi_drift

_T0 = dt.datetime(2024, 6, 1)


# ---------------------------------------------------------------------------
# graph_kcore_onion
# ---------------------------------------------------------------------------


def test_kcore_onion_planted_layers(spark, tmp_path):
    # Component A: 6-clique of suppliers {1..6} — every node has degree
    # 5 >= KCORE_K=4, so the whole clique survives all peeling rounds
    # (layer -1, the 4-core). Component B: hub 100 joined to four
    # pendants 101-104. Pendants have degree 1 < 4 -> peeled in round 1
    # (layer 1); the hub starts at degree 4 but loses all neighbors
    # after round 1 -> peeled in round 2 (layer 2).
    pairs = []
    oid = 0
    clique = [1, 2, 3, 4, 5, 6]
    for rep in range(3):
        for i in range(len(clique)):
            for j in range(i + 1, len(clique)):
                pairs.append((oid, clique[i]))
                pairs.append((oid, clique[j]))
                oid += 1
    for rep in range(3):
        for pendant in (101, 102, 103, 104):
            pairs.append((oid, 100))
            pairs.append((oid, pendant))
            oid += 1
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([o for o, _ in pairs], pa.int64()),
            "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(lineitem, os.path.join(sf, "lineitem.parquet"))
    got = {
        r["layer"]: (r["n_nodes"], r["min_node"], r["max_node"])
        for r in graph_kcore_onion(spark, sf).collect()
    }
    assert got == {
        -1: (6, 1, 6),      # the 4-core: the full clique
        1: (4, 101, 104),   # pendants peeled first
        2: (1, 100, 100),   # the hub follows one round later
    }


# ---------------------------------------------------------------------------
# sample_neyman_allocation
# ---------------------------------------------------------------------------


def _write_orders(tmp_path, rows):
    """rows: list of (orderkey, totalprice, priority)."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([k for k, _, _ in rows], pa.int64()),
            "o_totalprice": pa.array([p for _, p, _ in rows], pa.float64()),
            "o_orderpriority": pa.array([s for _, _, s in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "orders.parquet"))
    return str(tmp_path)


def test_neyman_zero_variance_stratum_gets_nothing(spark, tmp_path):
    # HIGH: 120 orders, hecto-values 1..10 (S > 0). LOW: 80 orders, all
    # exactly 500 (S = 0 -> weight N_h*S_h = 0 -> zero allocation; it
    # then drops out of the drawn inner join entirely).
    rows = [(i, 100.0 * (i % 10 + 1), "1-HIGH") for i in range(120)]
    rows += [(1000 + i, 500.0, "2-LOW") for i in range(80)]
    out = sample_neyman_allocation(spark, _write_orders(tmp_path, rows))
    got = out.collect()
    assert len(got) == 1
    (r,) = got
    assert r["stratum"] == "1-HIGH"
    assert r["stratum_size"] == 120
    # budget = 10% of 200 = 20, all of it to the only varying stratum
    assert r["n_alloc"] == 20 and r["n_drawn"] == 20


def test_neyman_allocation_proportional_to_size_at_equal_variance(
    spark, tmp_path
):
    # Same value pattern (same S_h) in both strata, sizes 300 vs 100:
    # n_h proportional to N_h -> 30 / 10 of the 40-draw budget, summing
    # exactly to the budget (largest-remainder closes the gap).
    rows = [(i, 100.0 * (i % 10 + 1), "A") for i in range(300)]
    rows += [(5000 + i, 100.0 * (i % 10 + 1), "B") for i in range(100)]
    got = {
        r["stratum"]: r
        for r in sample_neyman_allocation(
            spark, _write_orders(tmp_path, rows)
        ).collect()
    }
    assert got["A"]["n_alloc"] == 30 and got["B"]["n_alloc"] == 10
    # same value pattern -> same population SD; the sample-SD Bessel
    # factor n/(n-1) differs slightly between 300 and 100 rows
    assert abs(got["A"]["s_micro"] - got["B"]["s_micro"]) < 20_000
    assert all(r["n_drawn"] == r["n_alloc"] for r in got.values())


# ---------------------------------------------------------------------------
# sample_psi_drift
# ---------------------------------------------------------------------------


def _write_events(tmp_path, values):
    n = len(values)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([_T0] * n, pa.timestamp("us")),
            "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_psi_disjoint_supports_alert(spark, tmp_path):
    # A (even ids) near 1.0, B (odd ids) near 100.0 — fully disjoint
    # bin supports push PSI far past the 0.2 alert bar.
    values = [
        1.0 + (i % 10) * 0.1 if i % 2 == 0 else 100.0 + (i % 10) * 0.1
        for i in range(400)
    ]
    rows = sample_psi_drift(spark, _write_events(tmp_path, values)).collect()
    (total,) = [r for r in rows if r["bin"] == -999]
    assert total["n_a"] == 200 and total["n_b"] == 200
    assert total["psi_micro"] > 1_000_000  # PSI >> 1 on disjoint supports
    assert total["warn"] and total["alert"]
    # top contributing bins reported alongside the scalar
    assert len(rows) == 1 + 5


def test_psi_identical_halves_zero(spark, tmp_path):
    # consecutive (even, odd) pairs share a value -> per-bin counts are
    # identical and na == nb, so every log-ratio is exactly ln(1) = 0.
    values = [float((i // 2) % 50) for i in range(800)]
    rows = sample_psi_drift(spark, _write_events(tmp_path, values)).collect()
    (total,) = [r for r in rows if r["bin"] == -999]
    assert total["psi_micro"] == 0
    assert not total["warn"] and not total["alert"]
