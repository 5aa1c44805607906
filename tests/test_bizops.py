"""Planted-fixture semantics for the round-7 BI/monitoring batch
(bizops.py): RFM quintiles, max drawdown, Mann-Whitney U (incl. the
all-ties degenerate guard), Cramér's V with empty contingency cells,
Nelson-Aalen hazard, and the Benford audit."""

from __future__ import annotations

import datetime as dt
import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.bizops import (
    agg_cramers_v,
    agg_kendall_tau_daily,
    agg_kruskal_wallis,
    agg_mann_whitney_u,
    agg_spearman_rho_daily,
    events_bollinger_bands,
    events_ewma_smooth,
    events_hazard_nelson_aalen,
    events_rfm_segments,
    profile_benford_deviation,
    profile_gini_coefficient,
    window_max_drawdown,
)

_T0 = dt.datetime(2024, 3, 1)


def _events(rows, path):
    """rows: (event_id, ts, user_id, event_type, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(path, "events.parquet"))


def test_rfm_perfectly_correlated_users(spark, tmp_path):
    # user u (1..10) has u events, all on day u, each worth u dollars:
    # recency rank, frequency rank and monetary rank all order users
    # 10,9,...,1, so every user lands in the SAME quintile on all three
    # axes -> exactly 5 diagonal cells of 2 users each.
    rows = []
    eid = 0
    for u in range(1, 11):
        for k in range(u):
            rows.append(
                (eid, _T0 + dt.timedelta(days=u, minutes=k), u, "click",
                 float(u)))
            eid += 1
    _events(rows, str(tmp_path))
    got = [
        (r.r_q, r.f_q, r.m_q, r.n_users, r.n_events, r.mon_cents)
        for r in events_rfm_segments(spark, str(tmp_path)).collect()
    ]
    # diagonal cells: quintile q holds users {10-2q+1, 10-2q+2}... i.e.
    # q=1 -> users 9,10 (19 events, 9*900+10*1000 cents)
    assert got == [
        (1, 1, 1, 2, 19, 9 * 900 + 10 * 1000),
        (2, 2, 2, 2, 15, 7 * 700 + 8 * 800),
        (3, 3, 3, 2, 11, 5 * 500 + 6 * 600),
        (4, 4, 4, 2, 7, 3 * 300 + 4 * 400),
        (5, 5, 5, 2, 3, 1 * 100 + 2 * 200),
    ]


def test_max_drawdown_planted_path(spark, tmp_path):
    # balances (cents): 1000, 500, 700, -100 -> running peak stays 1000,
    # drawdowns 0, 500, 300, 1100 -> max 1100. A second flat user pins 0.
    rows = [
        (0, _T0, 1, "click", 10.00),
        (1, _T0 + dt.timedelta(minutes=1), 1, "click", -5.00),
        (2, _T0 + dt.timedelta(minutes=2), 1, "click", 2.00),
        (3, _T0 + dt.timedelta(minutes=3), 1, "click", -8.00),
        (4, _T0, 2, "click", 3.00),
        (5, _T0 + dt.timedelta(minutes=1), 2, "click", 1.00),
    ]
    _events(rows, str(tmp_path))
    got = {
        r.user_id: r.max_drawdown_cents
        for r in window_max_drawdown(spark, str(tmp_path)).collect()
    }
    assert got == {1: 1100, 2: 0}


def test_mann_whitney_separated_and_tied(spark, tmp_path):
    # clicks at 1,2,3 cents; errors at 4,5,6 cents: R1 = 6 (2R1=12),
    # U1 = 0, no ties -> z = (0 - 4.5)/sqrt(9*7/12)
    rows = [
        (0, _T0, 1, "click", 0.01),
        (1, _T0, 1, "click", 0.02),
        (2, _T0, 1, "click", 0.03),
        (3, _T0, 1, "error", 0.04),
        (4, _T0, 1, "error", 0.05),
        (5, _T0, 1, "error", 0.06),
    ]
    _events(rows, str(tmp_path))
    r = agg_mann_whitney_u(spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.u1_x2) == (3, 3, 0)
    z = (0 - 4.5) / math.sqrt(9 * 7 / 12.0)
    assert r.z_micro == math.floor(z * 1e6)


def test_mann_whitney_all_ties_is_null(spark, tmp_path):
    # every observation identical -> tie-corrected variance is exactly 0
    # -> z must be NULL (the agg_ttest_welch ADVICE degenerate class),
    # not an error or an inf artifact
    rows = [
        (i, _T0, 1, "click" if i < 3 else "error", 0.50) for i in range(6)
    ]
    _events(rows, str(tmp_path))
    r = agg_mann_whitney_u(spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2) == (3, 3)
    assert r.z_micro is None


def test_cramers_v_perfect_association_with_empty_cells(spark, tmp_path):
    # seg A only in nation 1, seg B only in nation 2 (5 customers each):
    # the 2x2 grid has two EMPTY cells, each contributing e=2.5 to chi2;
    # chi2 = 10 = n and V = sqrt(chi2/(n*1)) = 1. Dropping empty cells
    # would give chi2 = 5, V ~ 0.707 — the planted regression.
    cust = pa.table(
        {
            "c_custkey": pa.array(list(range(10)), pa.int64()),
            "c_mktsegment": pa.array(["A"] * 5 + ["B"] * 5),
            "c_nationkey": pa.array([1] * 5 + [2] * 5, pa.int32()),
        }
    )
    pq.write_table(cust, os.path.join(str(tmp_path), "customer.parquet"))
    r = agg_cramers_v(spark, str(tmp_path)).collect()[0]
    assert (r.n, r.n_rows, r.n_cols) == (10, 2, 2)
    assert r.chi2_micro == 10_000_000
    assert r.cramers_v_micro == 1_000_000


def test_nelson_aalen_planted_hazard(spark, tmp_path):
    # u1 converts at +1h, u2 at +2h, u3 censored at +3h:
    # dur 1: n_risk=3, d=1 -> H = 1/3; dur 2: n_risk=2, d=1 -> H=1/3+1/2
    rows = [
        (0, _T0, 1, "view", 1.0),
        (1, _T0 + dt.timedelta(hours=1), 1, "purchase", 1.0),
        (2, _T0, 2, "view", 1.0),
        (3, _T0 + dt.timedelta(hours=2), 2, "purchase", 1.0),
        (4, _T0, 3, "view", 1.0),
        (5, _T0 + dt.timedelta(hours=3), 3, "view", 1.0),
    ]
    _events(rows, str(tmp_path))
    got = [
        (r.dur_h, r.n_converted, r.n_risk, r.hazard_micro,
         r.hazard_var_pico)
        for r in events_hazard_nelson_aalen(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (1, 1, 3, 333333, 111111111111),
        (2, 1, 2, 333333 + 500000, 111111111111 + 250000000000),
    ]


def test_benford_expected_and_total(spark, tmp_path):
    # uniform first digits 1..9 (one item each): expected_micro is the
    # Benford pmf times n=9; chi2 total equals the sum of per-digit
    # terms and is identical on every row
    li = pa.table(
        {
            "l_extendedprice": pa.array(
                [float(d) for d in range(1, 10)], pa.float64()
            )
        }
    )
    pq.write_table(li, os.path.join(str(tmp_path), "lineitem.parquet"))
    rows = profile_benford_deviation(spark, str(tmp_path)).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    terms = []
    for r in rows:
        p = math.log10(1 + 1.0 / r.digit)
        assert r.observed == 1
        assert r.expected_micro == math.floor(9 * p * 1e6)
        terms.append(math.floor((1 - 9 * p) ** 2 / (9 * p) * 1e6))
        assert r.term_micro == terms[-1]
    assert {r.chi2_micro for r in rows} == {sum(terms)}


def test_ewma_impulse_decay(spark, tmp_path):
    # one 400-cent day then silence: s_t = 400 * (1/4)(3/4)^t exactly
    # (zero-padded truncation never bites within 3 days)
    rows = [
        (0, _T0, 1, "click", 4.00),
        (1, _T0 + dt.timedelta(days=1), 1, "click", 0.0),
        (2, _T0 + dt.timedelta(days=2), 1, "click", 0.0),
    ]
    _events(rows, str(tmp_path))
    got = [
        r.ewma_cents_micro
        for r in events_ewma_smooth(spark, str(tmp_path)).collect()
    ]
    assert got == [100_000_000, 75_000_000, 56_250_000]


def test_bollinger_spike_breach(spark, tmp_path):
    # five flat 100-cent days then a 200-cent spike: only the spike
    # breaches (upper band at day 5 ~ 191 cents); flat days sit AT the
    # mean (breach 0), and the day-0 single-row frame has sigma 0
    rows = [
        (i, _T0 + dt.timedelta(days=i), 1, "click", 1.00) for i in range(5)
    ] + [(5, _T0 + dt.timedelta(days=5), 1, "click", 2.00)]
    _events(rows, str(tmp_path))
    out = events_bollinger_bands(spark, str(tmp_path)).collect()
    assert [r.breach for r in out] == [0, 0, 0, 0, 0, 1]
    assert out[0].mean_cents_micro == 100_000_000
    assert out[0].upper_cents_micro == 100_000_000  # sigma 0 frame
    # day-5 frame: n=6, s1=700, var=(6*140000-490000)/36
    n, s1, s2 = 6, 700, 5 * 100 * 100 + 200 * 200
    upper = s1 / n + 2 * math.sqrt(n * s2 - s1 * s1) / n
    assert out[5].upper_cents_micro == math.floor(upper * 1e6)


def test_kendall_perfect_and_spearman_inverse(spark, tmp_path):
    # clicks strictly increasing by day; purchases strictly DECREASING:
    # every pair discordant -> tau_b = -1; spearman rho = -1
    rows = []
    eid = 0
    for d in range(4):
        rows.append((eid, _T0 + dt.timedelta(days=d), 1, "click",
                     float(d + 1)))
        eid += 1
        rows.append((eid, _T0 + dt.timedelta(days=d), 2, "purchase",
                     float(10 - d)))
        eid += 1
    _events(rows, str(tmp_path))
    kt = agg_kendall_tau_daily(spark, str(tmp_path)).collect()[0]
    assert (kt.n_pairs, kt.concordant, kt.discordant) == (6, 0, 6)
    assert kt.tau_b_micro == -1_000_000
    sp = agg_spearman_rho_daily(spark, str(tmp_path)).collect()[0]
    assert sp.n_days == 4
    assert sp.rho_micro == -1_000_000


def test_kruskal_wallis_separated_groups(spark, tmp_path):
    # clicks at 1,2,3 cents; errors at 4,5,6: doubled rank sums 12/30,
    # H = 12/(6*7)*(36/3+225/3) - 21 = 27/7; no ties -> corr term = 1
    rows = [
        (0, _T0, 1, "click", 0.01),
        (1, _T0, 1, "click", 0.02),
        (2, _T0, 1, "click", 0.03),
        (3, _T0, 1, "error", 0.04),
        (4, _T0, 1, "error", 0.05),
        (5, _T0, 1, "error", 0.06),
    ]
    _events(rows, str(tmp_path))
    got = {
        r.event_type: (r.n_j, r.r2_j, r.h_micro, r.h_tie_corr_micro)
        for r in agg_kruskal_wallis(spark, str(tmp_path)).collect()
    }
    h = math.floor((12.0 * (12 + 75) / (6 * 7) - 3 * 7) * 1e6)
    assert got == {
        "click": (3, 12, h, h),
        "error": (3, 30, h, h),
    }


def test_gini_two_customer_concentration(spark, tmp_path):
    # revenues 100 and 300 cents: G = (2*(1*100+2*300) - 3*400)/(2*400)
    # = 0.25 exactly
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 2], pa.int64()),
            "o_totalprice": pa.array([1.00, 3.00], pa.float64()),
        }
    )
    pq.write_table(orders, os.path.join(str(tmp_path), "orders.parquet"))
    r = profile_gini_coefficient(spark, str(tmp_path)).collect()[0]
    assert (r.n_customers, r.total_cents) == (2, 400)
    assert r.gini_micro == 250_000


def test_sprt_decides_both_ways(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.bizops import (
        _SPRT_L0,
        _SPRT_L1,
        agg_sprt_sequential,
    )

    # arm 0 (even users): 6 purchases on day 0 -> 6*L1 crosses +ln(19)
    # immediately; arm 1 (odd users): all views, 6 on day 0 (continue)
    # then 20 more on day 1 -> 26*L0 crosses -ln(19)
    rows = []
    eid = 0
    for _ in range(6):
        rows.append((eid, _T0, 2, "purchase", 1.0)); eid += 1
        rows.append((eid, _T0, 1, "view", 1.0)); eid += 1
    for _ in range(20):
        rows.append((eid, _T0 + dt.timedelta(days=1), 1, "view", 1.0))
        eid += 1
    _events(rows, str(tmp_path))
    got = {
        (r.arm, r.day_idx): (r.llr_micro, r.state, r.first_decision_day)
        for r in agg_sprt_sequential(spark, str(tmp_path)).collect()
    }
    d0 = min(d for (_, d) in got)
    assert got[(0, d0)] == (6 * _SPRT_L1, "accept_h1", d0)
    assert got[(1, d0)] == (6 * _SPRT_L0, "continue", d0 + 1)
    assert got[(1, d0 + 1)] == (26 * _SPRT_L0, "accept_h0", d0 + 1)


def test_forecast_backtest_exact_mape(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.bizops import (
        events_forecast_ewma_backtest,
    )

    # day0 400 cents, day1 300 cents: day-1 forecast = EWMA(day0) = 100
    # -> APE = 2/3; next forecast = 300/4 + 400*3/16 = 150 cents
    rows = [
        (0, _T0, 1, "click", 4.00),
        (1, _T0 + dt.timedelta(days=1), 1, "click", 3.00),
    ]
    _events(rows, str(tmp_path))
    r = events_forecast_ewma_backtest(spark, str(tmp_path)).collect()[0]
    assert (r.event_type, r.n_backtest) == ("click", 1)
    assert r.mape_ppm == 666666
    assert r.next_forecast_cents_micro == 150_000_000


def test_summing_merge_zero_sum_survives(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.clickhouseops import (
        cdc_summing_merge,
    )

    # +5.00 and -5.00 for the same key collapse to a SURVIVING zero row
    # (the Summing-vs-Collapsing difference); non-summed column pinned
    # to MIN(event_id)
    rows = [
        (7, _T0, 1, "click", 5.00),
        (8, _T0 + dt.timedelta(minutes=1), 1, "click", -5.00),
        (9, _T0, 2, "view", 1.00),
    ]
    _events(rows, str(tmp_path))
    got = {
        (r.user_id, r.event_type): (r.sum_cents, r.n_merged, r.any_event_id)
        for r in cdc_summing_merge(spark, str(tmp_path)).collect()
    }
    assert got == {(1, "click"): (0, 2, 7), (2, "view"): (100, 1, 9)}


def test_cuped_perfect_covariate(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.bizops import (
        events_cuped_adjustment,
    )

    # post = 2*pre exactly for users 1..4: pooled theta = 2, BOTH arms'
    # adjusted means collapse to the pooled post mean (5.0 dollars) and
    # the variance reduction is exactly 100%
    rows, eid = [], 0
    for u in range(1, 5):
        rows.append((eid, _T0, u, "click", float(u))); eid += 1          # pre
        rows.append((eid, _T0 + dt.timedelta(days=20), u, "click",
                     float(2 * u))); eid += 1                            # post
    _events(rows, str(tmp_path))
    got = {r.arm: (r.n_a, r.mean_post_micro, r.mean_adj_micro,
                   r.theta_micro, r.var_reduction_ppm)
           for r in events_cuped_adjustment(spark, str(tmp_path)).collect()}
    assert got[0] == (2, 6_000_000, 5_000_000, 2_000_000, 1_000_000)
    assert got[1] == (2, 4_000_000, 5_000_000, 2_000_000, 1_000_000)


def test_ratio_delta_zero_and_nonzero_se(spark, tmp_path):
    import math

    from mongo_to_clickhouse_spark.queries.bizops import (
        agg_ratio_metric_delta,
    )

    # arm 0 (even users): dollars exactly 2 per event for every user ->
    # residuals 0, se 0, CI degenerate at the ratio. arm 1: residuals
    # +-2 -> se = 1 dollar/event, CI = 1 -/+ 1.959964
    rows, eid = [], 0
    def user(u, dollars, k):
        nonlocal eid
        rows.append((eid, _T0, u, "click", float(dollars))); eid += 1
        for _ in range(k - 1):
            rows.append((eid, _T0, u, "view", 0.0)); eid += 1
    user(2, 4, 2); user(4, 8, 4)     # arm 0: c = 2k
    user(1, 3, 1); user(3, 1, 3)     # arm 1: R = 1, residuals +-2
    _events(rows, str(tmp_path))
    got = {r.arm: r for r in
           agg_ratio_metric_delta(spark, str(tmp_path)).collect()}
    a0 = got[0]
    assert (a0.sum_dollars, a0.sum_events) == (12, 6)
    assert (a0.ratio_micro, a0.se_micro) == (2_000_000, 0)
    assert a0.ci_lo_micro == a0.ci_hi_micro == 2_000_000
    a1 = got[1]
    assert (a1.sum_dollars, a1.sum_events) == (4, 4)
    assert (a1.ratio_micro, a1.se_micro) == (1_000_000, 1_000_000)
    assert a1.ci_lo_micro == math.floor((1 - 1.959964) * 1e6)
    assert a1.ci_hi_micro == math.floor((1 + 1.959964) * 1e6)


def test_error_budget_burn_alert_ladder(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.bizops import (
        events_error_budget_burn,
    )

    # hour 0: 1 error in 100 events (burn 0.2x) -> ok
    # hour 1: 80 errors in 100 -> 1h burn 16x, 6h burn 8.1x -> page
    rows, eid = [], 0
    for k in range(100):
        rows.append((eid, _T0 + dt.timedelta(seconds=k),
                     1, "error" if k == 0 else "click", 1.0)); eid += 1
    for k in range(100):
        rows.append((eid, _T0 + dt.timedelta(hours=1, seconds=k),
                     1, "error" if k < 80 else "click", 1.0)); eid += 1
    _events(rows, str(tmp_path))
    out = events_error_budget_burn(spark, str(tmp_path)).collect()
    h0 = min(r.hour_idx for r in out)
    got = {r.hour_idx - h0: (r.burn_1h_ppm, r.alert) for r in out}
    assert got[0] == (200_000, "ok")         # burn 0.2x
    assert got[1] == (16_000_000, "page")    # 16x fast, 8.1x long


def test_winsorized_mean_clamps_whale(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.bizops import agg_winsorized_mean

    # 99 events at 1.00 and one 10000.00 whale: 5% winsorization clamps
    # the whale to the 95th-percentile value (100 cents), so the
    # winsorized mean is exactly 1.00 while the raw mean is ~101
    rows = [(k, _T0, 1, "click", 1.00) for k in range(99)]
    rows.append((99, _T0, 1, "click", 10_000.00))
    _events(rows, str(tmp_path))
    r = agg_winsorized_mean(spark, str(tmp_path)).collect()[0]
    assert (r.n, r.lo_cents, r.hi_cents) == (100, 100, 100)
    assert r.winsorized_mean_micro == 100_000_000
    assert r.raw_mean_micro == ((99 * 100 + 1_000_000) * 1_000_000) // 100


def test_contribution_wow_sums_to_total_move(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.bizops import (
        events_contribution_wow,
    )

    # weeks 0/1/2: clicks 10->30 dollars (delta +2000 cents), errors
    # 20->10 (delta -1000); week 2 exists only to mark week 1 as the
    # last FULL week. total move +1000 -> shares +2e6 / -1e6 ppm
    rows = [
        (0, _T0, 1, "click", 10.0),
        (1, _T0 + dt.timedelta(days=7), 1, "click", 30.0),
        (2, _T0, 1, "error", 20.0),
        (3, _T0 + dt.timedelta(days=7), 1, "error", 10.0),
        (4, _T0 + dt.timedelta(days=14), 1, "view", 1.0),
    ]
    _events(rows, str(tmp_path))
    got = {r.event_type: (r.prev_cents, r.cur_cents, r.delta_cents,
                          r.share_of_move_ppm)
           for r in events_contribution_wow(spark, str(tmp_path)).collect()}
    assert got["click"] == (1000, 3000, 2000, 2_000_000)
    assert got["error"] == (2000, 1000, -1000, -1_000_000)
    assert got["view"] == (0, 0, 0, 0)
    assert sum(v[2] for v in got.values()) == 1000


def test_seasonal_decomposition_components_add_up(spark, tmp_path):
    from mongo_to_clickhouse_spark.queries.bizops import (
        events_seasonal_decomposition,
    )

    # 14 days of pure weekday pattern (dow d -> (d+1) dollars): the
    # 7-day MA is flat at 4.00, seasonal absorbs the full dow offset,
    # residuals are exactly 0 on every interior day
    rows = [
        (d, _T0 + dt.timedelta(days=d), 1, "click", float((d % 7) + 1))
        for d in range(14)
    ]
    _events(rows, str(tmp_path))
    out = events_seasonal_decomposition(spark, str(tmp_path)).collect()
    assert len(out) == 8  # days 3..10 have full centered windows
    assert all(r.trend_micro == 400_000_000 for r in out)  # 4.00 dollars
    assert all(r.residual_micro == 0 for r in out)
    # components reconstruct the series: cents = trend + seasonal
    assert all(r.trend_micro + r.seasonal_micro == r.cents * 1_000_000
               for r in out)


def test_power_mde_known_variance(spark, tmp_path):
    import math

    from mongo_to_clickhouse_spark.queries.bizops import agg_power_mde

    # arm 0 users at 1 and 3 dollars (var 1), arm 1 users at 2 and 6
    # (var 4): MDE = 2.801585 * sqrt(1/2 + 4/2)
    rows = [
        (0, _T0, 2, "click", 1.0),
        (1, _T0, 4, "click", 3.0),
        (2, _T0, 1, "click", 2.0),
        (3, _T0, 3, "click", 6.0),
    ]
    _events(rows, str(tmp_path))
    r = agg_power_mde(spark, str(tmp_path)).collect()[0]
    assert (r.n0, r.n1) == (2, 2)
    assert r.pooled_mean_micro == 3_000_000
    mde = (1.959964 + 0.841621) * math.sqrt(1 / 2 + 4 / 2)
    assert r.mde_abs_micro == math.floor(mde * 1e6)
    assert r.mde_rel_ppm == math.floor(mde / 3.0 * 1e6)
