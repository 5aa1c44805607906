"""operators/autoscale.py: the Python knob derivations and their SQL
mirrors must agree EXACTLY in both engines at every corpus size —
including every clamp boundary and every occupancy threshold — or the
derived-knob design desynchronizes the Spark plan from its oracle.
"""

from __future__ import annotations

import duckdb
import pytest

from mongo_to_clickhouse_spark.operators.autoscale import (
    bits_for,
    bits_for_sql,
    ceil_div_clamped,
    ceil_div_clamped_sql,
    isqrt_clamped,
    isqrt_clamped_sql,
)

# every threshold/clamp boundary ±1 for the default knob values, plus a
# spread of ordinary sizes
_BOUNDARY_NS = sorted(
    {1, 2, 7, 8, 9, 63, 64, 65, 100, 500, 2000, 5000, 20000, 50000}
    | {32 << b for b in range(4, 13)}
    | {(32 << b) + 1 for b in range(4, 13)}
    | {(32 << b) - 1 for b in range(4, 13)}
    | {k * k for k in (8, 22, 141, 4096)}
    | {k * k + 1 for k in (8, 22, 141, 4096)}
    | {128 * k for k in (16, 17, 4096)}
    | {128 * k + 1 for k in (16, 4096)}
    | {10**6, 10**9}
)


def _duck_eval(expr: str) -> int:
    return duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]


@pytest.mark.parametrize("n", _BOUNDARY_NS)
def test_bits_for_sql_mirror(n):
    assert _duck_eval(bits_for_sql(str(n), 32, 4, 12)) == bits_for(
        n, 32, 4, 12
    )


@pytest.mark.parametrize("n", _BOUNDARY_NS)
def test_isqrt_clamped_sql_mirror(n):
    assert _duck_eval(isqrt_clamped_sql(str(n), 8, 4096)) == isqrt_clamped(
        n, 8, 4096
    )


@pytest.mark.parametrize("n", _BOUNDARY_NS)
def test_ceil_div_clamped_sql_mirror(n):
    assert _duck_eval(
        ceil_div_clamped_sql(str(n), 128, 16, 4096)
    ) == ceil_div_clamped(n, 128, 16, 4096)


def test_isqrt_dense_range_and_perfect_squares():
    """floor(double sqrt) vs math.isqrt over a dense small range and
    around perfect squares at realistic corpus magnitudes."""
    ns = list(range(1, 2000))
    ns += [k * k + d for k in (10**3, 10**4, 10**5) for d in (-1, 0, 1)]
    rows = duckdb.sql(
        "SELECT n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) "
        "FROM (SELECT unnest(?) AS n)",
        params=[ns],
    ).fetchall()
    import math

    for n, got in rows:
        assert got == math.isqrt(n), n


def test_spark_side_helpers_match_python(spark):
    """The Spark-dialect evaluation of the SAME expression strings (used
    when an oracle body is dual-dialect) agrees with the Python mirror."""
    for n in (500, 2000, 20000, 123456):
        got = spark.sql(
            f"SELECT {bits_for_sql(str(n), 32, 4, 12)} AS b,"
            f" {isqrt_clamped_sql(str(n), 8, 4096)} AS k"
        ).collect()[0]
        assert got.b == bits_for(n, 32, 4, 12)
        assert got.k == isqrt_clamped(n, 8, 4096)


def test_derived_knobs_monotone_and_bounded():
    """Sanity on the shipped derivations: occupancy targets hold and
    the knobs move monotonically with n."""
    from mongo_to_clickhouse_spark.queries.pipelineops import phash_bits
    from mongo_to_clickhouse_spark.queries.vectorops import (
        cent_stride,
        ivf_k,
        lsh_bits,
        semdedup_k,
    )

    prev = (0, 0, 0, 0)
    for n in (100, 500, 2000, 20000, 200000, 2000000):
        cur = (ivf_k(n), lsh_bits(n), semdedup_k(n), phash_bits(n))
        assert cur >= prev
        prev = cur
        # expected-occupancy contracts (within clamps)
        if 64 <= n <= 4096 * 4096:
            assert n // ivf_k(n) <= 2 * ivf_k(n) + 1  # lists ≈ √n
        if n <= 32 << 12:
            assert n <= 32 * (1 << lsh_bits(n)) or lsh_bits(n) == 12
        if 16 * 128 <= n <= 4096 * 128:
            assert (n + semdedup_k(n) - 1) // semdedup_k(n) <= 128
        assert cent_stride(n) >= 1
