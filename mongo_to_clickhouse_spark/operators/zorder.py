"""Z-order (Morton) clustering for multi-dimensional file skipping.

A sink partitioned/sorted on ONE column gives parquet min/max pruning on
that column only; queries filtering the other dimension read every file.
Interleaving the bits of two (bucketized) dimensions into a Morton key
and range-partitioning on it bounds EVERY dimension's per-file range —
the layout trick behind Delta/Iceberg `ZORDER BY`, here as a plain
DataFrame expression so Catalyst sees it end to end.

Scale shape: bucketization needs only global min/max per dimension (one
tiny agg, broadcast back — no global window, no rank shuffle), the
Morton key is a pure per-row projection, and the clustered write is one
`repartitionByRange` (range exchange with sampled bounds, the same
mechanism as a global sort but with the interleaved key). Nothing here
is driver-side.

All arithmetic is integer and engine-portable (shift/and/add — DuckDB
writes the identical expression), so the key assignment itself is
DuckDB-oracle-checkable; the file-level clustering property is pinned by
tests/test_zorder.py reading back per-file min/max spreads.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

ZBITS = 8  # per-dimension bucket bits: 256 x 256 lattice -> 16-bit key


def dense_bucket(col: Column, mn: Column, mx: Column, bits: int = ZBITS) -> Column:
    """Map a bigint column into [0, 2^bits) via min/max range scaling.

    floor() over non-negative bigint operands == integer division, which
    DuckDB spells `//` — exact in both engines (operands stay far below
    2^53); the +1 keeps the max value inside the top bucket."""
    return F.floor((col - mn) * (1 << bits) / (mx - mn + 1)).cast("bigint")


def dense_bucket_sql(col: str, mn: str, mx: str, bits: int = ZBITS) -> str:
    """The DuckDB spelling of dense_bucket."""
    return f"(({col} - {mn}) * {1 << bits} // ({mx} - {mn} + 1))"


def interleave_bits(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two bucketized bigints: bit i of x -> bit 2i,
    bit i of y -> bit 2i+1. Terms touch disjoint bits so `+` == `|`
    (and `+` is what DuckDB spells identically)."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def interleave_bits_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """The DuckDB spelling of interleave_bits (same bit algebra)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def hilbert_stages_sql(rel: str, keep: str, bits: int = ZBITS) -> str:
    """Hilbert curve distance d(x, y) on the 2^bits lattice as ``bits``
    unrolled CTE stages over ``rel`` (which must expose bigint columns
    ``hx``/``hy`` in [0, 2^bits) plus the ``keep`` passthrough columns).
    Returns the WITH-clause fragment; the final stage is ``h{bits}``
    with column ``hd``.

    Hilbert beats Morton for range locality (no quadrant jumps: every
    curve step is distance 1, so per-file bounding boxes stay tighter —
    measured by profile_layout_locality). The classic xy→d loop has
    data-dependent reflect/swap per round; each round here is a narrow
    projection with ENGINE-SHARED arithmetic: bit tests are spelled
    ``v % 2s >= s`` and the quadrant code ``(3·rx) XOR ry`` as
    ``rx·(3-ry) + (1-rx)·ry`` — no shift/xor operators, so the same
    string parses in Spark SQL and DuckDB and the key is exact BIGINT
    in both."""
    n = 1 << bits  # lattice size; the rotate step reflects against n-1
    parts = [
        f"h0 AS (SELECT {keep}, CAST(hx AS BIGINT) AS x,"
        f" CAST(hy AS BIGINT) AS y, CAST(0 AS BIGINT) AS hd FROM {rel})"
    ]
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = f"(CASE WHEN x % {2 * s} >= {s} THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN y % {2 * s} >= {s} THEN 1 ELSE 0 END)"
        parts.append(f"""h{i + 1} AS (
            SELECT {keep},
                   CASE WHEN {ry} = 0
                        THEN CASE WHEN {rx} = 1 THEN {n - 1} - y
                                  ELSE y END
                        ELSE x END AS x,
                   CASE WHEN {ry} = 0
                        THEN CASE WHEN {rx} = 1 THEN {n - 1} - x
                                  ELSE x END
                        ELSE y END AS y,
                   hd + {s * s} * ({rx} * (3 - {ry})
                                   + (1 - {rx}) * {ry}) AS hd
            FROM h{i})""")
    return ", ".join(parts)
