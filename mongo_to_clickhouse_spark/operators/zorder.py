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
