"""Vector column helpers — cosine/dot as built-in higher-order functions.

``zip_with`` + ``aggregate`` is a sequential left fold over the array,
which makes the double-precision result bitwise-identical to a C++ loop
(verified against DuckDB's list_dot_product) — no Pandas UDF needed for
exact cross-engine parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product of two float/double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_with_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine reusing precomputed norms (one norm pass per table instead of
    per pair — the only sane form when pairing N×M vectors)."""
    return dot(a, b) / (norm_a * norm_b)
