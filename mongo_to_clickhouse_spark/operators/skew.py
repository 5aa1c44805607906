"""Skew-mitigated joins: key salting.

When a shuffle join key is heavily skewed (a handful of hot keys own most
rows), one reducer gets almost all the data. Salting splits each hot key
into ``salt_factor`` sub-keys: the fact side gets a random-but-deterministic
salt, the dimension side is replicated across all salts, and the join runs
on (key, salt) — spreading each hot key over ``salt_factor`` reducers.

AQE's skew-join handles this automatically for sort-merge joins; explicit
salting remains the tool for aggregation skew and for engines/joins AQE
can't rewrite. The operator is semantics-preserving: results are exactly
those of the unsalted join (which is what the oracle checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⨝dim on ``key`` with the dim side replicated over
    ``salt_factor`` salts. Salt is xxhash64-derived — deterministic, so
    plans stay reproducible."""
    salts = F.array(*[F.lit(i) for i in range(salt_factor)])
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(salt_factor))
    )
    dim_s = dim.withColumn("__salt", F.explode(salts))
    joined = fact_s.join(dim_s, [key, "__salt"], how)
    return joined.drop("__salt")
