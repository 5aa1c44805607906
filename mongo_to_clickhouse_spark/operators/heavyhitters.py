"""Misra-Gries heavy-hitter candidate generation.

The scale problem: finding frequent keys with a plain
``GROUP BY key`` shuffles the FULL key cardinality — at 100 TB a
vocabulary-sized exchange per query. The classic fix is a two-phase
plan:

1. **Candidates** — each input partition runs a Misra-Gries summary
   (bounded memory: ``capacity`` counters, one pass, no shuffle). MG's
   guarantee is that any key whose partition-local count exceeds
   ``N_p / capacity`` survives the summary; summed over partitions, any
   key with GLOBAL count > N / capacity survives in at least one
   partition — so with ``capacity >= 1/support`` the candidate union has
   **no false negatives** for the support threshold.
2. **Exact recount** — the candidate set is tiny
   (<= capacity x partitions), so it broadcasts; a left-semi join prunes
   the stream to candidate keys only, and the exact ``GROUP BY`` that
   follows shuffles candidate keys instead of the full vocabulary.
   False positives die at the HAVING filter, so the final answer is
   EXACTLY the plain-SQL answer — which is what lets a DuckDB oracle
   check a sketch-based plan verbatim.

The reference engine has no frequency-sketch surface (SURVEY §2 — its
aggregation tier is exact GROUP BY only); this is extension surface for
the training-data-pipeline tier
(vocabulary truncation, hot-key detection ahead of skew salting).

The per-partition kernel is an Arrow-batched ``mapInPandas`` with a
plain dict — O(1) amortized per row, ``capacity`` entries of state,
independent of partition size. Batch updates use the counts-at-once
form of MG (process each distinct value's batch count in one arithmetic
step); any interleaving of arrivals yields a valid MG run, so the error
bound is order-independent.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _mg_update(counters: dict, capacity: int, tok, c: int) -> None:
    """Feed ``c`` arrivals of ``tok`` into a Misra-Gries summary."""
    if tok in counters:
        counters[tok] += c
        return
    while c > 0:
        if len(counters) < capacity:
            counters[tok] = c
            return
        # c arrivals of an untracked key: each decrements ALL counters by
        # 1 until a slot frees; d arrivals are absorbed at once, where d
        # is bounded by the current minimum counter
        d = min(c, min(counters.values()))
        c -= d
        for k in list(counters):
            counters[k] -= d
            if counters[k] == 0:
                del counters[k]


def _mg_partition(col: str, capacity: int):
    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for tok, c in pdf[col].value_counts().items():
                _mg_update(counters, capacity, tok, int(c))
        if counters:
            yield pd.DataFrame({col: list(counters.keys())})

    return fn


def misra_gries_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition MG summaries, unioned and deduplicated.

    Output is a candidate-key relation of at most
    ``capacity * num_partitions`` rows containing every key whose global
    frequency exceeds ``count(df) / capacity`` (no false negatives; may
    contain false positives — recount to finalize).
    """
    field = df.schema[col]
    return (
        df.select(col)
        .mapInPandas(
            _mg_partition(col, capacity),
            schema=f"{field.name} {field.dataType.simpleString()}",
        )
        .distinct()
    )
