"""Plan hygiene: NO query in the registry may plan a no-partition window.

``ROW_NUMBER()/SUM() OVER (ORDER BY ...)`` without PARTITION BY moves the
entire input through ONE task — invisible at test scale, fatal at 100 TB.
Round-2 review found two (BM25 top-k, rarity vocab rank) hiding behind
correct results; both were rewritten (TakeOrderedAndProject / the
two-pass operators in operators/rank.py). This test sweeps every BATCH
registry entry's optimized plan so the class cannot regress silently.
"""

from __future__ import annotations

import re

import pytest

from mongo_to_clickhouse_spark import queries as registry

SRC = "/root/testdata/sf0.001"

# streaming-runtime ids actually RUN a stream when invoked (minutes of
# wall-clock, no batch plan to inspect); the three window-agg forms are
# batch-checkable and stay in scope
_SKIP_PREFIXES = (
    "stream_",
    "source_changestream",
    "checkpoint_resume_token",
    "sink_dlq_log",
    "metric_throughput",
)
_KEEP = {
    "stream_tumbling_window_agg",
    "stream_sliding_window_agg",
    "stream_session_window",
}

_WINDOWSPEC = re.compile(r"windowspecdefinition\(([^)]*)\)")


def _no_partition_windows(plan: str) -> list[str]:
    """windowspecdefinition args list partition columns first, then the
    ORDER BY columns (tagged ASC/DESC); a spec whose FIRST argument is an
    ordered column has an empty partition clause."""
    hits = []
    for m in _WINDOWSPEC.finditer(plan):
        first = m.group(1).split(",")[0]
        if " ASC" in first or " DESC" in first:
            hits.append(m.group(1)[:100])
    return hits


def _batch_ids():
    return sorted(
        qid
        for qid in registry.registry()
        if qid in _KEEP or not qid.startswith(_SKIP_PREFIXES)
    )


@pytest.mark.parametrize("qid", _batch_ids())
def test_no_single_partition_window(spark, qid):
    fn, _ = registry.registry()[qid]
    df = fn(spark, SRC)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    hits = _no_partition_windows(plan)
    assert not hits, (
        f"{qid}: no-partition window(s) in optimized plan — the whole "
        f"input serializes through one task at scale: {hits}"
    )
