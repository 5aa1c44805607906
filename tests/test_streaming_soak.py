"""Streaming soak gates (round 11, VERDICT r10 item 6): drive the two
live index-upsert streams through ~50 micro-batches and assert nothing
grows that shouldn't — catalog temp-view count flat (each foreachBatch
drops its uuid-tagged views), no state store materialized in the
checkpoint (foreachBatch pipelines are stateless by design; state rows
stay zero), and driver+JVM RSS bounded (no per-batch accumulation).

These are the plan-hygiene family's long-run complement: the 3-batch
oracle runs prove correctness, the 50-batch soak proves a resident
ingest service survives days of micro-batches.
"""

from __future__ import annotations

import os
import subprocess

import pytest

SOAK_BATCHES = 50


def _process_tree_rss_kb() -> int:
    """RSS of this python driver plus every descendant (the py4j JVM is
    a child process — the leak surface lives there)."""
    me = os.getpid()
    out = subprocess.run(
        ["ps", "-eo", "pid,ppid,rss"], capture_output=True, text=True,
        check=True,
    ).stdout.splitlines()[1:]
    procs = {}
    for line in out:
        pid, ppid, rss = line.split()
        procs[int(pid)] = (int(ppid), int(rss))
    total, frontier = 0, {me}
    while frontier:
        nxt = set()
        for pid, (ppid, rss) in procs.items():
            if ppid in frontier:
                nxt.add(pid)
        for pid in frontier:
            if pid in procs:
                total += procs[pid][1]
            elif pid == me:
                with open("/proc/self/status") as f:
                    for ln in f:
                        if ln.startswith("VmRSS:"):
                            total += int(ln.split()[1])
        frontier = nxt
    return total


def _gc_rss(spark) -> int:
    import time

    spark._jvm.System.gc()
    time.sleep(1.5)
    return _process_tree_rss_kb()


def _soak(spark, fn, sf_dir, tmp_path, expected_acct_rows):
    views_before = {t.name for t in spark.catalog.listTables()}
    # short warm-up run FIRST: absorbs one-time JVM heap expansion,
    # codegen caches, and parquet footer caches, so the 50-batch growth
    # measured below isolates PER-BATCH accumulation (the first version
    # of this gate measured from a cold heap and read 4.6 GB of lazy
    # heap growth as a leak)
    warm = str(tmp_path / "warm_work")
    os.makedirs(warm)
    fn(spark, sf_dir, n_batches=10, work_dir=warm).collect()
    rss_before = _gc_rss(spark)
    work = str(tmp_path / "soak_work")
    os.makedirs(work)
    out = fn(spark, sf_dir, n_batches=SOAK_BATCHES, work_dir=work)
    rows = out.collect()
    # every micro-batch ran and appended exactly one accounting row
    assert len(rows) == expected_acct_rows
    assert sorted(r["batch_id"] for r in rows) == list(
        range(expected_acct_rows)
    )
    # catalog flat: the per-batch uuid-tagged views were all dropped.
    # (The non-tagged mh_bands/mh_shingled/corpus_* names are
    # cached_barrier_views — one per (session, sf_dir) BY DESIGN, reused
    # across invocations, so they are bounded and excluded here.)
    views_after = {t.name for t in spark.catalog.listTables()}
    leaked = views_after - views_before
    leaked = {
        v for v in leaked
        if v.startswith(("mh_b_", "mh_sh_", "mh_bd_", "mh_idx_",
                         "mh_ish_", "ivf_l_", "ivf_i_"))
    }
    assert not leaked, f"leaked {len(leaked)} temp views: {sorted(leaked)[:5]}"
    # stateless by design: the checkpoint must not materialize a state
    # store (state rows stay zero over any horizon)
    assert not os.path.exists(os.path.join(work, "ckpt", "state"))
    # RSS bounded: 50 batches beyond the warmed baseline must not
    # accrete per-batch driver/JVM memory (post-GC measurement on both
    # sides). Generous bound — heap noise is real — but an unbounded
    # per-batch accumulation (plans, views, listener events at
    # ~40 MB+/batch) blows through it.
    rss_after = _gc_rss(spark)
    growth_mb = (rss_after - rss_before) / 1024
    assert growth_mb < 2000, f"RSS grew {growth_mb:.0f} MB over soak"


def test_minhash_index_upsert_soak(spark, smoke_sf_dir, tmp_path):
    from mongo_to_clickhouse_spark.queries.dedupops import (
        stream_minhash_index_upsert,
    )

    _soak(spark, stream_minhash_index_upsert, smoke_sf_dir, tmp_path,
          SOAK_BATCHES)


def test_ivf_index_upsert_soak(spark, smoke_sf_dir, tmp_path):
    from mongo_to_clickhouse_spark.queries.vectorops import (
        stream_ivf_index_upsert,
    )

    _soak(spark, stream_ivf_index_upsert, smoke_sf_dir, tmp_path,
          SOAK_BATCHES)


def test_default_batch_count_unchanged():
    """The registry ids must keep their oracle-pinned defaults — the
    soak knobs are test-only."""
    from mongo_to_clickhouse_spark.queries.dedupops import (
        _STREAM_UPSERT_BATCHES,
    )
    from mongo_to_clickhouse_spark.queries.vectorops import (
        _STREAM_IVF_BATCHES,
    )

    assert _STREAM_UPSERT_BATCHES == 3
    assert _STREAM_IVF_BATCHES == 3
