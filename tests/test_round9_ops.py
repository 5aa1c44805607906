"""Round-9 operator tests: streaming IVF index maintenance and the
WordPiece kernel twin."""

from __future__ import annotations

import glob
import os
import tempfile

import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# stream_ivf_index_upsert
# ---------------------------------------------------------------------------


def test_stream_ivf_upsert_consistent_with_oneshot_build(spark, sf_dir):
    """Cross-operator invariants vs the one-shot kernel build:
    assignment is batch-order-independent (fixed centroids), so the
    stream's final cumulative index must equal the one-shot
    kernel_assign_frame over the same vectors; the accounting must
    telescope; and the Σ|list|² audit must be non-decreasing (lists
    only grow)."""
    from mongo_to_clickhouse_spark.io import load_table
    from mongo_to_clickhouse_spark.queries.vectorops import (
        CENTROID_MODULUS,
        IVF_MAX_CENTROIDS,
        kernel_assign_frame,
        stream_ivf_index_upsert,
    )

    acct = stream_ivf_index_upsert(spark, sf_dir).collect()
    assert [r.batch_id for r in acct] == [0, 1, 2]

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cents = emb.filter(
        (F.col("vec_id") % CENTROID_MODULUS == 0)
        & (F.col("vec_id") < CENTROID_MODULUS * IVF_MAX_CENTROIDS)
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_emb"),
    )
    oneshot = kernel_assign_frame(emb, cents)
    n_total = emb.count()
    n_new = emb.filter(F.col("vec_id") % 10 == 3).count()

    # telescoping: index totals advance exactly by each batch's inserts
    assert acct[-1].n_index_total == n_total
    assert sum(r.n_assigned for r in acct) == n_new
    for prev, cur in zip(acct, acct[1:]):
        assert cur.n_index_total == prev.n_index_total + cur.n_assigned
        assert cur.sum_list_sq >= prev.sum_list_sq  # lists only grow
        assert cur.max_list >= prev.max_list

    # final audit row equals the one-shot build's list profile
    per = (
        oneshot.groupBy("cent_id").count()
        .agg(
            F.sum("count").alias("n"),
            F.sum(F.col("count") * F.col("count")).alias("sq"),
            F.max("count").alias("mx"),
        )
        .collect()[0]
    )
    assert acct[-1].n_index_total == per.n
    assert acct[-1].sum_list_sq == per.sq
    assert acct[-1].max_list == per.mx


def test_stream_ivf_upsert_cleans_work_dir(spark, sf_dir):
    from mongo_to_clickhouse_spark.queries.vectorops import (
        stream_ivf_index_upsert,
    )

    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "ivfup-*")))
    rows = stream_ivf_index_upsert(spark, sf_dir).collect()
    assert len(rows) == 3  # must survive the work-dir removal
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "ivfup-*")))
    assert after <= before


# ---------------------------------------------------------------------------
# tokenizer_wordpiece_apply — kernel twin edge cases
# ---------------------------------------------------------------------------


def test_wordpiece_kernel_trunc_and_parity(spark, tmp_path):
    """A word longer than WP_MAX_PIECES * WP_MAXLEN chars cannot finish
    in the round budget -> [TRUNC]; full oracle parity on the planted
    corpus (exercises sentinel rows, greedy longest-match, and the
    '##' continuation path in the mapInPandas kernel)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mongo_to_clickhouse_spark.io import clear_scan_cache
    from mongo_to_clickhouse_spark.operators.materialize import (
        clear_barrier_view_cache,
    )
    from mongo_to_clickhouse_spark.queries.tokenizerops import (
        TOKENIZER_WORDPIECE_APPLY_SQL,
        WP_MAXLEN,
        WP_MAX_PIECES,
        tokenizer_wordpiece_apply,
    )
    from tests.oracle_harness import compare

    long_word = "ab" * (WP_MAX_PIECES * WP_MAXLEN)  # 2x the budget
    texts = ["the cat sat on the mat", f"prefix {long_word} suffix",
             "the cat ran", "unrelated words here"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["web"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    clear_scan_cache()
    clear_barrier_view_cache()
    got = {r.piece: r.n_occurrences
           for r in tokenizer_wordpiece_apply(spark, str(tmp_path)).collect()}
    assert got.get("[TRUNC]", 0) >= 1
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}')"
    )
    problems = compare(
        tokenizer_wordpiece_apply(spark, str(tmp_path)),
        con,
        TOKENIZER_WORDPIECE_APPLY_SQL,
    )
    assert problems == [], problems
    clear_barrier_view_cache()


# ---------------------------------------------------------------------------
# integration smoke lane: gated, never silently green
# ---------------------------------------------------------------------------


def test_integration_smoke_exits_skipped_without_environment():
    """The live-connector lane must report SKIPPED (exit 77) — not
    green — when no servers are declared, so CI can distinguish
    'not run' from 'passed'."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("SPARK_GRAFT_MONGO_URI",
                        "SPARK_GRAFT_CLICKHOUSE_URL")}
    proc = subprocess.run(
        [sys.executable, "scripts/integration_smoke.py"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=60,
    )
    assert proc.returncode == 77, proc.stdout + proc.stderr
    assert "SKIPPED" in proc.stdout
