"""Round-11 second-half scale fixes, surfaced by the 100× (sf10emb)
tier sweep — see SCALE.md §6n:

- corpus_zipf_slope: regression sums → DECIMAL(38,0) (overflowed only
  once the corpus vocabulary actually filled ZIPF_TOP_TYPES);
- emb_covariance / emb_covariance_matmul / _pca_moment_sql: accumulator
  width now DERIVES from the corpus count (_acc_for), the PCA moment
  downscale derives as GREATEST(1e9, 128·n²);
- emb_jl_projection: distortion probes capped (jl_probe_cap) — the
  uncapped fixture modulus made the pair eval ∝ n² (1149× at 100×).

The width switch is representational (same exact integers wherever both
widths are defined), so the DuckDB oracles always run wide and hashes
are unchanged at every graded sf; the probe cap and moment scale are
value-changing knobs and get the lockstep treatment (sweep #6 below).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_acc_width_derivation(spark, sf_dir, monkeypatch):
    import mongo_to_clickhouse_spark.queries.vectorops as v

    assert v._acc_for(spark, sf_dir) == "BIGINT"  # 500 vecs at sf0.01
    monkeypatch.setattr(
        v, "corpus_count", lambda *a, **k: v._WIDE_SUM_ROWS + 1
    )
    assert v._acc_for(spark, sf_dir) == "DECIMAL(38,0)"


def test_pca_moment_scale_derives_in_sql():
    # The downscale must be the derived GREATEST form in BOTH dialects
    # and the acc parameter must reach the accumulator casts.
    from mongo_to_clickhouse_spark.queries.vectorops import _pca_moment_sql

    for dialect in ("spark", "duck"):
        sql = _pca_moment_sql(dialect, "DECIMAL(38,0)")
        assert "GREATEST(1000000000, 128 * n * n)" in sql
        assert "DECIMAL(38,0)" in sql
    assert "BIGINT) AS mi" in _pca_moment_sql("spark", "BIGINT")


def test_wide_oracle_identical_at_graded_scale():
    # Width is representational: the BIGINT and DECIMAL(38,0) oracle
    # forms must return identical rows on the graded fixture.
    import duckdb

    from mongo_to_clickhouse_spark.queries.vectorops import (
        _emb_covariance_oracle_sql,
        _pca_power_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "parquet_scan('/root/testdata/sf0.01/embeddings.parquet')"
    )
    assert con.execute(_emb_covariance_oracle_sql("BIGINT")).fetchall() \
        == con.execute(
            _emb_covariance_oracle_sql("DECIMAL(38,0)")
        ).fetchall()
    assert con.execute(_pca_power_sql("duck", acc="BIGINT")).fetchall() \
        == con.execute(
            _pca_power_sql("duck", acc="DECIMAL(38,0)")
        ).fetchall()


def test_zipf_decimal_sums_survive_full_topk():
    # A synthetic corpus whose vocabulary FILLS ZIPF_TOP_TYPES — the
    # shape that overflowed the BIGINT closed form at the 100× sweep.
    import duckdb

    from mongo_to_clickhouse_spark.queries.evalops import (
        ZIPF_TOP_TYPES,
        _zipf_sql,
    )

    con = duckdb.connect()
    words = " ".join(
        f"w{i}" for i in range(ZIPF_TOP_TYPES + 200) for _ in range(2)
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT 1 AS doc_id, '{words}' AS text"
    )
    (n_types, slope), = con.execute(_zipf_sql("duck")).fetchall()
    assert n_types == ZIPF_TOP_TYPES
    assert slope is not None


def test_jl_probe_cap_lockstep_sweep():
    """Sixth knob-perturbed oracle-lockstep sweep: jl_probe_cap moved to
    a value that CHANGES the result row set at sf0.01 (cap 8 < the 17
    modulus-selected probes), plus the pca/covariance ids re-checked
    under the same subprocess — the public contract must still
    hash-MATCH, proving the knob feeds both engines."""
    env = dict(os.environ)
    env["SPARK_GRAFT_TUNING"] = json.dumps({
        "jl_probe_cap": 8,
        "banding_sample_cap": 100,  # < the 500 sf0.01 docs: restricts
    })
    ids = [
        "emb_jl_projection",
        "eval_lsh_banding_curve",
        "emb_covariance",
        "emb_covariance_matmul",
        "emb_pca_power_iteration",
        "corpus_zipf_slope",
    ]
    proc = subprocess.run(
        [sys.executable, "scripts/driver_sim.py",
         "/root/testdata/sf0.01", *ids],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert proc.stdout.count("MATCH") >= len(ids)
    assert "MISMATCH" not in proc.stdout


def test_jl_probe_cap_bounds_pairs():
    # Pure-arithmetic pin of the cap semantics: probe ids are the
    # multiples of JL_PROBE_MOD below MOD·cap, so pair count is bounded
    # by cap·(cap−1)/2 at ANY corpus size.
    from mongo_to_clickhouse_spark.queries.vectorops import (
        JL_PROBE_CAP,
        JL_PROBE_MOD,
    )

    for n in (500, 2000, 200_000, 10**9):
        probes = min((n + JL_PROBE_MOD - 1) // JL_PROBE_MOD, JL_PROBE_CAP)
        assert probes <= JL_PROBE_CAP
    assert JL_PROBE_CAP * (JL_PROBE_CAP - 1) // 2 == 8128
