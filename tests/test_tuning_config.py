"""EngineTuning config surface: defaults must equal the driver-pinned
module constants, and SPARK_GRAFT_TUNING overrides must flow into BOTH
the Spark constants and the import-time-built oracle SQL mirrors.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from mongo_to_clickhouse_spark.config import EngineTuning
from mongo_to_clickhouse_spark.queries import corpusops, dedupops, vectorops


def test_defaults_match_module_constants():
    t = EngineTuning()
    assert dedupops.N_HASHES == t.minhash_hashes
    assert dedupops.N_BANDS == t.minhash_bands
    assert dedupops.JACCARD_THRESHOLD == t.jaccard_threshold
    assert dedupops.JACCARD_SHINGLE_DF_CAP == t.jaccard_shingle_df_cap
    assert dedupops.HAMMING_THRESHOLD == t.simhash_hamming_threshold
    assert dedupops.WINDOW_TOKENS == t.substr_window_tokens
    assert vectorops.N_PROBES == t.ann_probes
    assert vectorops.TOPK == t.ann_topk
    assert vectorops.NEAR_DUP_THRESHOLD == t.near_dup_threshold
    assert vectorops.IVF_MIN_CENTROIDS == t.ivf_min_centroids
    assert vectorops.IVF_MAX_CENTROIDS == t.ivf_max_centroids
    assert vectorops.N_PLANES == t.lsh_planes
    assert vectorops.LSH_BANDS == t.lsh_bands
    assert vectorops.PCA_K == t.pca_k
    assert corpusops.REPETITION_N == t.repetition_n
    assert corpusops.REPETITION_THRESHOLD == t.repetition_threshold
    assert corpusops.DECONTAM_N == t.decontam_n
    assert corpusops.BENCH_MODULUS == t.bench_modulus
    assert corpusops.DECONTAM_GRAM_DF_CAP == t.decontam_gram_df_cap
    assert corpusops.VOCAB_TOP_K == t.vocab_top_k


def test_env_override_reaches_constants_and_oracle_sql():
    # fresh interpreter: the override must take effect at import time and
    # flow into the import-time-built DuckDB oracle strings too
    code = (
        "from mongo_to_clickhouse_spark.queries import corpusops, dedupops\n"
        "assert dedupops.JACCARD_THRESHOLD == 0.8, dedupops.JACCARD_THRESHOLD\n"
        "assert corpusops.BENCH_MODULUS == 11\n"
        "assert '>= 0.8' in dedupops.DEDUP_NGRAM_JACCARD_SQL\n"
        "assert '% 11' in corpusops.DECONTAMINATE_NGRAM_OVERLAP_SQL\n"
        "print('OK')\n"
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_TUNING"] = json.dumps(
        {"jaccard_threshold": 0.8, "bench_modulus": 11}
    )
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_unknown_override_key_fails_loudly():
    code = "import mongo_to_clickhouse_spark.config\n"
    env = dict(os.environ)
    env["SPARK_GRAFT_TUNING"] = '{"not_a_knob": 1}'
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode != 0
    assert "not_a_knob" in out.stderr


def test_exact_sum_decimal_flows_into_oracle_sql():
    # fresh interpreter: the widening toggle must rewrite the BIGINT
    # accumulators to DECIMAL(38,0) in the import-time oracle mirrors
    code = (
        "from mongo_to_clickhouse_spark.queries import vectorops\n"
        "assert vectorops.EXACT_SUM_DECIMAL is True\n"
        "assert 'DECIMAL(38,0)' in vectorops.EMB_COVARIANCE_SQL\n"
        "assert 'DECIMAL(38,0)' in vectorops.EMB_PCA_POWER_ITERATION_SQL\n"
        "print('OK')\n"
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_TUNING"] = json.dumps({"exact_sum_decimal": True})
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
