"""Exchange-count budgets for the fixed-round iterative operators.

An iterative DataFrame loop whose per-round relation is consumed more
than once inlines the previous round's subtree into every consumer —
the plan grows EXPONENTIALLY in rounds (emb_pca_power_iteration hit 238
exchanges before its per-round barrier; emb_kmeans_lloyd hit 28). The
per-round reliable checkpoints keep the DAG linear; these budgets pin
that property so the class can't silently regress."""

from __future__ import annotations

import pytest

from mongo_to_clickhouse_spark.plans.meta import plan_counters
from mongo_to_clickhouse_spark.queries.dedupops import dedup_cluster_components
from mongo_to_clickhouse_spark.queries.evalops import eval_cluster_ari
from mongo_to_clickhouse_spark.queries.graphops import (
    graph_closeness_sampled,
    graph_hits_scores,
    graph_kcore_onion,
    graph_label_propagation,
    graph_modularity,
    graph_pagerank,
)
from mongo_to_clickhouse_spark.queries.textops import text_bm25_topk
from mongo_to_clickhouse_spark.queries.tokenizerops import (
    tokenizer_bpe_merge_rounds,
    tokenizer_unigram_em_soft,
    tokenizer_unigram_viterbi,
)
from mongo_to_clickhouse_spark.queries.vectorops import (
    emb_kmeans_lloyd,
    emb_pca_power_iteration,
    emb_pca_power_matfree,
    emb_residual_quantize,
    sample_coreset_kcenter,
    sim_greedy_graph_search,
    sim_mmr_diversify,
)

# generous headroom above the current linear-plan shuffle counts, far
# below the exponential failure mode (28-238). Budgets are true shuffle
# counts (bare Exchange) — round 4's budgets were calibrated against an
# inflated substring count that also matched BroadcastExchange.
BUDGETS = [
    (emb_kmeans_lloyd, 14),
    (graph_pagerank, 14),
    (emb_pca_power_iteration, 14),
    (emb_pca_power_matfree, 18),  # 2 shuffles per matvec (u, w) × 4 matvecs
    (dedup_cluster_components, 22),  # CC rounds are data-dependent
    (tokenizer_bpe_merge_rounds, 14),  # 1 pair-agg shuffle per merge round
    # not iterative, but pinned after the round-5 plan diet (21 -> 8):
    # dl/df/qterms/stats all derive from the single checkpointed tf
    # relation; a new pass over the token barrier shows up here first
    (text_bm25_topk, 10),
    (graph_label_propagation, 8),   # currently 2: the final labels are
    #   one checkpointed leaf (shared with graph_modularity); a jump
    #   back toward 16 means the chain barrier was dropped
    (graph_modularity, 30),         # currently 19: the modularity tail
    #   references the LPA labels 3× — without the label barrier the
    #   chain re-expands per reference (99 shuffles, round-7 verdict)
    (sample_coreset_kcenter, 22),   # ~3 shuffles/round × 6 greedy rounds
    # round-6 iterative tier (current linear counts 2-17; the budgets
    # sit ~2× above them and far under the exponential mode)
    (graph_kcore_onion, 8),         # currently 3: peel rounds barriered
    (graph_hits_scores, 10),        # currently 4: 2 normalize/round
    (graph_closeness_sampled, 10),  # currently 4: 1 relax/round
    (sim_mmr_diversify, 14),        # currently 8: pool+pp barriered
    (sim_greedy_graph_search, 14),  # currently 8: graph+pairs barriered
    (emb_residual_quantize, 24),    # currently 16: 2 argmin levels
    (tokenizer_unigram_viterbi, 6),  # currently 2 after the round-8
    #   redesign: the whole Viterbi DP + backtrack runs per-word-local
    #   inside ONE mapInPandas over the w-partitioned edge checkpoint
    #   (the soft-EM discipline) — only the edge build and the piece
    #   aggregate shuffle; a jump back means the 20-stage unroll crept
    #   back
    (tokenizer_unigram_em_soft, 6),  # currently 3 after the round-7
    #   redesign: the whole forward-backward runs per-word-local inside
    #   ONE mapInPandas over the w-partitioned edge checkpoint, so the
    #   only shuffles left are the edge build, the piece aggregate, and
    #   the top-k — a regression here means the staged-join shape crept
    #   back
    (eval_cluster_ari, 24),         # currently 17: two CC labelings
]


@pytest.mark.parametrize("fn,budget", BUDGETS, ids=[f.__name__ for f, _ in BUDGETS])
def test_iterative_plan_stays_linear(spark, sf_dir, fn, budget):
    df = fn(spark, sf_dir)
    shuffles = plan_counters(df)["shuffle"]
    assert shuffles <= budget, (
        f"{fn.__name__}: {shuffles} shuffles > budget {budget} — "
        "a per-round barrier was probably dropped (exponential plan growth)"
    )
