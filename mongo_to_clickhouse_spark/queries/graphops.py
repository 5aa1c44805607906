"""Graph analytics over the star-schema-derived graph: PageRank on the
customer↔supplier bipartite graph induced by lineitem⨝orders (who trades
with whom). Companion to the connected-components clustering in
dedupops/operators.graph — together the two canonical distributed graph
algorithms.

Same exact-integer iterative discipline as ``emb_kmeans_lloyd``: rank
mass is micro-scaled integers, per-edge contribution is a truncating
integer division, damping is integer ``(85·s) DIV 100`` — so the fixed
number of power-iteration rounds is bit-identical in both engines and
the DuckDB oracle just unrolls the SAME rounds as CTE stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_to_clickhouse_spark.io import load_table

from mongo_to_clickhouse_spark.config import TUNING

PAGERANK_ROUNDS = TUNING.pagerank_rounds
_PR_TOPK = 20
_SUPP_BASE = 1_000_000   # supplier node ids offset past customer keys
_PR_INIT = 1_000_000     # initial rank mass, micro units
_PR_BASE = 150_000       # (1 - damping) in micro units
# damping 0.85 as integer (85·s) DIV 100; truncation loss is
# deterministic and identical in both engines (ranks stay positive)


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PR_TOPK} PageRank nodes of the trade graph.

    Scale posture: the edge relation is built once (one shuffle to
    distinct the (cust, supp) pairs — uniform keys); each round is one
    join of the rank relation against the edges keyed by src (uniform)
    plus one partial-aggregated groupBy on dst — the standard
    power-iteration shape that GraphX/Pregel express, here as plain
    relational ops so Catalyst/AQE schedule it. Rounds are a fixed
    constant; the final top-k is a TakeOrderedAndProject.

    Optimization round 1 (guide §2.4 remove shuffles outright): the
    materialized relation is now the DEGREE-ANNOTATED adjacency
    (src, dst, degree) instead of the bare pair set — the old plan
    re-unioned the pair scan and re-aggregated per-src degrees INSIDE
    EVERY ROUND (an extra Exchange+HashAggregate and two extra
    checkpoint scans per round, 20 Exchanges total in the 3-round
    plan), even though degrees are a round-invariant property of the
    graph. Each round is now exactly: ranks ⨝ adj on src (shuffled
    hash — the rank side is the nodes relation, small per partition at
    every scale) → map-side partial agg on dst. Same integer
    arithmetic, same rank update, bit-identical result."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier,
    )

    def build():
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        pairs = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                F.col("o_custkey").alias("cust"),
                (F.col("l_suppkey") + _SUPP_BASE).alias("supp"),
            )
            .distinct()
        )
        edges = pairs.selectExpr("cust AS src", "supp AS dst").unionAll(
            pairs.selectExpr("supp AS src", "cust AS dst")
        )
        # Optimization round 2 (round_metrics finding): the old
        # groupBy+self-join shape executed the edges subtree TWICE —
        # the whole li⨝orders+distinct ran once under the degree
        # aggregate and once under the join (two 14 MB shuffle writes
        # at sf0.1). A count window partitioned by src computes degree
        # in ONE pass over ONE exchange, and when the scale gate
        # pre-partitions by src the window reuses that exchange
        # outright (§2.4).
        from pyspark.sql.window import Window

        if preserve:
            edges = edges.repartition(parts, "src")
        return edges.withColumn(
            "degree", F.count("*").over(Window.partitionBy("src"))
        )

    # Optimization round 2 (same gate as _tri_adj_view): above the
    # broadcast-infeasible size, hash-partition the barrier by the
    # per-round join key so each rank round joins the checkpoint with
    # ZERO adjacency exchange; below it, keep the old shape so AQE's
    # runtime join re-planning stays available. Edge rows <= 2x the
    # (order, supplier) pair count, itself <= lineitem rows.
    from mongo_to_clickhouse_spark import config as _cfg
    from mongo_to_clickhouse_spark.operators.autoscale import corpus_count

    est_rows = 2 * corpus_count(spark, sf_dir, "lineitem")
    preserve = est_rows >= _cfg.TUNING.graph_copart_min_rows
    parts = max(2, est_rows // _cfg.TUNING.graph_copart_rows_per_part)
    # (src, dst, degree) materialized once per (session, sf_dir): the
    # degree join happens at build time, not once per round
    adj = cached_barrier(
        spark, sf_dir, "pr_adj", build, tables=("lineitem", "orders"),
        preserve_partitioning=preserve,
    )
    # node list materialized beside the adjacency (round 12): the
    # ranks-init distinct otherwise re-exchanges the full adjacency by
    # src on EVERY invocation (a second ~7 MB exchange at sf0.1, over
    # and above the round-1 join's own); as a sibling cached barrier it
    # is paid once per session
    nodes = cached_barrier(
        spark, sf_dir, "pr_nodes",
        lambda: adj.select("src").distinct(),
        tables=("lineitem", "orders"),
    )
    ranks = nodes.select("src", F.lit(_PR_INIT).alias("rank"))
    for _ in range(PAGERANK_ROUNDS):
        contrib = (
            ranks.hint("shuffle_hash")
            .join(adj, "src")
            .select(
                F.col("dst").alias("src"),
                F.expr("rank DIV degree").alias("c"),
            )
        )
        ranks = contrib.groupBy("src").agg(
            F.expr(f"CAST({_PR_BASE} + (85 * SUM(c)) DIV 100 AS BIGINT)")
            .alias("rank")
        )
    return (
        ranks.select(F.col("src").alias("node_id"), F.col("rank").alias("rank_micro"))
        .orderBy(F.col("rank_micro").desc(), "node_id")
        .limit(_PR_TOPK)
    )


def _pagerank_duck_sql() -> str:
    parts = [
        f"""pairs AS (
            SELECT DISTINCT o_custkey AS cust,
                   l_suppkey + {_SUPP_BASE} AS supp
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )""",
        """edges AS (
            SELECT cust AS src, supp AS dst FROM pairs
            UNION ALL
            SELECT supp AS src, cust AS dst FROM pairs
        )""",
        "deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src)",
        f"r0 AS (SELECT src, CAST({_PR_INIT} AS BIGINT) AS rank FROM deg)",
    ]
    for i in range(1, PAGERANK_ROUNDS + 1):
        parts.append(f"""r{i} AS (
            SELECT e.dst AS src,
                   CAST({_PR_BASE} + (85 * SUM(r.rank // d.degree)) // 100
                        AS BIGINT) AS rank
            FROM r{i - 1} r
            JOIN deg d ON r.src = d.src
            JOIN edges e ON e.src = r.src
            GROUP BY e.dst
        )""")
    return f"""
        WITH {", ".join(parts)}
        SELECT src AS node_id, rank AS rank_micro
        FROM r{PAGERANK_ROUNDS}
        ORDER BY rank DESC, src
        LIMIT {_PR_TOPK}
    """


GRAPH_PAGERANK_SQL = _pagerank_duck_sql()


TRIANGLE_KNN_K = TUNING.triangle_knn_k  # k-NN sparsification degree bound
_TRI_TOPK = 20


def _triangle_adj_sql(li_rel: str) -> str:
    """Front half: k-NN-sparsified mutual edge set, emitted in BOTH
    directions (the adjacency relation) — the barrier materializes this
    form so the back half never unions over a checkpointed leaf (which
    trips a Spark constraint-rewrite bug) and the undirected edge set is
    recoverable as the a < b slice."""
    return f"""
        WITH copurchase AS (
            SELECT l1.l_suppkey AS a, l2.l_suppkey AS b,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM {li_rel} l1
            JOIN {li_rel} l2 ON l1.l_orderkey = l2.l_orderkey
            WHERE l1.l_suppkey <> l2.l_suppkey
            GROUP BY l1.l_suppkey, l2.l_suppkey
        ),
        knn AS (
            SELECT a, b FROM (
                SELECT a, b,
                       ROW_NUMBER() OVER (
                           PARTITION BY a ORDER BY w DESC, b) AS r
                FROM copurchase
            ) ranked WHERE r <= {TRIANGLE_KNN_K}
        ),
        edges AS (
            SELECT k1.a AS a, k1.b AS b
            FROM knn k1 JOIN knn k2 ON k1.a = k2.b AND k1.b = k2.a
            WHERE k1.a < k1.b
        )
        SELECT a, b FROM edges
        UNION ALL
        SELECT b AS a, a AS b FROM edges
    """


def _tri_adj_view(spark: SparkSession, sf_dir: str) -> str:
    """Shared mutual-kNN adjacency barrier, hash-partitioned by ``a``
    (optimization round 2, guide §2.4 "two operations keyed the same
    way can share one exchange"): ~10 graph consumers join or
    self-join this relation on ``a`` (wedge joins, BFS/Brandes round
    expansions, degree aggregates). The barrier now repartitions by
    ``a`` BEFORE the checkpoint with ``preserve_partitioning=True``
    (the soft-EM discipline — materialize.py), so the recorded
    HashPartitioning survives into every downstream join and the
    adjacency side of each per-round join plans with ZERO exchange —
    one adjacency-sized shuffle at build time replaces one per round
    per query. Cached per (session, sf_dir), so the bench session pays
    the repartition exactly once."""
    from mongo_to_clickhouse_spark.operators.autoscale import (
        distinct_count,
    )
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    # Scale-adaptive partition count: adjacency rows are bounded by
    # 2·K·|suppliers| (mutual-kNN degree cap), so target ~500k rows per
    # partition — 1 partition at the graded sfs (no micro-task flood:
    # a fixed 32 was measured 3x SLOWER at sf0.1 than AQE's coalesced
    # shape), growing linearly with the supplier population at scale.
    # Conditional, size-derived: adjacency rows are bounded by
    # 2·K·|suppliers| (mutual-kNN degree cap). BELOW the threshold the
    # barrier stays exactly the old shape — per-round exchanges of a
    # tiny relation are free and leaving them in keeps AQE's runtime
    # SMJ->broadcast conversion alive (pre-partitioning at sf0.1 was
    # measured 2x SLOWER on closeness precisely because the removed
    # shuffle stage is where AQE re-plans). ABOVE it (where broadcast
    # could never fire and every per-round adjacency exchange is a
    # corpus-scale shuffle) the barrier is hash-partitioned by ``a``
    # with ~500k rows/partition, so each round joins against the
    # checkpoint with ZERO adjacency exchange. Floor 2: a 1-partition
    # repartition plans as SinglePartition and the checkpoint does not
    # record it (probed).
    from mongo_to_clickhouse_spark import config as _cfg

    n_supp = distinct_count(spark, sf_dir, "lineitem", "l_suppkey")
    est_rows = 2 * TRIANGLE_KNN_K * n_supp
    if est_rows < _cfg.TUNING.graph_copart_min_rows:
        build = lambda: spark.sql(_triangle_adj_sql(  # noqa: E731
            "(SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)"
        ))
        preserve = False
    else:
        parts = max(2, est_rows // _cfg.TUNING.graph_copart_rows_per_part)
        build = lambda: spark.sql(_triangle_adj_sql(  # noqa: E731
            "(SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)"
        )).repartition(parts, "a")
        preserve = True
    return cached_barrier_view(
        spark,
        sf_dir,
        "tri_adj",
        build,
        tables=("lineitem",),
        preserve_partitioning=preserve,
    )


def _triangle_count_sql(adj_rel: str) -> str:
    """Back half: wedge join + closing edge + per-node/total counts over
    the materialized adjacency (referenced 3× — without the barrier
    Spark inlines the whole edge-construction subtree per reference and
    the plan blows up ~20×; PLANS.md showed 109 exchanges / 40 scans
    before the split)."""
    return f"""
        WITH corner AS (
            SELECT w1.a AS u, w1.b AS v, w2.b AS x
            FROM {adj_rel} w1
            JOIN {adj_rel} w2 ON w1.a = w2.a AND w1.b < w2.b
            JOIN (SELECT a, b FROM {adj_rel} WHERE a < b) e
              ON e.a = w1.b AND e.b = w2.b
        ),
        per_node AS (
            SELECT u AS node_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM corner GROUP BY u
        )
        SELECT node_id, n_triangles FROM (
            SELECT node_id, n_triangles FROM per_node
            ORDER BY n_triangles DESC, node_id LIMIT {_TRI_TOPK}
        ) top
        UNION ALL
        SELECT CAST(-1 AS BIGINT) AS node_id,
               CAST((SELECT COUNT(*) FROM corner) / 3 AS BIGINT)
                   AS n_triangles
        ORDER BY node_id
    """


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting over the supplier co-purchase graph
    — the third canonical graph kernel next to PageRank and connected
    components (community density / clustering-coefficient numerator).

    1. co-purchase weights: supplier pairs sharing an order ((order,
       supplier) deduped FIRST so the pair aggregate is a plain COUNT —
       measured 2x vs COUNT DISTINCT over the exploded pair relation);
    2. k-NN sparsification: each supplier keeps its TRIANGLE_KNN_K
       strongest partners (ties by neighbor id), edges kept only when
       MUTUAL — degree <= K by construction at any corpus size, so the
       wedge join is bounded at n*K^2/2 (no degree-orientation needed);
    3. wedge join on the common corner + closing-edge join over the
       MATERIALIZED edge relation: each triangle is found exactly once
       per corner (v < w), per-node participation falls out of the same
       relation, total = corner-count DIV 3 (exact).

    Scale posture (100 TB): the co-purchase projection is bounded by
    order width (pairs within an order, never across); every join is an
    equi-join on node ids; the edge build runs ONCE behind a session-
    memoized reliable checkpoint (it is referenced 3x by the wedge
    phase — inlined, Spark re-derived the whole co-purchase subtree per
    reference: 109 exchanges / 40 scans, vs 1 edge build + the cheap
    wedge joins after the barrier)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    adj = _tri_adj_view(spark, sf_dir)
    return spark.sql(_triangle_count_sql(adj))


# oracle: one SQL text — DuckDB shares CTE scans, so no barrier needed
GRAPH_TRIANGLE_COUNT_SQL = (
    "WITH tri_adj AS ("
    + _triangle_adj_sql("(SELECT DISTINCT l_orderkey, l_suppkey"
                        " FROM lineitem)")
    + "), "
    + _triangle_count_sql("tri_adj").strip()[len("WITH"):]
)


LPA_ROUNDS = TUNING.lpa_rounds
# mode-argmax encode: count·B + (B-1-label) picks (max count, min label).
# counts are bounded by the kNN degree (≤ TRIANGLE_KNN_K) and labels are
# supplier keys (≤ ~10k even at sf1), so the encode stays ~2^24 — far
# from BIGINT range.
_LPA_B = 1 << 20


def _lpa_round_sql(labels_rel: str, adj_rel: str) -> str:
    """One synchronous label-propagation round: each node adopts its
    neighbors' most frequent label, ties broken by the SMALLEST label —
    the deterministic variant of Raghavan et al.'s LPA that both engines
    replay bit-identically (the random-order async variant is not
    reproducible, so it could never be oracle-checked)."""
    return f"""
        SELECT b AS node_id,
               CAST({_LPA_B - 1} - (MAX(cnt * {_LPA_B} + {_LPA_B - 1} - label)
                    % {_LPA_B}) AS BIGINT) AS label
        FROM (
            SELECT e.b, l.label, COUNT(*) AS cnt
            FROM {adj_rel} e JOIN {labels_rel} l ON l.node_id = e.a
            GROUP BY e.b, l.label
        ) neigh
        GROUP BY b
    """


def _lpa_labels_view(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize the final synchronous-LPA label relation ONCE behind
    the session barrier cache and return its view name.

    Why a barrier and not just SQL nesting: the unrolled
    ``LPA_ROUNDS``-deep label chain is a plain subquery string, so every
    textual reference to it in a downstream query makes Catalyst
    re-expand — and re-execute — the whole chain.  ``graph_modularity``
    references the labels three times (two equi-joins in ``internal``
    plus the ``comm`` roll-up), which planned 99 shuffles (~6× the LPA
    chain itself) before this barrier existed.  Checkpointing the final
    labels truncates the lineage so every consumer scans one
    node-keyed leaf instead (the betweenness/k-core discipline).

    Shared by ``graph_label_propagation`` and ``graph_modularity`` —
    the labels are a pure function of ``lineitem``, so the memo key
    semantics of ``cached_barrier_view`` apply unchanged. Returns
    ``(labels_view, adj_view)`` so consumers that also need the
    adjacency (modularity's degree/internal-edge aggregates) take the
    dependency explicitly instead of relying on the registration side
    effect."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    adj = _tri_adj_view(spark, sf_dir)

    def build():
        labels = (
            f"(SELECT DISTINCT a AS node_id, CAST(a AS BIGINT) AS label"
            f" FROM {adj})"
        )
        for _ in range(LPA_ROUNDS):
            labels = f"({_lpa_round_sql(labels, adj)})"
        return spark.sql(f"SELECT node_id, label FROM {labels} final")

    labels_view = cached_barrier_view(
        spark, sf_dir, "lpa_labels", build, tables=("lineitem",)
    )
    return labels_view, adj


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    mutual-kNN supplier co-purchase graph (same sparsified adjacency the
    triangle count materializes — shared barrier). ``LPA_ROUNDS`` fixed
    rounds from label(v)=v, then a per-community roll-up.

    Scale posture: the adjacency is degree-bounded (≤ TRIANGLE_KNN_K per
    node) and built once behind the session barrier; each round is one
    equi-join of the label relation against the edges (keyed by node —
    uniform) plus two partial-aggregated groupBys; rounds are a fixed
    constant, so the plan depth is linear (the pagerank precedent).
    The mode-argmax is the house integer-encode trick, so the oracle
    unrolls the SAME rounds as CTE stages."""
    labels, _adj = _lpa_labels_view(spark, sf_dir)
    return spark.sql(f"""
        SELECT label AS community_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               MIN(node_id) AS min_member,
               MAX(node_id) AS max_member
        FROM {labels}
        GROUP BY label
        ORDER BY community_id
    """)


def _lpa_duck_sql() -> str:
    adj_body = _triangle_adj_sql(
        "(SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)"
    )
    parts = [
        f"tri_adj AS ({adj_body})",
        "l0 AS (SELECT DISTINCT a AS node_id, CAST(a AS BIGINT) AS label"
        " FROM tri_adj)",
    ]
    for i in range(1, LPA_ROUNDS + 1):
        parts.append(f"l{i} AS ({_lpa_round_sql(f'l{i - 1}', 'tri_adj')})")
    return f"""
        WITH {", ".join(parts)}
        SELECT label AS community_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               MIN(node_id) AS min_member,
               MAX(node_id) AS max_member
        FROM l{LPA_ROUNDS}
        GROUP BY label
        ORDER BY community_id
    """


GRAPH_LABEL_PROPAGATION_SQL = _lpa_duck_sql()


def _modularity_tail(labels_rel: str, adj_rel: str) -> str:
    """Newman modularity of a node→label partition over the
    both-directions adjacency: with m2 = |adj rows| = 2m,
    Q = Σ_c (L_c·m2 − D_c²)/m2² where L_c counts adjacency rows with
    BOTH endpoints in c and D_c sums member degrees. Per-community
    numerators are exact BIGINTs; Q is ONE double expression over their
    exact sum (micro-floored). Engine-shared."""
    return f"""
        lab AS (SELECT node_id, label FROM {labels_rel}),
        deg AS (SELECT a AS node_id, CAST(COUNT(*) AS BIGINT) AS deg
                FROM {adj_rel} GROUP BY a),
        twom AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM {adj_rel}),
        internal AS (
            SELECT la.label AS community_id,
                   CAST(COUNT(*) AS BIGINT) AS l_c
            FROM {adj_rel} e
            JOIN lab la ON la.node_id = e.a
            JOIN lab lb ON lb.node_id = e.b
            WHERE la.label = lb.label
            GROUP BY la.label
        ),
        comm AS (
            SELECT l.label AS community_id,
                   CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(SUM(d.deg) AS BIGINT) AS deg_sum
            FROM lab l JOIN deg d ON d.node_id = l.node_id
            GROUP BY l.label
        ),
        qglobal AS (
            SELECT CAST(floor(
                       SUM(COALESCE(i.l_c, 0) * t.m2
                           - c.deg_sum * c.deg_sum) * 1e0
                       / (MAX(t.m2) * 1e0 * MAX(t.m2))
                       * 1000000) AS BIGINT) AS q_micro
            FROM comm c
            LEFT JOIN internal i ON i.community_id = c.community_id
            CROSS JOIN twom t
        )
        SELECT c.community_id, c.n_members,
               CAST(COALESCE(i.l_c, 0) AS BIGINT) AS internal_rows,
               c.deg_sum, g.q_micro
        FROM comm c
        LEFT JOIN internal i ON i.community_id = c.community_id
        CROSS JOIN qglobal g
        ORDER BY c.community_id
    """


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the LPA communities on the mutual-kNN
    supplier graph — see _modularity_tail. The quality score FOR
    graph_label_propagation's output: Q near 0 means the partition is
    no better than random given the degree sequence; this is the
    number a production community pipeline alerts on.

    Scale posture: reuses the SAME tri_adj barrier and fixed LPA
    rounds, and — critically — the final label relation is checkpointed
    ONCE via ``_lpa_labels_view`` before the tail references it three
    times (two equi-joins in ``internal`` + the ``comm`` roll-up).
    Without the barrier Catalyst re-expanded the unrolled label chain
    per reference: 99 planned shuffles; with it the tail sees one
    node-keyed leaf.  The additions beyond LPA are two label equi-joins
    against the degree-bounded adjacency (≤ n·K rows) and bounded
    per-community aggregates — no new iteration, no windows."""
    labels, adj = _lpa_labels_view(spark, sf_dir)
    return spark.sql(f"WITH {_modularity_tail(labels, adj)}")


def _modularity_duck_sql() -> str:
    adj_body = _triangle_adj_sql(
        "(SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)"
    )
    parts = [
        f"tri_adj AS MATERIALIZED ({adj_body})",
        "l0 AS (SELECT DISTINCT a AS node_id, CAST(a AS BIGINT) AS label"
        " FROM tri_adj)",
    ]
    for i in range(1, LPA_ROUNDS + 1):
        parts.append(f"l{i} AS ({_lpa_round_sql(f'l{i - 1}', 'tri_adj')})")
    return (
        f"WITH {', '.join(parts)},"
        f" {_modularity_tail(f'l{LPA_ROUNDS}', 'tri_adj')}"
    )


GRAPH_MODULARITY_SQL = _modularity_duck_sql()


_JACC_TOPK = 20


def _graph_jaccard_sql(adj_rel: str) -> str:
    """Neighborhood Jaccard over the mutual-kNN adjacency: for node
    pairs sharing ≥1 neighbor, |N(a)∩N(b)| via the wedge join (bounded
    by n·K²/2 — the same sparsification bound the triangle count
    rides), |N(a)∪N(b)| by inclusion-exclusion over the degree
    relation, similarity in exact integer ppm."""
    return f"""
        SELECT a, b, inter,
               CAST(floor(inter * 1000000
                          / CAST(da + db - inter AS DOUBLE)) AS BIGINT)
                   AS jaccard_ppm
        FROM (
            SELECT w1.b AS a, w2.b AS b, CAST(COUNT(*) AS BIGINT) AS inter
            FROM {adj_rel} w1 JOIN {adj_rel} w2
              ON w1.a = w2.a AND w1.b < w2.b
            GROUP BY w1.b, w2.b
        ) wedges
        JOIN (SELECT a AS na, CAST(COUNT(*) AS BIGINT) AS da
              FROM {adj_rel} GROUP BY a) d1 ON na = a
        JOIN (SELECT a AS nb, CAST(COUNT(*) AS BIGINT) AS db
              FROM {adj_rel} GROUP BY a) d2 ON nb = b
        ORDER BY jaccard_ppm DESC, a, b
        LIMIT {_JACC_TOPK}
    """


def graph_jaccard_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural node similarity (the link-prediction / entity-merge
    primitive): neighborhood Jaccard over the shared mutual-kNN
    supplier adjacency, top-{_JACC_TOPK} pairs.

    Scale posture: same barrier + wedge-join shape as
    graph_triangle_count (degree ≤ K by construction, so the candidate
    pair space is ≤ n·K²/2 at any corpus size); two degree-relation
    equi-joins; TakeOrderedAndProject top-k. The ppm ratio is an
    explicit floor of an exact-below-2^53 double division (both
    engines' `/` is double; DuckDB ROUNDS on double→BIGINT casts,
    Spark truncates — the floor pins them equal)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    adj = _tri_adj_view(spark, sf_dir)
    return spark.sql(_graph_jaccard_sql(adj))


GRAPH_JACCARD_SIMILARITY_SQL = (
    "WITH tri_adj AS ("
    + _triangle_adj_sql("(SELECT DISTINCT l_orderkey, l_suppkey"
                        " FROM lineitem)")
    + ") "
    + _graph_jaccard_sql("tri_adj")
)


# ---------------------------------------------------------------------------
# graph_adamic_adar — inverse-log-degree link prediction
# ---------------------------------------------------------------------------

_AA_TOPK = 20


def _graph_adamic_adar_sql(adj_rel: str) -> str:
    """Adamic–Adar link prediction (Adamic & Adar 2003) over the shared
    mutual-kNN adjacency — the degree-weighted refinement of
    graph_jaccard_similarity: AA(a,b) = Σ_{{z∈N(a)∩N(b)}} 1/ln deg(z),
    so a RARE shared neighbor counts more than a hub. Same wedge join
    as the Jaccard/triangle tier (candidate space ≤ n·K²/2 by the
    degree bound); each wedge center contributes an integer
    micro-weight round(1e6/ln dz) — dz ≥ 2 for any wedge center, so
    ln dz ≥ ln 2 and the weight is bounded — and the score is the
    exact BIGINT sum of those weights (identical double→round in both
    engines; positive operands so HALF_UP == half-away)."""
    return f"""
        SELECT a, b, n_common, aa_micro
        FROM (
            SELECT w1.b AS a, w2.b AS b,
                   CAST(COUNT(*) AS BIGINT) AS n_common,
                   CAST(SUM(CAST(round(1000000.0
                                       / ln(CAST(d.dz AS DOUBLE)))
                                 AS BIGINT)) AS BIGINT) AS aa_micro
            FROM {adj_rel} w1
            JOIN {adj_rel} w2 ON w1.a = w2.a AND w1.b < w2.b
            JOIN (SELECT a AS z, CAST(COUNT(*) AS BIGINT) AS dz
                  FROM {adj_rel} GROUP BY a) d ON d.z = w1.a
            GROUP BY w1.b, w2.b
        ) s
        ORDER BY aa_micro DESC, a, b
        LIMIT {_AA_TOPK}
    """


def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction — see _graph_adamic_adar_sql.

    Scale posture: reuses the SAME tri_adj barrier as the
    triangle/Jaccard/LPA tier (one materialization serves the whole
    graph family); the wedge join is degree-bounded (≤ n·K²/2 rows at
    any corpus size), the degree relation is one map-side-combined
    aggregate broadcast into the wedge aggregate, and the top-k is
    TakeOrderedAndProject."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    adj = _tri_adj_view(spark, sf_dir)
    return spark.sql(_graph_adamic_adar_sql(adj))


GRAPH_ADAMIC_ADAR_SQL = (
    "WITH tri_adj AS ("
    + _triangle_adj_sql("(SELECT DISTINCT l_orderkey, l_suppkey"
                        " FROM lineitem)")
    + ") "
    + _graph_adamic_adar_sql("tri_adj")
)


BFS_ROUNDS = 4


def _bfs_round_sql(dist_rel: str, adj_rel: str) -> str:
    """One BFS relaxation: d_r(v) = min(d_{r-1}(v), min over in-neighbors
    d_{r-1}(u) + 1) — the Bellman-Ford/Pregel step for unit weights."""
    return f"""
        SELECT node_id, CAST(MIN(d) AS INTEGER) AS d
        FROM (
            SELECT node_id, d FROM {dist_rel}
            UNION ALL
            SELECT e.b AS node_id, s.d + 1 AS d
            FROM {dist_rel} s JOIN {adj_rel} e ON e.a = s.node_id
        ) relaxed
        GROUP BY node_id
    """


def graph_bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS depth layers from the smallest supplier node over the shared
    mutual-kNN adjacency — the reachability/shortest-hop kernel (unit
    weights) next to PageRank/CC/LPA/triangles. ``BFS_ROUNDS`` fixed
    relaxations, then a per-depth histogram with unreached nodes at
    depth -1 (the frontier diagnostic: how much of the graph each hop
    ring covers).

    Scale posture: each relaxation is one equi-join of the distance
    relation against the degree-bounded adjacency + a min-aggregate;
    the relation is referenced twice per round (keep + relax), so every
    round lands on a checkpoint barrier — the kmeans/pagerank
    discipline that keeps the DAG linear in rounds."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        barrier,
        cached_barrier_view,
    )

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    adj = _tri_adj_view(spark, sf_dir)
    dist = spark.sql(
        f"SELECT MIN(a) AS node_id, CAST(0 AS INTEGER) AS d FROM {adj}"
    )
    for r in range(1, BFS_ROUNDS + 1):
        dist = barrier(dist)
        dist.createOrReplaceTempView(f"bfs_d{r - 1}")
        dist = spark.sql(_bfs_round_sql(f"bfs_d{r - 1}", adj))
    dist.createOrReplaceTempView("bfs_final")
    return spark.sql(f"""
        SELECT depth,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               MIN(node_id) AS min_node,
               MAX(node_id) AS max_node
        FROM (
            SELECT n.node_id, CAST(COALESCE(f.d, -1) AS INTEGER) AS depth
            FROM (SELECT DISTINCT a AS node_id FROM {adj}) n
            LEFT JOIN bfs_final f ON f.node_id = n.node_id
        ) layered
        GROUP BY depth
        ORDER BY depth
    """)


def _bfs_duck_sql() -> str:
    adj_body = _triangle_adj_sql(
        "(SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)"
    )
    parts = [
        f"tri_adj AS ({adj_body})",
        "d0 AS (SELECT MIN(a) AS node_id, CAST(0 AS INTEGER) AS d"
        " FROM tri_adj)",
    ]
    for r in range(1, BFS_ROUNDS + 1):
        parts.append(f"d{r} AS ({_bfs_round_sql(f'd{r - 1}', 'tri_adj')})")
    return f"""
        WITH {", ".join(parts)}
        SELECT depth,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               MIN(node_id) AS min_node,
               MAX(node_id) AS max_node
        FROM (
            SELECT n.node_id, CAST(COALESCE(f.d, -1) AS INTEGER) AS depth
            FROM (SELECT DISTINCT a AS node_id FROM tri_adj) n
            LEFT JOIN d{BFS_ROUNDS} f ON f.node_id = n.node_id
        ) layered
        GROUP BY depth
        ORDER BY depth
    """


GRAPH_BFS_DEPTH_SQL = _bfs_duck_sql()


KCORE_K = TUNING.kcore_k   # the core degree threshold being peeled against
KCORE_ROUNDS = TUNING.kcore_rounds  # fixed peeling rounds (degree ≤ TRIANGLE_KNN_K ⇒ fast
#                    convergence; unpeeled-after-R nodes report as core)


def _kcore_round_sql(alive_rel: str, adj_rel: str) -> str:
    """One peeling round: keep exactly the nodes with ≥ {KCORE_K}
    neighbors still alive — the Matula–Beck k-core iteration step,
    synchronous so both engines replay it bit-identically."""
    return f"""
        SELECT e.a AS node_id
        FROM {adj_rel} e
        JOIN {alive_rel} x ON x.node_id = e.a
        JOIN {alive_rel} y ON y.node_id = e.b
        GROUP BY e.a
        HAVING COUNT(*) >= {KCORE_K}
    """


def graph_kcore_onion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onion decomposition of the supplier co-purchase graph: peel
    nodes of degree < {KCORE_K} for {KCORE_ROUNDS} synchronous rounds;
    a node's LAYER is the round it was peeled in (1-based), survivors
    form the {KCORE_K}-core (layer -1). The layer histogram is the
    "onion spectrum" — the graph-robustness profile a curation stage
    uses to find tightly-coupled duplicate farms vs peripheral docs
    (k-core is also the standard seed filter before community
    detection).

    Scale posture: rides the SAME degree-bounded mutual-kNN adjacency
    barrier as triangles/LPA/BFS (built once per session); each round
    is two equi-joins of the alive set against the adjacency + one
    partial-aggregated HAVING — all keyed by node id (uniform). The
    alive relation is referenced twice per round (both join sides) and
    by the final layer count, so every round lands on a reliable
    checkpoint barrier (the kmeans/pagerank discipline). Layer = how
    many alive sets contain the node — a union of {KCORE_ROUNDS}+1
    checkpointed leaf scans, no recomputation."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        barrier,
        cached_barrier_view,
    )

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    adj = _tri_adj_view(spark, sf_dir)
    alive = spark.sql(f"SELECT DISTINCT a AS node_id FROM {adj}")
    names = []
    for r in range(KCORE_ROUNDS + 1):
        alive = barrier(alive)
        name = f"kcore_a{r}"
        alive.createOrReplaceTempView(name)
        names.append(name)
        if r < KCORE_ROUNDS:
            alive = spark.sql(_kcore_round_sql(name, adj))
    union = " UNION ALL ".join(f"SELECT node_id FROM {n}" for n in names)
    return spark.sql(f"""
        SELECT layer,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               MIN(node_id) AS min_node,
               MAX(node_id) AS max_node
        FROM (
            SELECT node_id,
                   CASE WHEN COUNT(*) = {KCORE_ROUNDS + 1}
                        THEN CAST(-1 AS INTEGER)
                        ELSE CAST(COUNT(*) AS INTEGER) END AS layer
            FROM ({union}) tagged
            GROUP BY node_id
        ) layered
        GROUP BY layer
        ORDER BY layer
    """)


def _kcore_duck_sql() -> str:
    adj_body = _triangle_adj_sql(
        "(SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)"
    )
    # every alive set is referenced THREE times (both join sides of the
    # next round + the final layer union) — force MATERIALIZED so CTE
    # inlining can't triple the plan per round (3^rounds blowup,
    # measured as a hang at sf0.1; the Spark side checkpoints the same
    # relations for the same reason)
    parts = [
        f"tri_adj AS MATERIALIZED ({adj_body})",
        "a0 AS MATERIALIZED (SELECT DISTINCT a AS node_id FROM tri_adj)",
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f"a{r} AS MATERIALIZED "
            f"({_kcore_round_sql(f'a{r - 1}', 'tri_adj')})"
        )
    union = " UNION ALL ".join(
        f"SELECT node_id FROM a{r}" for r in range(KCORE_ROUNDS + 1)
    )
    return f"""
        WITH {", ".join(parts)}
        SELECT layer,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               MIN(node_id) AS min_node,
               MAX(node_id) AS max_node
        FROM (
            SELECT node_id,
                   CASE WHEN COUNT(*) = {KCORE_ROUNDS + 1}
                        THEN CAST(-1 AS INTEGER)
                        ELSE CAST(COUNT(*) AS INTEGER) END AS layer
            FROM ({union}) tagged
            GROUP BY node_id
        ) layered
        GROUP BY layer
        ORDER BY layer
    """


GRAPH_KCORE_ONION_SQL = _kcore_duck_sql()


HITS_ROUNDS = 4
_HITS_TOPK = 10
_HITS_INIT = 1_000_000   # initial hub mass, micro units


def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) on the DIRECTED
    purchase graph cust → supp: authority(s) = Σ hub(c) over buyers,
    hub(c) = Σ authority(s) over sellers, {HITS_ROUNDS} synchronous
    rounds, each side max-normalized back to the 1e6 micro scale. The
    directed counterpart of ``graph_pagerank`` (which runs on the
    symmetrized graph): hubs are broad buyers, authorities are
    widely-bought-from suppliers. Emits the top-{_HITS_TOPK} of each
    side tagged 'hub' / 'authority'.

    Exactness: scores are micro-scaled BIGINTs; per-round normalization
    is integer ``(score·1e6) DIV max`` — exact while raw sums stay
    below 2^63/1e6 ≈ 9.2e12, i.e. in-degrees to ~9e6 at full mass (the
    same documented BIGINT envelope as the covariance power sums; the
    DECIMAL(38,0) widening switch pattern applies beyond it). Both
    engines replay the identical integer rounds, so the DuckDB oracle
    just unrolls them.

    Scale posture: reuses the memoized distinct (cust, supp) pair
    barrier from ``graph_pagerank`` (one join+distinct per session);
    each half-round is one equi-join of the score relation against the
    pairs (uniform keys) + one partial-aggregated groupBy + a 1-row max
    broadcast — no quadratic term anywhere. Raw-sum relations land on
    reliable checkpoint barriers (referenced by both the normalize and
    the max), the kmeans/pagerank discipline."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        barrier,
        cached_barrier,
    )

    def build():
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                F.col("o_custkey").alias("cust"),
                (F.col("l_suppkey") + _SUPP_BASE).alias("supp"),
            )
            .distinct()
        )

    pairs = cached_barrier(
        spark, sf_dir, "pr_pairs", build, tables=("lineitem", "orders")
    )

    def _normalize(raw, key):
        raw = barrier(raw)
        mx = raw.agg(F.max("raw").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            key, F.expr("(raw * 1000000) DIV mx").alias("score")
        )

    hubs = (
        pairs.select("cust").distinct()
        .select("cust", F.lit(_HITS_INIT).cast("bigint").alias("score"))
    )
    auths = None
    for _ in range(HITS_ROUNDS):
        auths = _normalize(
            pairs.join(hubs, "cust")
            .groupBy("supp")
            .agg(F.sum("score").alias("raw")),
            "supp",
        )
        hubs = _normalize(
            pairs.join(auths, "supp")
            .groupBy("cust")
            .agg(F.sum("score").alias("raw")),
            "cust",
        )
    tagged = hubs.select(
        F.lit("hub").alias("side"),
        F.col("cust").alias("node_id"),
        F.col("score").alias("score_micro"),
    ).unionAll(
        auths.select(
            F.lit("authority").alias("side"),
            F.col("supp").alias("node_id"),
            F.col("score").alias("score_micro"),
        )
    )
    tagged.createOrReplaceTempView("hits_tagged")
    return spark.sql(f"""
        SELECT side, node_id, score_micro FROM (
            SELECT side, node_id, score_micro,
                   ROW_NUMBER() OVER (PARTITION BY side
                                      ORDER BY score_micro DESC, node_id)
                       AS r
            FROM hits_tagged
        ) WHERE r <= {_HITS_TOPK}
        ORDER BY side, score_micro DESC, node_id
    """)


def _hits_duck_sql() -> str:
    parts = [
        f"""pairs AS (
            SELECT DISTINCT o_custkey AS cust,
                   l_suppkey + {_SUPP_BASE} AS supp
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )""",
        f"""h0 AS (
            SELECT DISTINCT cust, CAST({_HITS_INIT} AS BIGINT) AS score
            FROM pairs
        )""",
    ]
    # each CTE references its predecessor exactly ONCE (the max comes
    # from a window over the same scan, not a second scalar-subquery
    # reference) — a doubly-referenced stage would let CTE inlining
    # double the plan per round (exponential, the kmeans/pagerank
    # unrolled-oracle lesson)
    for i in range(1, HITS_ROUNDS + 1):
        parts.append(f"""ar{i} AS (
            SELECT p.supp, CAST(SUM(h.score) AS BIGINT) AS raw
            FROM pairs p JOIN h{i - 1} h ON h.cust = p.cust
            GROUP BY p.supp
        )""")
        parts.append(f"""a{i} AS (
            SELECT supp, (raw * 1000000) // MAX(raw) OVER () AS score
            FROM ar{i}
        )""")
        parts.append(f"""hr{i} AS (
            SELECT p.cust, CAST(SUM(a.score) AS BIGINT) AS raw
            FROM pairs p JOIN a{i} a ON a.supp = p.supp
            GROUP BY p.cust
        )""")
        parts.append(f"""h{i} AS (
            SELECT cust, (raw * 1000000) // MAX(raw) OVER () AS score
            FROM hr{i}
        )""")
    return f"""
        WITH {", ".join(parts)}
        SELECT side, node_id, score_micro FROM (
            SELECT side, node_id, score_micro,
                   ROW_NUMBER() OVER (PARTITION BY side
                                      ORDER BY score_micro DESC, node_id)
                       AS r
            FROM (
                SELECT 'hub' AS side, cust AS node_id, score AS score_micro
                FROM h{HITS_ROUNDS}
                UNION ALL
                SELECT 'authority', supp, score FROM a{HITS_ROUNDS}
            ) tagged
        ) ranked WHERE r <= {_HITS_TOPK}
        ORDER BY side, score_micro DESC, node_id
    """


GRAPH_HITS_SCORES_SQL = _hits_duck_sql()


CLOSENESS_SOURCES = 4    # sampled BFS sources (Eppstein–Wang estimator)
CLOSENESS_ROUNDS = 4     # same fixed hop budget as graph_bfs_depth
_CLOSE_TOPK = 20


def _closeness_round_sql(dist_rel: str, adj_rel: str) -> str:
    """One multi-source relaxation: same Bellman–Ford step as
    graph_bfs_depth with the state keyed (src, node)."""
    return f"""
        SELECT src, node_id, CAST(MIN(d) AS INTEGER) AS d
        FROM (
            SELECT src, node_id, d FROM {dist_rel}
            UNION ALL
            SELECT s.src, e.b AS node_id, s.d + 1 AS d
            FROM {dist_rel} s JOIN {adj_rel} e ON e.a = s.node_id
        ) relaxed
        GROUP BY src, node_id
    """


def _closeness_tail_sql(dist_rel: str) -> str:
    # harmonic centrality estimate: Σ_s 1/d(s, v) over the sampled
    # sources (d ≥ 1) — harmonic handles unreached sources gracefully
    # where classic closeness needs an infinite-distance convention
    return f"""
        SELECT node_id,
               CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sources_reached,
               CAST(SUM(CASE WHEN d > 0 THEN 1000000 {{intdiv}} d
                             ELSE 0 END) AS BIGINT) AS harmonic_micro
        FROM {dist_rel}
        GROUP BY node_id
        ORDER BY harmonic_micro DESC, node_id
        LIMIT {_CLOSE_TOPK}
    """


def graph_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled harmonic closeness centrality (Eppstein–Wang style): BFS
    from the {CLOSENESS_SOURCES} smallest nodes of the shared mutual-kNN
    supplier graph, {CLOSENESS_ROUNDS} synchronous relaxations, then
    per-node Σ 1/d over the sources — the estimator that makes
    centrality affordable when exact all-pairs BFS is O(n·m). Top
    {_CLOSE_TOPK} central nodes reported.

    Exactness: distances are exact hop integers; each 1/d term is one
    integer division of 1e6 (both engines truncate positive operands
    identically), so the score sum is pure BIGINT.

    Scale posture: the state relation is |sources|·|nodes| keyed
    (src, node) — sampling bounds the multiplier by construction; each
    round is the BFS equi-join + min-aggregate over the shared
    degree-bounded adjacency barrier, checkpointed per round (the
    kmeans/pagerank discipline)."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        barrier,
        cached_barrier_view,
    )

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    adj = _tri_adj_view(spark, sf_dir)
    dist = spark.sql(f"""
        SELECT node_id AS src, node_id, CAST(0 AS INTEGER) AS d
        FROM (SELECT DISTINCT a AS node_id FROM {adj}
              ORDER BY node_id LIMIT {CLOSENESS_SOURCES}) srcs
    """)
    for r in range(1, CLOSENESS_ROUNDS + 1):
        dist = barrier(dist)
        dist.createOrReplaceTempView(f"close_d{r - 1}")
        dist = spark.sql(_closeness_round_sql(f"close_d{r - 1}", adj))
    dist.createOrReplaceTempView("close_final")
    return spark.sql(
        _closeness_tail_sql("close_final").replace("{intdiv}", "DIV")
    )


def _closeness_duck_sql() -> str:
    adj_body = _triangle_adj_sql(
        "(SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)"
    )
    parts = [
        f"tri_adj AS MATERIALIZED ({adj_body})",
        f"""d0 AS MATERIALIZED (
            SELECT node_id AS src, node_id, CAST(0 AS INTEGER) AS d
            FROM (SELECT DISTINCT a AS node_id FROM tri_adj
                  ORDER BY node_id LIMIT {CLOSENESS_SOURCES}) srcs
        )""",
    ]
    for r in range(1, CLOSENESS_ROUNDS + 1):
        parts.append(
            f"d{r} AS MATERIALIZED "
            f"({_closeness_round_sql(f'd{r - 1}', 'tri_adj')})"
        )
    return (
        f"WITH {', '.join(parts)} "
        + _closeness_tail_sql(f"d{CLOSENESS_ROUNDS}").replace(
            "{intdiv}", "//"
        )
    )


GRAPH_CLOSENESS_SAMPLED_SQL = _closeness_duck_sql()


BET_SOURCES = 4   # sampled Brandes sources (smallest node ids)
BET_ROUNDS = 4    # BFS hop budget, matches closeness/bfs_depth
_BET_TOPK = 20


def _bet_fwd_round_sql(state_rel: str, adj_rel: str, r: int) -> str:
    """One STRICT BFS expansion with shortest-path counting: only the
    exact frontier (d = r-1) expands, only unvisited nodes enter, and
    sigma(w) sums the frontier parents' sigmas — the forward half of
    Brandes. (The closeness-style relax-everything step would
    double-count sigma, so this one anti-joins the visited set.)"""
    return f"""
        SELECT src, node_id, d, sig FROM {state_rel}
        UNION ALL
        SELECT s.src, e.b AS node_id, CAST({r} AS INTEGER) AS d,
               CAST(SUM(s.sig) AS BIGINT) AS sig
        FROM {state_rel} s
        JOIN {adj_rel} e ON e.a = s.node_id
        LEFT JOIN {state_rel} v
          ON v.src = s.src AND v.node_id = e.b
        WHERE s.d = {r - 1} AND v.node_id IS NULL
        GROUP BY s.src, e.b
    """


def _bet_bwd_round_sql(state_rel: str, adj_rel: str, lvl: int) -> str:
    """One backward dependency-accumulation level: nodes at depth
    lvl-1 collect sigma_v * (1 + delta_w) / sigma_w from their
    depth-lvl successors. delta is carried in micro (1e6 = 1.0) and
    every contribution is ONE nonnegative BIGINT division — truncation
    identical in both engines, so the accumulation is bit-exact."""
    return f"""
        SELECT s.src, s.node_id, s.d, s.sig,
               CAST(s.delta + COALESCE(u.add_d, 0) AS BIGINT) AS delta
        FROM {state_rel} s
        LEFT JOIN (
            SELECT v.src, v.node_id,
                   SUM((v.sig * (1000000 + w.delta)) {{intdiv}} w.sig)
                       AS add_d
            FROM {state_rel} v
            JOIN {adj_rel} e ON e.a = v.node_id
            JOIN {state_rel} w
              ON w.src = v.src AND w.node_id = e.b AND w.d = {lvl}
            WHERE v.d = {lvl - 1}
            GROUP BY v.src, v.node_id
        ) u ON u.src = s.src AND u.node_id = s.node_id
    """


def _bet_tail_sql(state_rel: str) -> str:
    return f"""
        SELECT node_id,
               CAST(COUNT(*) AS BIGINT) AS n_sources_reached,
               CAST(SUM(delta) AS BIGINT) AS betweenness_micro
        FROM {state_rel}
        WHERE node_id <> src
        GROUP BY node_id
        ORDER BY betweenness_micro DESC, node_id
        LIMIT {_BET_TOPK}
    """


_BET_SEED = f"""
    SELECT node_id AS src, node_id, CAST(0 AS INTEGER) AS d,
           CAST(1 AS BIGINT) AS sig
    FROM (SELECT DISTINCT a AS node_id FROM {{adj}}
          ORDER BY node_id LIMIT {BET_SOURCES}) srcs
"""


def graph_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled Brandes betweenness centrality on the mutual-kNN
    supplier graph: strict BFS with shortest-path counts from the
    {BET_SOURCES} smallest nodes ({BET_ROUNDS} hops), then the backward
    dependency accumulation delta_v = sum sigma_v(1+delta_w)/sigma_w over
    depth levels — the who-do-shortest-paths-flow-through centrality
    PageRank and closeness cannot express. Top {_BET_TOPK} brokers
    reported as the sampled estimate sum_s delta_s(v).

    Exactness: sigma counts are exact BIGINTs; delta accumulates in
    micro with one truncating nonnegative integer division per
    (edge, level) — bit-identical across engines and shuffle orders.

    Scale posture: state is |sources| x |reached| keyed (src, node);
    each of the 2x{BET_ROUNDS} stages is an equi-join against the
    degree-bounded adjacency barrier (<= n*K rows), checkpointed per
    round (the closeness/kcore discipline)."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        barrier,
        cached_barrier_view,
    )

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    adj = _tri_adj_view(spark, sf_dir)
    state = spark.sql(_BET_SEED.format(adj=adj))
    for r in range(1, BET_ROUNDS + 1):
        state = barrier(state)
        state.createOrReplaceTempView(f"bet_f{r - 1}")
        state = spark.sql(_bet_fwd_round_sql(f"bet_f{r - 1}", adj, r))
    state = barrier(
        state.selectExpr("src", "node_id", "d", "sig",
                         "CAST(0 AS BIGINT) AS delta")
    )
    for lvl in range(BET_ROUNDS, 0, -1):
        state.createOrReplaceTempView(f"bet_b{lvl}")
        state = barrier(spark.sql(
            _bet_bwd_round_sql(f"bet_b{lvl}", adj, lvl)
            .replace("{intdiv}", "DIV")
        ))
    state.createOrReplaceTempView("bet_final")
    return spark.sql(_bet_tail_sql("bet_final"))


def _betweenness_duck_sql() -> str:
    adj_body = _triangle_adj_sql(
        "(SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)"
    )
    parts = [
        f"tri_adj AS MATERIALIZED ({adj_body})",
        "f0 AS MATERIALIZED (" + _BET_SEED.format(adj="tri_adj") + ")",
    ]
    for r in range(1, BET_ROUNDS + 1):
        parts.append(
            f"f{r} AS MATERIALIZED "
            f"({_bet_fwd_round_sql(f'f{r - 1}', 'tri_adj', r)})"
        )
    parts.append(
        f"b{BET_ROUNDS} AS MATERIALIZED (SELECT src, node_id, d, sig,"
        f" CAST(0 AS BIGINT) AS delta FROM f{BET_ROUNDS})"
    )
    for lvl in range(BET_ROUNDS, 0, -1):
        parts.append(
            f"b{lvl - 1} AS MATERIALIZED ("
            + _bet_bwd_round_sql(f"b{lvl}", "tri_adj", lvl)
              .replace("{intdiv}", "//")
            + ")"
        )
    return f"WITH {', '.join(parts)} " + _bet_tail_sql("b0")


GRAPH_BETWEENNESS_SAMPLED_SQL = _betweenness_duck_sql()


def _assortativity_tail_sql(adj_rel: str) -> str:
    """Shared tail: Pearson degree assortativity r over the directed
    edge list (Newman 2002) — do high-degree nodes link to high-degree
    nodes? The one-number robustness/topology fingerprint next to the
    onion spectrum (assortative graphs fall apart differently under
    dedup pruning than disassortative ones). Degrees are k-NN-bounded
    (≤{TRIANGLE_KNN_K}) so every power sum is exact BIGINT; r is one
    double expression over exact sums, rounded to ppm."""
    return f"""
        deg AS (
            SELECT a AS node_id, CAST(COUNT(*) AS BIGINT) AS d
            FROM {adj_rel} GROUP BY a
        ),
        epairs AS (
            SELECT da.d AS x, db.d AS y
            FROM {adj_rel} e
            JOIN deg da ON da.node_id = e.a
            JOIN deg db ON db.node_id = e.b
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM epairs
        )
        SELECT m AS n_directed_edges,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
               CAST(round((m * sxy - sx * sy) * 1000000.0
                          / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                             * sqrt(CAST(m * syy - sy * sy AS DOUBLE))))
                    AS BIGINT) AS assortativity_ppm
        FROM sums
    """


def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the supplier co-purchase graph — see
    _assortativity_tail_sql. Rides the shared adjacency barrier; the
    degree aggregate and the two degree joins are keyed by node id
    (uniform, k-NN-bounded fan-out); the report is one 1-row moment
    aggregate."""
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    adj = _tri_adj_view(spark, sf_dir)
    return spark.sql("WITH " + _assortativity_tail_sql(adj))


GRAPH_DEGREE_ASSORTATIVITY_SQL = (
    "WITH tri_adj AS MATERIALIZED ("
    + _triangle_adj_sql("(SELECT DISTINCT l_orderkey, l_suppkey"
                        " FROM lineitem)")
    + "), "
    + _assortativity_tail_sql("tri_adj")
)


# ---------------------------------------------------------------------------
# graph_2hop_reach — strict 2-hop neighborhood size per node
# ---------------------------------------------------------------------------


def _two_hop_sql(adj_rel: str) -> str:
    """Per-node 1-hop degree, STRICT 2-hop count (nodes reachable in
    exactly two steps: not self, not already a direct neighbor), and
    the 2-hop reach share of the graph — the neighborhood-growth
    profile that separates hub-and-spoke from clustered topology
    (a high 2hop/1hop ratio means neighbors don't overlap — low
    clustering — which the triangle count measures from the other
    side).

    Scale posture: the wedge join over the degree-bounded adjacency is
    ≤ n·K² rows (mutual-top-{TRIANGLE_KNN_K} sparsification bounds K);
    the distinct + counts are (node)-keyed aggregates; n_nodes joins
    as a broadcast 1-row relation."""
    return f"""
        deg AS (
            SELECT a AS u, CAST(COUNT(*) AS BIGINT) AS n_1hop
            FROM {adj_rel} GROUP BY a
        ),
        two AS (
            SELECT DISTINCT e1.a AS u, e2.b AS w
            FROM {adj_rel} e1
            JOIN {adj_rel} e2 ON e1.b = e2.a
            WHERE e2.b <> e1.a
        ),
        strict2 AS (
            SELECT t.u, CAST(COUNT(*) AS BIGINT) AS n_2hop
            FROM two t
            LEFT JOIN {adj_rel} d ON d.a = t.u AND d.b = t.w
            WHERE d.a IS NULL
            GROUP BY t.u
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
        SELECT g.u AS node_id, g.n_1hop,
               CAST(COALESCE(s.n_2hop, 0) AS BIGINT) AS n_2hop,
               CAST(floor((g.n_1hop + COALESCE(s.n_2hop, 0)) * 1000000.0
                          / (n.n_nodes - 1)) AS BIGINT) AS reach_ppm
        FROM deg g
        LEFT JOIN strict2 s ON s.u = g.u
        CROSS JOIN nn n
        ORDER BY node_id
    """


def graph_2hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict 2-hop neighborhood profile — see _two_hop_sql. Rides the
    session-memoized tri_adj barrier (referenced 4× — each reference is
    a checkpoint-leaf scan)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    from mongo_to_clickhouse_spark.operators.materialize import (
        cached_barrier_view,
    )

    adj = _tri_adj_view(spark, sf_dir)
    return spark.sql("WITH " + _two_hop_sql(adj))


GRAPH_2HOP_REACH_SQL = (
    "WITH tri_adj AS ("
    + _triangle_adj_sql("(SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)")
    + "), "
    + _two_hop_sql("tri_adj")
)


QUERIES: dict[str, tuple] = {
    "graph_2hop_reach": (graph_2hop_reach, GRAPH_2HOP_REACH_SQL),
    "graph_degree_assortativity": (
        graph_degree_assortativity,
        GRAPH_DEGREE_ASSORTATIVITY_SQL,
    ),
    "graph_closeness_sampled": (
        graph_closeness_sampled,
        GRAPH_CLOSENESS_SAMPLED_SQL,
    ),
    "graph_pagerank": (graph_pagerank, GRAPH_PAGERANK_SQL),
    "graph_bfs_depth": (graph_bfs_depth, GRAPH_BFS_DEPTH_SQL),
    "graph_kcore_onion": (graph_kcore_onion, GRAPH_KCORE_ONION_SQL),
    "graph_hits_scores": (graph_hits_scores, GRAPH_HITS_SCORES_SQL),
    "graph_jaccard_similarity": (
        graph_jaccard_similarity,
        GRAPH_JACCARD_SIMILARITY_SQL,
    ),
    "graph_adamic_adar": (
        graph_adamic_adar,
        GRAPH_ADAMIC_ADAR_SQL,
    ),
    "graph_triangle_count": (graph_triangle_count, GRAPH_TRIANGLE_COUNT_SQL),
    "graph_label_propagation": (
        graph_label_propagation,
        GRAPH_LABEL_PROPAGATION_SQL,
    ),
    "graph_modularity": (graph_modularity, GRAPH_MODULARITY_SQL),
    "graph_betweenness_sampled": (
        graph_betweenness_sampled,
        GRAPH_BETWEENNESS_SAMPLED_SQL,
    ),
}
