"""Planted-fixture semantics for sim_knn_graph_matmul: three disjoint
direction groups where the correct k-NN graph is unambiguous — each
vector's neighbors must be exactly the 4 smallest in-group ids (scaled
copies of one base direction have identical LSH signatures and micro
cosine exactly 1.0; cross-group cosine is exactly 0 on disjoint
supports)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.vectorops import (
    KNN_GRAPH_K,
    sim_knn_graph_lsh,
    sim_knn_graph_matmul,
)

_DIM = 64
_GROUPS = 3
_PER_GROUP = 10


def _stage(tmp_path) -> str:
    # group g owns a contiguous dim slice; member i is a pure SCALING of
    # the group base (scaling never flips a hyperplane sign, so every
    # group member lands in identical LSH buckets)
    spans = [(0, 21), (21, 42), (42, 64)]
    vecs, ids, labels = [], [], []
    for g, (lo, hi) in enumerate(spans):
        for i in range(_PER_GROUP):
            v = [0.0] * _DIM
            scale = 1.0 + i * 1e-3
            for j in range(lo, hi):
                v[j] = scale
            vecs.append(v)
            ids.append(g * _PER_GROUP + i)
            labels.append(g)
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "embeddings.parquet"))
    return str(tmp_path)


def test_knn_graph_matmul_planted_groups(spark, tmp_path):
    sf = _stage(tmp_path)
    rows = sim_knn_graph_matmul(spark, sf).collect()
    by_vec: dict[int, list] = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    assert set(by_vec) == set(range(_GROUPS * _PER_GROUP))
    for vid, rs in by_vec.items():
        g = vid // _PER_GROUP
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == list(
            range(1, KNN_GRAPH_K + 1)
        )
        # parallel integer-micro vectors: cosine is exactly 1.0
        assert all(r.sim == 1.0 for r in rs), rs
        want = [
            v
            for v in range(g * _PER_GROUP, (g + 1) * _PER_GROUP)
            if v != vid
        ][:KNN_GRAPH_K]
        assert sorted(r.neighbor_id for r in rs) == want, (vid, rs)


def test_ivf_kernel_planted_groups(spark, tmp_path):
    """With 30 vectors there is exactly one IVF centroid (vec_id 0), so
    the kernel search degenerates to exact brute force: every probe
    (ids 0..9 — all group 0) must rank its 5 smallest in-group peers
    first (in-group micro cosine exactly 1.0, cross-group exactly 0)."""
    from mongo_to_clickhouse_spark.queries.vectorops import (
        TOPK,
        sim_ann_ivf_kernel,
    )

    sf = _stage(tmp_path)
    rows = sim_ann_ivf_kernel(spark, sf).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    assert set(by_probe) == set(range(_PER_GROUP))
    for pid, rs in by_probe.items():
        assert sorted(r.rank for r in rs) == list(range(1, TOPK + 1))
        assert all(r.sim == 1.0 for r in rs), rs
        want = [v for v in range(_PER_GROUP) if v != pid][:TOPK]
        assert sorted(r.neighbor_id for r in rs) == want, (pid, rs)


def test_knn_graph_matmul_vs_independent_numpy_replica(spark, tmp_path):
    """Random fixture, full independent recomputation: bands from the
    module's hyperplanes, the spread-rank cap, micro-quantized cosine,
    distinct-across-bands, global top-K — all re-derived here with
    plain numpy/python (no shared helper code paths beyond the plane
    constants), compared row-for-row."""
    import numpy as np

    from mongo_to_clickhouse_spark.queries.vectorops import (
        _MAX_BITS,
        _PLANES,
        KNN_BUCKET_CAP,
        KNN_GRAPH_K,
        LSH_BANDS,
        lsh_bits,
        sim_knn_graph_matmul,
    )

    rng = np.random.RandomState(1234)
    n, dim = 120, 64
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "embeddings.parquet"))

    # independent reference
    planes = np.array(_PLANES)
    x = vecs.astype(np.float64)
    bits = (x @ planes.T >= 0).astype(np.int64)          # n × plane pool
    nbits = lsh_bits(n)  # corpus-size-derived per-band signature width
    v = np.sign(x * 1e6) * np.floor(np.abs(x * 1e6) + 0.5)
    v = v.astype(np.int64)
    nrm = np.sqrt((v * v).sum(axis=1).astype(np.float64))
    pairs = {}
    for b in range(LSH_BANDS):
        val = np.zeros(n, dtype=np.int64)
        for i in range(nbits):  # LSB packing from the band's pool slice
            val = val + bits[:, b * _MAX_BITS + i] * (2 ** i)
        for bucket in np.unique(val):
            members = np.nonzero(val == bucket)[0]
            spread = (members * 2654435761) % 1000000007
            cand = members[np.lexsort((members, spread))][:KNN_BUCKET_CAP]
            for a in members:
                for c in cand:
                    if a != c:
                        s = round(
                            float(v[a] @ v[c]) / (nrm[a] * nrm[c]), 6
                        )
                        pairs[(a, c)] = s
    expect = set()
    by_a: dict[int, list] = {}
    for (a, c), s in pairs.items():
        by_a.setdefault(a, []).append((-s, c))
    for a, lst in by_a.items():
        for rank, (negs, c) in enumerate(sorted(lst)[:KNN_GRAPH_K], 1):
            expect.add((a, c, -negs, rank))

    got = {
        (r.vec_id, r.neighbor_id, r.sim, r.rank)
        for r in sim_knn_graph_matmul(spark, str(tmp_path)).collect()
    }
    assert got == expect


def test_knn_graph_twins_agree_on_planted_groups(spark, tmp_path):
    """The relational twin must produce the same neighbor SETS on the
    planted fixture (its float cosine may round 1.0 vs 0.999999 — sets,
    ranks, and counts are the quantization-independent contract)."""
    sf = _stage(tmp_path)
    a = {
        (r.vec_id, r.neighbor_id)
        for r in sim_knn_graph_matmul(spark, sf).collect()
    }
    b = {
        (r.vec_id, r.neighbor_id)
        for r in sim_knn_graph_lsh(spark, sf).collect()
    }
    assert a == b
