"""Synthesize a larger scale-factor fixture from the driver's sf0.1 tables.

The driver only ships sf{0.001,0.01,0.1} (TESTDATA.md); the scale story
(Σ|bucket|² bounds, fixed-round iterative trainers, exchange budgets) has
therefore only ever been *measured* at ~600k lineitem rows. This script
manufactures an sfX fixture (default 5x => "sf0.5") by replicating sf0.1
REPS times with disjoint key spaces, so per-key cardinalities (orders per
customer, lines per order, events per user) stay CONSTANT while table
sizes scale — the same property the real TPC-H generator has.

Care is taken not to fabricate cross-replica duplicate structure that the
real corpus would not have:

- documents: replica i>0 deterministically mutates ~1/3 of words (suffix
  "~i" on words whose xxhash-free builtin hash % 3 == 0), which destroys
  cross-replica shingle overlap (near-dup Jaccard << LSH thresholds)
  while preserving the intra-replica duplicate/near-dup structure
  byte-for-byte. Dedup RATES are thus scale-invariant, as in a real 5x
  corpus, instead of artificially 5x-ing.
- embeddings: replica i>0 vectors are FRESH samples from the per-label
  empirical distribution of sf0.1 (label mean + seeded Gaussian residual
  with the label's per-component std), not perturbed copies. A perturbed
  copy keeps cosine ~0.95 to its source — far above the fixture near-dup
  threshold (0.38) — and would fabricate quadratic Σ|cluster|² growth
  that a real 5x corpus does not have. Fresh same-distribution samples
  have cross-replica cosine at the within-label level (~0.0-0.1 on this
  fixture), so dedup/ANN candidate rates stay scale-invariant.
- region/nation are fixed dimensions and are NOT replicated (as in
  TPC-H, where nation is 25 rows at every sf).

Outputs parquet to --out (default /root/repo/.localdata/sf0.5), which is
gitignored; TESTDATA is read-only and not touched.

Usage: python scripts/gen_scale_fixture.py [--reps 5] [--out DIR]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# Write SPLITTABLE parquet (round 11, SCALE.md §6n): pyarrow's default
# is one row group per table, and Spark cannot split a single row
# group across tasks — the first sf10emb fixture serialized EVERY
# scan-rooted plan into one task, inflating the whole text tier's 100×
# ratios to 50-105× (an artifact of the fixture, not the plans; real
# 100 TB inputs arrive as thousands of row groups). 16k rows per group
# gives the 500k-row documents table ~31 splittable groups.
ROW_GROUP_ROWS = 16_384

# key columns to offset per replica, per table: col -> span source table
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key -> which table/col defines its span (max+1)
SPAN_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def _mutate_text(text: str, rep: int) -> str:
    # deterministic (python hash of str is salted per-process — use a
    # stable rolling hash instead) ~1/3 word mutation
    out = []
    for w in text.split(" "):
        h = 0
        for ch in w:
            h = (h * 131 + ord(ch)) & 0x7FFFFFFF
        out.append(w + "~" + str(rep) if h % 3 == 0 else w)
    return " ".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="/root/repo/.localdata/sf0.5")
    ap.add_argument(
        "--tables", default="",
        help="comma list of tables to replicate (others are copied from "
        "sf0.1 unreplicated) — e.g. documents,embeddings for the "
        "second-decade embedding-tier fixture, where replicating the "
        "relational tables 100x would cost GBs for ids that never read "
        "them",
    )
    args = ap.parse_args()
    only = set(t for t in args.tables.split(",") if t)
    os.makedirs(args.out, exist_ok=True)

    spans = {}
    cache = {}
    for key, (tbl, col) in SPAN_OF.items():
        if tbl not in cache:
            cache[tbl] = pq.read_table(os.path.join(SRC, tbl + ".parquet"))
        spans[key] = int(pa.compute.max(cache[tbl][col]).as_py()) + 1

    for tbl in ["region", "nation"]:
        t = pq.read_table(os.path.join(SRC, tbl + ".parquet"))
        pq.write_table(t, os.path.join(args.out, tbl + ".parquet"),
                       row_group_size=ROW_GROUP_ROWS)
        print(tbl, t.num_rows, "(fixed dim, not replicated)")

    for tbl, keys in OFFSET_COLS.items():
        t = cache.get(tbl) or pq.read_table(os.path.join(SRC, tbl + ".parquet"))
        if only and tbl not in only:
            pq.write_table(t, os.path.join(args.out, tbl + ".parquet"),
                       row_group_size=ROW_GROUP_ROWS)
            print(tbl, t.num_rows, "(copied unreplicated, not in --tables)")
            continue
        reps = []
        for i in range(args.reps):
            cols = {}
            for name in t.column_names:
                arr = t[name]
                if name in keys and i > 0:
                    off = i * spans[name]
                    cols[name] = pa.compute.add(arr, off).cast(arr.type)
                elif tbl == "documents" and name == "text" and i > 0:
                    vals = [_mutate_text(v, i) if v is not None else None
                            for v in arr.to_pylist()]
                    cols[name] = pa.array(vals, type=pa.string())
                elif tbl == "embeddings" and name == "embedding" and i > 0:
                    V = np.array(arr.to_pylist(), dtype=np.float32)
                    L = np.array(t["label"].to_pylist())
                    out = np.empty_like(V)
                    for lab in np.unique(L):
                        mask = L == lab
                        X = V[mask]
                        mu, sd = X.mean(0), X.std(0) + 1e-9
                        rng = np.random.default_rng(1_000_000 * i + int(lab))
                        out[mask] = mu + rng.normal(
                            0.0, 1.0, X.shape).astype(np.float32) * sd
                    cols[name] = pa.array(
                        [v.tolist() for v in out], type=arr.type)
                else:
                    cols[name] = arr
            reps.append(pa.table(cols))
        big = pa.concat_tables(reps)
        # n_chars must track the mutated text
        if tbl == "documents":
            lens = pa.compute.utf8_length(big["text"]).cast(pa.int64())
            big = big.set_column(big.column_names.index("n_chars"),
                                 "n_chars", lens)
        pq.write_table(big, os.path.join(args.out, tbl + ".parquet"),
                       row_group_size=ROW_GROUP_ROWS)
        print(tbl, big.num_rows)


if __name__ == "__main__":
    main()
