"""Log the corpus-derived index knobs per scale factor (round 11,
VERDICT r10 item 2: "knobs observed to move").

For each fixture dir, prints the corpus counts and every derived knob —
LSH bits/band, IVF centroid count + stride, SemDeDup K, pHash signature
bits — straight from the SAME functions the query plans call (the oracle
SQL mirrors the identical integer arithmetic from COUNT(*), pinned by
the knob-lockstep pytest sweeps). The PARITY record cites this table as
the proof that the autoscale arithmetic actually steps across decades
instead of only being argued about.

Usage: python scripts/knob_trace.py [dir ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from mongo_to_clickhouse_spark.queries.pipelineops import phash_bits
from mongo_to_clickhouse_spark.queries.vectorops import (
    cent_stride,
    ivf_k,
    lsh_bits,
    semdedup_k,
)

DEFAULT_DIRS = [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    "/root/repo/.localdata/sf1",
    "/root/repo/.localdata/sf10emb",
]


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT_DIRS
    print("| fixture | n_emb | n_docs | lsh_bits | ivf_K | cent_stride"
          " | semdedup_K | phash_bits |")
    print("|---|---|---|---|---|---|---|---|")
    for d in dirs:
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            print(f"| {d} | (missing) | | | | | | |")
            continue
        n_emb = pq.read_metadata(
            os.path.join(d, "embeddings.parquet")).num_rows
        n_docs = pq.read_metadata(
            os.path.join(d, "documents.parquet")).num_rows
        print(
            f"| {os.path.basename(d.rstrip('/'))} | {n_emb} | {n_docs} "
            f"| {lsh_bits(n_emb)} | {ivf_k(n_emb)} | {cent_stride(n_emb)} "
            f"| {semdedup_k(n_emb)} | {phash_bits(n_docs)} |"
        )


if __name__ == "__main__":
    main()
