"""Scale rehearsal: time a query set at sf0.1 vs the synthesized sf0.5.

VERDICT r6 item 4: the Σ|bucket|² / Σ|cluster|² bounds and the
fixed-round iterative trainers had only ever been measured at ~600k
rows. This runs the N most expensive headline queries plus the
dedup/ANN tier at both scales (5x rows; see gen_scale_fixture.py for
why duplicate RATES are held scale-invariant) and prints a markdown
ratio table for the PARITY record. A time ratio well under rows-ratio²
(25x) — ideally near the 5x data ratio on a fixed-core machine —
is the empirical check that nothing in the plan is quadratic.

Usage:
  python scripts/gen_scale_fixture.py            # once, ~1 min
  python scripts/scale_rehearsal.py [--reps 3] [--ids id1,id2,...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF05 = "/root/repo/.localdata/sf0.5"

# the dedup / ANN / embedding scale tier — the ids whose 100 TB story
# depends on candidate-space bounds rather than plain shuffles
SCALE_TIER = [
    "dedup_exact_hash",
    "dedup_minhash_lsh_pairs",
    "dedup_cluster_components",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_semdedup_matmul",
    "dedup_substring_apply",
    "pipeline_dedup_cascade",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_ivf_kernel",
    "sim_ann_pq",
    "sim_knn_graph_lsh",
    "sim_knn_graph_matmul",
    "text_bm25_topk",
    "multimodal_phash_dedup",
    "multimodal_phash_kernel",
    # round-8 additions (VERDICT r7 item 4): the iterative graph tier's
    # constants — betweenness is per-(source, node) keyed BFS rounds,
    # modularity is the barriered LPA chain + label equi-joins
    "graph_betweenness_sampled",
    "graph_modularity",
    # round-9 additions: the new pipeline/graph/eval surface
    "events_funnel_unordered",
    "events_did_estimator",
    "sample_ess_importance",
    "pipeline_chunk_overlap",
    "pipeline_rag_ingest_manifest",
    "graph_adamic_adar",
    "eval_ann_recall_curve",
    "decontaminate_ngram_sweep",
    "pipeline_pretraining_manifest",
    "tokenizer_wordpiece_apply",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--ids", default="")
    ap.add_argument("--all-batch", action="store_true",
                    help="measure EVERY batch registry id (round 10: the "
                         "streaming-runtime ids that stage and run a real "
                         "stream are excluded; the batch-checkable "
                         "window aggs stay in)")
    ap.add_argument("--target", default=SF05,
                    help="comparison fixture dir (e.g. .localdata/sf1)")
    ap.add_argument("--resume-file", default="",
                    help="TSV of per-id results; existing rows are "
                         "skipped on restart, new rows appended")
    ap.add_argument("--ratio-limit", type=float, default=7.5,
                    help="flag queries whose time ratio exceeds this")
    args = ap.parse_args()
    target = args.target
    tname = os.path.basename(target.rstrip("/"))

    from __spark_entry__ import queries
    from mongo_to_clickhouse_spark.session import get_spark

    reg = queries()
    if args.all_batch:
        skip_prefixes = ("stream_", "source_changestream",
                         "checkpoint_resume_token", "sink_dlq_log",
                         "metric_throughput")
        keep = {"stream_tumbling_window_agg", "stream_sliding_window_agg",
                "stream_session_window", "stream_session_window_dynamic_gap"}
        ids = sorted(q for q in reg
                     if q in keep or not q.startswith(skip_prefixes))
    elif args.ids:
        ids = [i for i in args.ids.split(",") if i]
    else:
        with open(os.path.join(os.path.dirname(__file__), "..",
                               "BENCH_QUERIES.json")) as f:
            bq = json.load(f)["queries"]
        top = sorted(bq, key=bq.get, reverse=True)[: args.top]
        ids = list(dict.fromkeys(top + SCALE_TIER))
    unknown = [i for i in ids if i not in reg]
    if unknown:
        raise SystemExit(f"unknown ids: {unknown}")
    if not os.path.exists(os.path.join(target, "lineitem.parquet")):
        raise SystemExit("run scripts/gen_scale_fixture.py first")

    spark = get_spark()
    spark.range(1).count()  # absorb session startup

    def run(qid: str, sf_dir: str) -> float:
        fn = reg[qid][0] if isinstance(reg[qid], tuple) else reg[qid]
        samples = []
        for _ in range(args.reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        return sorted(samples)[args.reps // 2]

    # incremental TSV so a crash/restart skips measured ids (round 10:
    # the first --all-batch sweep died twice on sf1-only overflows; a
    # failed id records FAIL + the exception head and the sweep
    # continues, so ONE pass finds every scale bug)
    done: dict[str, tuple] = {}
    if args.resume_file and os.path.exists(args.resume_file):
        with open(args.resume_file) as f:
            for line in f:
                qid, t1, t5, err = line.rstrip("\n").split("\t")
                done[qid] = (float(t1), float(t5), err)

    rows = []
    fails = []
    res_f = open(args.resume_file, "a") if args.resume_file else None
    for qid in ids:
        if qid in done:
            t1, t5, err = done[qid]
            if err:
                fails.append((qid, err))
            else:
                rows.append((qid, t1, t5, t5 / max(t1, 1e-9)))
            continue
        err = ""
        t1 = t5 = float("nan")
        try:
            t1 = run(qid, SF01)
            t5 = run(qid, target)
            rows.append((qid, t1, t5, t5 / max(t1, 1e-9)))
            print(f"  {qid}: sf0.1 {t1:.2f}s  {tname} {t5:.2f}s  "
                  f"x{t5 / max(t1, 1e-9):.2f}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            err = str(exc).split("\n")[0][:200]
            fails.append((qid, err))
            print(f"  {qid}: FAIL {err}", file=sys.stderr)
        if res_f:
            res_f.write(f"{qid}\t{t1}\t{t5}\t{err}\n")
            res_f.flush()
    if res_f:
        res_f.close()

    print(f"| query | sf0.1 s | {tname} s | time ratio |")
    print("|---|---|---|---|")
    for qid, t1, t5, r in sorted(rows, key=lambda t: -t[3]):
        print(f"| {qid} | {t1:.2f} | {t5:.2f} | {r:.2f} |")
    sup = [q for q, _, _, r in rows if r > args.ratio_limit]
    print()
    print(f"Queries over the ratio limit ({args.ratio_limit}): "
          f"{sup or 'none'}")
    if fails:
        print()
        print(f"FAILED at {tname} ({len(fails)}):")
        for qid, err in fails:
            print(f"- {qid}: {err}")


if __name__ == "__main__":
    main()
