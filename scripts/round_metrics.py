"""Per-round job metrics capture (round 12, VERDICT r11 item 5).

The Arrow-round iterative operators (pagerank, PCA, k-means, k-center,
BPE, betweenness) run their per-round jobs EAGERLY at DataFrame-build
time, so the committed `.explain` plan files show only the final result
relation — a plan-fingerprint blind spot: a reintroduced corpus-sized
shuffle inside a round would not change any committed artifact. This
script closes the gap by recording, for each registry query, every job
the build+noop executes with its per-stage task counts and shuffle
read/write bytes, straight from the live AppStatusStore (no UI/REST
needed). Commit the output as plans/<dir>/<qid>_rounds.json and diff it
like a plan file.

Usage:
    python scripts/round_metrics.py [--sf-dir DIR] [--out-dir plans/r12]
        qid [qid ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo_to_clickhouse_spark.session import get_spark
from mongo_to_clickhouse_spark import queries as registry


def _scala_seq(seq):
    for i in range(seq.size()):
        yield seq.apply(i)


def _opt(o):
    return o.get() if o is not None and not o.isEmpty() else None


def capture(spark, fn, sf_dir: str, qid: str) -> dict:
    """Run build + noop sink for one query and return every job it
    submitted, with per-stage shuffle/input bytes and task counts."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    before = {j.jobId() for j in _scala_seq(store.jobsList(None))}

    sc.setJobDescription(f"rounds:{qid}:build")
    df = fn(spark, sf_dir)
    sc.setJobDescription(f"rounds:{qid}:noop")
    df.write.format("noop").mode("overwrite").save()
    sc.setJobDescription(None)

    stages = {}
    # Spark 4.1 signature: stageList(statuses, details, withSummaries,
    # unsortedQuantiles: double[] (non-null), taskStatus)
    no_q = sc._gateway.new_array(sc._jvm.double, 0)
    for s in _scala_seq(store.stageList(None, False, False, no_q, None)):
        stages[s.stageId()] = {
            "stage_id": s.stageId(),
            "name": str(s.name()).split("\n")[0][:120],
            "num_tasks": s.numTasks(),
            "input_bytes": s.inputBytes(),
            "output_bytes": s.outputBytes(),
            "shuffle_read_bytes": s.shuffleReadBytes(),
            "shuffle_write_bytes": s.shuffleWriteBytes(),
            "executor_run_time_ms": s.executorRunTime(),
        }
    jobs = []
    for j in _scala_seq(store.jobsList(None)):
        if j.jobId() in before:
            continue
        jstages = [stages[sid] for sid in
                   (s for s in _scala_seq(j.stageIds())) if sid in stages]
        jobs.append({
            "job_id": j.jobId(),
            "description": _opt(j.description()),
            "name": str(j.name()).split("\n")[0][:120],
            "num_tasks": j.numTasks(),
            "shuffle_read_bytes": sum(s["shuffle_read_bytes"]
                                      for s in jstages),
            "shuffle_write_bytes": sum(s["shuffle_write_bytes"]
                                       for s in jstages),
            "input_bytes": sum(s["input_bytes"] for s in jstages),
            "stages": sorted(jstages, key=lambda s: s["stage_id"]),
        })
    jobs.sort(key=lambda j: j["job_id"])
    return {
        "query": qid,
        "sf_dir": sf_dir,
        "n_jobs": len(jobs),
        "total_shuffle_write_bytes": sum(j["shuffle_write_bytes"]
                                         for j in jobs),
        "total_tasks": sum(j["num_tasks"] for j in jobs),
        "jobs": jobs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("qids", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="round-metrics")
    reg = registry.registry()
    unknown = [q for q in args.qids if q not in reg]
    if unknown:
        print(f"unknown ids: {unknown}")
        sys.exit(1)
    spark.range(1).count()  # session warm

    for qid in args.qids:
        rec = capture(spark, reg[qid][0], args.sf_dir, qid)
        print(f"{qid}: jobs={rec['n_jobs']} tasks={rec['total_tasks']} "
              f"shuffle_write={rec['total_shuffle_write_bytes']}")
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            with open(os.path.join(args.out_dir,
                                   f"{qid}_rounds.json"), "w") as f:
                json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
