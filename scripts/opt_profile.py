"""Per-query optimization profiler (round 11, guide §1).

Times individual registry queries with the noop sink (same methodology
as bench.py: warm session, median of N reps) and dumps
``.explain('formatted')`` for each to a plans dir — the before/after
evidence files the optimization rounds commit under ``plans/r11/``.

Usage:
    python scripts/opt_profile.py [--reps N] [--sf-dir DIR]
        [--plans-dir plans/r11] [--suffix before] qid [qid ...]

Prints one line per query: median, all samples, Exchange count and
other plan counters from plans/meta.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo_to_clickhouse_spark.session import get_spark
from mongo_to_clickhouse_spark import queries as registry
from mongo_to_clickhouse_spark.plans.meta import plan_counters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("qids", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=None,
                    help="dump explain('formatted') per query here")
    ap.add_argument("--suffix", default="before",
                    help="plan file suffix: <qid>_<suffix>.txt")
    args = ap.parse_args()

    spark = get_spark(app_name="opt-profile")
    reg = registry.registry()
    unknown = [q for q in args.qids if q not in reg]
    if unknown:
        print(f"unknown ids: {unknown}")
        sys.exit(1)
    spark.range(1).count()  # session warm

    for qid in args.qids:
        fn = reg[qid][0]
        df = fn(spark, args.sf_dir)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(os.path.join(
                    args.plans_dir, f"{qid}_{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        ops = plan_counters(df)
        # warm-up rep (codegen/footers), then timed reps
        spark.sparkContext.setJobDescription(f"warm:{qid}")
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"timed:{qid}:{r}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            samples.append(round(time.time() - t0, 3))
        med = sorted(samples)[len(samples) // 2]
        print(f"{qid}: median={med}s samples={samples} plan={ops}",
              flush=True)


if __name__ == "__main__":
    main()
