"""Simulate the driver's verify flow end-to-end through the public
contract (__spark_entry__ only — no internal imports): t1 smoke on
sf0.001, t2 oracle comparison on sf0.01.

Usage: python scripts/driver_sim.py [sf_dir] [query_id ...]

With query_id args, only those registry entries are checked (fast
targeted re-verification); the t1 smoke still runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # the driver's view of the repo
from tests.oracle_harness import compare, duck_connection

from mongo_to_clickhouse_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="driver-sim")

    t0 = time.time()
    smoke = contract.entry(spark)
    n = smoke.count()
    print(f"t1 smoke: entry() -> {n} rows, schema={smoke.schema.simpleString()}")
    assert n > 0

    qs = contract.queries()
    oracles = contract.oracle_sql()
    if len(sys.argv) > 2:
        only = set(sys.argv[2:])
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query ids: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    con = duck_connection(sf_dir)
    results = {}
    for qid, fn in sorted(qs.items()):
        t = time.time()
        try:
            df = fn(spark, sf_dir)
            if qid in oracles:
                problems = compare(df, con, oracles[qid])
                results[qid] = "MATCH" if not problems else f"MISMATCH: {problems}"
            else:
                results[qid] = f"ROWS_ONLY: {df.count()} rows"
        except Exception as exc:  # noqa: BLE001
            results[qid] = f"ERROR: {exc}"
        print(f"  {qid}: {results[qid]} ({time.time()-t:.1f}s)")

    bad = {k: v for k, v in results.items() if v.startswith(("MISMATCH", "ERROR"))}
    print(json.dumps({
        "sf_dir": sf_dir,
        "total": len(qs),
        "oracle_checked": len(oracles),
        "failed": len(bad),
        "elapsed_sec": round(time.time() - t0, 1),
    }))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
