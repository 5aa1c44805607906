"""Diff two bench.py outputs (or driver BENCH_r{N}.json records):
per-query time deltas, plan-fingerprint changes, and structural-counter
changes, most-regressed first.

Usage: python scripts/bench_diff.py OLD.json NEW.json

Accepts either the raw one-line bench.py output or the driver's
wrapper format ({"parsed": {...}}). Since round 5 the plan
fingerprints/counters live in a separate BENCH_PLANS.json (the headline
line must stay compact for the driver's tail capture); pass a bench
JSON that embeds them (rounds 3-4) or merge them yourself — missing
plan data just suppresses the plan-change notes.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read().strip()
    try:
        d = json.loads(txt)  # driver wrapper: pretty-printed multi-line
    except json.JSONDecodeError:
        d = json.loads(txt.splitlines()[-1])  # raw bench.py stdout
    return d.get("parsed", d)


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    qo, qn = old.get("queries", {}), new.get("queries", {})
    fo, fn_ = old.get("plan_fp", {}), new.get("plan_fp", {})
    co, cn = old.get("plan_ops", {}), new.get("plan_ops", {})

    rows = []
    for qid in sorted(set(qo) | set(qn)):
        if qid not in qo:
            rows.append((float("inf"), f"{qid}: NEW {qn[qid]:.3f}s"))
            continue
        if qid not in qn:
            rows.append((float("-inf"), f"{qid}: REMOVED (was {qo[qid]:.3f}s)"))
            continue
        delta = qn[qid] - qo[qid]
        notes = []
        if fo.get(qid) and fn_.get(qid) and fo[qid] != fn_[qid]:
            oc, nc = co.get(qid), cn.get(qid)
            if oc == nc and oc is not None:
                notes.append("plan reshaped (counters unchanged)")
            else:
                diffs = {
                    k: (oc.get(k), nc.get(k))
                    for k in (nc or {})
                    if oc and oc.get(k) != nc.get(k)
                } if oc and nc else {}
                notes.append(f"PLAN CHANGED {diffs or '(no counters)'}")
        rows.append(
            (delta,
             f"{qid}: {qo[qid]:.3f} -> {qn[qid]:.3f} ({delta:+.3f}s)"
             + (("  [" + "; ".join(notes) + "]") if notes else ""))
        )

    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)
    shared = set(qo) & set(qn)
    so, sn = sum(qo[q] for q in shared), sum(qn[q] for q in shared)
    print(f"\ntotals: {old.get('value')} -> {new.get('value')}"
          f" | shared-{len(shared)}: {so:.2f} -> {sn:.2f}"
          f" ({sn / so:.3f}x)" if shared else "")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
