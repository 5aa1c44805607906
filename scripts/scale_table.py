"""Render the full-registry scale-rehearsal TSV (scale_rehearsal.py
--resume-file) as the PARITY markdown table: per-id sf0.1/sf1 medians,
ratio, and a flag for ratios over the limit.

Usage: python scripts/scale_table.py /tmp/scale_resume.tsv [limit]
"""

from __future__ import annotations

import sys


def main() -> None:
    path = sys.argv[1]
    limit = float(sys.argv[2]) if len(sys.argv) > 2 else 7.5
    rows = []
    fails = []
    with open(path) as f:
        for line in f:
            qid, t1, t5, err = line.rstrip("\n").split("\t")
            if err:
                fails.append((qid, err))
            else:
                t1, t5 = float(t1), float(t5)
                rows.append((qid, t1, t5, t5 / max(t1, 1e-9)))
    rows.sort(key=lambda t: -t[3])
    over = [r for r in rows if r[3] > limit]
    ratios = sorted(r[3] for r in rows)
    print(f"{len(rows)} batch ids measured (sf0.1 vs sf1, 10x rows, "
          f"3-rep medians); ratio p50 "
          f"{ratios[len(ratios) // 2]:.2f}, p90 "
          f"{ratios[int(len(ratios) * 0.9)]:.2f}, max {ratios[-1]:.2f}; "
          f"{len(over)} over {limit}x; {len(fails)} failed.")
    print()
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for qid, t1, t5, r in rows:
        mark = " **(over)**" if r > limit else ""
        print(f"| {qid}{mark} | {t1:.2f} | {t5:.2f} | {r:.2f} |")
    for qid, err in fails:
        print(f"| {qid} | — | FAIL | {err[:60]} |")


if __name__ == "__main__":
    main()
