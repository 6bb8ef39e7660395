"""Render the r(N-1) -> r(N) per-query bench comparison as a markdown
table (the regression guard's human-readable form; round-1 verdict task
10 / round-2 verdict task 4).

Usage: python tools/bench_table.py [BENCH_full.json] [baseline.json]
Baseline = {"queries": {...}} (BENCH_r02_queries.json merges the r02
driver tail fragment over the r01 parsed map).
"""

from __future__ import annotations

import json
import math
import sys

REPO = __file__.rsplit("/", 2)[0]


def main() -> None:
    full = json.load(open(sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/BENCH_full.json"))
    base = json.load(
        open(sys.argv[2] if len(sys.argv) > 2 else f"{REPO}/BENCH_r02_queries.json")
    )["queries"]
    q = full["queries"]
    rows = sorted(
        ((q[k] / base[k], k, base[k], q[k]) for k in q if k in base),
        key=lambda r: -r[0],
    )
    gm = math.exp(sum(math.log(r[0]) for r in rows) / len(rows))
    print("| query | r02 driver (s) | r03 quiet box (s) | ratio |")
    print("|---|---|---|---|")
    for ratio, k, b, v in rows:
        flag = " **> 1.2x**" if ratio > 1.2 else ""
        print(f"| {k} | {b:.3f} | {v:.3f} | {ratio:.2f}x{flag} |")
    print(f"\ngeomean over {len(rows)} shared rows: **{gm:.3f}**")
    viol = [r for r in rows if r[0] > 1.2]
    print(f"rows past the 1.2x guard: {len(viol)}")


if __name__ == "__main__":
    main()
