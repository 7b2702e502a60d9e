#!/usr/bin/env python3
"""Scaling report: per-query ratio between two BENCH_DETAIL.json files.

Usage: python3 scripts/scaling_report.py <small.json> <big.json> [flag_ratio]

Prints every query's min at both scales and the big/small ratio, sorted
descending, flagging ratios above `flag_ratio` (default 15 — 10x data
plus log factors plus noise head-room; sub-second queries are mostly
fixed cost, so ratios only mean anything once the big-scale min clears
~1.5 s). The calib ratio is printed so cross-machine runs can be
normalized by eye.
"""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0

sq, bq = small["queries"], big["queries"]
common = sorted(set(sq) & set(bq))
print(f"calib: small={small.get('calib')} big={big.get('calib')}  "
      f"n_common={len(common)}")
rows = []
for q in common:
    s, b = sq[q]["min"], bq[q]["min"]
    rows.append((b / max(s, 1e-9), s, b, q))
rows.sort(reverse=True)
nflag = 0
for r, s, b, q in rows:
    mark = ""
    if r > flag and b > 1.5:
        mark = "  <-- SUPERLINEAR?"
        nflag += 1
    print(f"{q:28s} {s:8.2f} {b:8.2f}  x{r:6.1f}{mark}")
print(f"\nflagged: {nflag} (ratio>{flag} and big>1.5s)")
print(f"totals: small={sum(v['min'] for v in sq.values()):.1f}s "
      f"big={sum(v['min'] for v in bq.values()):.1f}s")
