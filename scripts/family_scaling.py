#!/usr/bin/env python3
"""Per-query and per-family scaling exponents between two Bench JSON
dumps (e.g. sf1 vs sf3): alpha = log(t2/t1) / log(rows2/rows1), after
subtracting the per-run calibration floor from each sample.

Usage: family_scaling.py bench_sf1.json bench_sf3.json ratio [coupled...]
  ratio    data-size ratio between the two runs (3 for sf1->sf3)
  coupled  query names whose WORKLOAD scales with the corpus by fixture
           construction (query count / centroid count / band width) --
           flagged, and excluded from the family exponent.
"""
import json
import math
import sys


def _mins(d: dict) -> dict:
    """Accept both the compact one-line artifact ({name: secs}) and the
    full BENCH_DETAIL format ({name: {"min": secs, "spread": ...}})."""
    return {k: (v["min"] if isinstance(v, dict) else v)
            for k, v in d["queries"].items()}


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3])
    coupled = set(sys.argv[4:])
    qa, qb = _mins(a), _mins(b)
    floor_a, floor_b = a.get("calib", 0.0), b.get("calib", 0.0)
    fams = {}
    print(f"{'query':28s} {'t1':>8s} {'t2':>8s} {'alpha':>6s}  flag")
    for name in sorted(qa, key=lambda n: -qb.get(n, 0)):
        if name not in qb:
            continue
        t1 = max(qa[name] - floor_a, 0.05)
        t2 = max(qb[name] - floor_b, 0.05)
        alpha = math.log(t2 / t1) / math.log(ratio)
        flag = "COUPLED" if name in coupled else (
            "SUPERLINEAR" if alpha > 1.35 else "")
        print(f"{name:28s} {qa[name]:8.2f} {qb[name]:8.2f} {alpha:6.2f}  {flag}")
        fam = name.split("_")[0]
        if name not in coupled:
            fams.setdefault(fam, []).append((t1, t2))
    print()
    for fam, cells in sorted(fams.items()):
        s1, s2 = sum(c[0] for c in cells), sum(c[1] for c in cells)
        alpha = math.log(s2 / s1) / math.log(ratio)
        print(f"family {fam:8s} (excl. coupled): t1={s1:8.1f}s "
              f"t2={s2:8.1f}s alpha={alpha:5.2f} n={len(cells)}")


if __name__ == "__main__":
    main()
