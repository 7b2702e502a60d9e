#!/usr/bin/env python3
"""Splice one family's fresh per-family bench into a standing
BENCH_DETAIL-format artifact. The fresh-JVM-per-family methodology
already gives every family its own calibration (family_calib /
family_calib_io), so replacing a family wholesale with a newer
same-methodology run — its queries AND its calib entries — keeps the
artifact internally consistent; the top-level calib/calib_io and total
are recomputed as the family-calib mean and query-min sum.

Usage: splice_family.py standing.json fresh.json family
"""
import json
import sys

standing_path, fresh_path, fam = sys.argv[1], sys.argv[2], sys.argv[3]
standing = json.load(open(standing_path))
fresh = json.load(open(fresh_path))

fresh_fams = {q.split("_")[0] for q in fresh["queries"]}
assert fresh_fams == {fam}, f"fresh run holds {fresh_fams}, expected {{{fam}}}"

standing["queries"] = {
    **{k: v for k, v in standing["queries"].items()
       if k.split("_")[0] != fam},
    **fresh["queries"],
}
for key in ("family_calib", "family_calib_io"):
    standing.setdefault(key, {})[fam] = fresh[key][fam] \
        if key in fresh and fam in fresh[key] else fresh.get(
            key.replace("family_", ""))
# top-level calib/calib_io stay the STANDING run's own (the parent
# JVM's calibration, the floor family_scaling.py subtracts) — the
# spliced family's drift is visible in its family_calib entry instead
standing["n_queries"] = len(standing["queries"])
standing["value"] = round(sum(v["min"] for v in standing["queries"].values()), 3)
json.dump(standing, open(standing_path, "w"))
print(f"spliced {len(fresh['queries'])} {fam} queries into {standing_path}: "
      f"n={standing['n_queries']} total={standing['value']} "
      f"calib={standing['calib']}")
