#!/usr/bin/env python3
"""Fold the sf1 sweep logs into one evidence JSON.

Usage: python3 scripts/collect_sf1_evidence.py out.json log1 [log2 ...]
Each log is a selfverify.py / verify_staged_c2.py stdout capture; later
logs override earlier verdicts for the same query (re-runs win).
"""
import json, re, sys

out, logs = sys.argv[1], sys.argv[2:]
verdicts = {}
for path in logs:
    for line in open(path, errors="replace"):
        m = re.match(r"(PASS|FAIL) (\w+)(.*)", line.strip())
        if m:
            verdicts[m.group(2)] = {
                "status": m.group(1),
                "detail": m.group(3).strip(" :(").rstrip(")"),
            }
n_pass = sum(1 for v in verdicts.values() if v["status"] == "PASS")
doc = {
    "sweep": "sf1.0 hash-exact oracle sweep",
    "generator": "scripts/gen_sf1.py seed=420 (driver-shaped domains, 10x sf0.1 volumes; ~6.0M lineitem rows)",
    "n_queries": len(verdicts),
    "n_pass": n_pass,
    "n_fail": len(verdicts) - n_pass,
    "fails": {k: v["detail"] for k, v in sorted(verdicts.items())
              if v["status"] == "FAIL"},
    "queries": dict(sorted(verdicts.items())),
}
json.dump(doc, open(out, "w"), indent=1)
print(f"{out}: {n_pass}/{len(verdicts)} PASS")
