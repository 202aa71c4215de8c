#!/usr/bin/env python3
"""Round-15 baseline addendum: carry the r14 consolidated medians,
gate the seven queries added this round (q11, q12, m6, c14, c15, c16,
s26) at their first full-suite medians, and RE-GATE q10 (its code
changed this round: the stupid-backoff alpha penalty) — the standing
rules from the r14 consolidation note.

Usage: make_baseline_r15.py <r15_full_detail.json>
(the detail file is /tmp/graft_bench_detail.json saved from a full
`graft.Bench` run at sf0.1 that includes the new queries)
"""
import json, os, sys

HERE = os.path.dirname(os.path.abspath(__file__))
REGATED = ["q10"]  # code changed this round


def medians(detail):
    return {q.split("_")[0]: v["median"] for q, v in detail["queries"].items()}


def main():
    run = json.load(open(sys.argv[1]))
    old = json.load(open(os.path.join(HERE, "bench_baseline_r14.json")))
    rm = medians(run)
    new_queries = sorted(set(rm) - set(old["queries"]))
    queries = dict(old["queries"])
    for q in new_queries + REGATED:
        queries[q] = rm[q]
    out = {
        "cpus": old["cpus"],
        "scheme": old["scheme"],
        "note": (
            "PROVENANCE (r15 addendum, 2026-08-16): r14 consolidated "
            "medians carried verbatim; the "
            f"{len(new_queries)} queries added in round 15 "
            f"({', '.join(new_queries)}) gate at their FIRST full-suite "
            f"medians from the round-15 run (total {run['total']}s, cold "
            f"{run['cold_total']}s, iso {run['iso']}); q10 RE-GATED at the "
            "same run's median (its code changed: the stupid-backoff "
            "alpha=0.4 penalty). Window context recorded via iso — the "
            "r14 calm-window iso reference is ~0.54; gates taken in a "
            "hotter window are conservative (high) by construction. "
            "Prior provenance preserved below."),
        "superseded": old["note"],
        "total": old["total"] + sum(rm[q] for q in new_queries)
                 - old["queries"]["q10"] + rm["q10"],
        "queries": queries,
        "sibling": {
            "total": run["total"],
            "iso": run["iso"],
            "queries": rm,
        },
    }
    path = os.path.join(HERE, "bench_baseline_r15.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(queries)} queries, total {out['total']:.2f}s "
          f"({len(new_queries)} new: {new_queries}; re-gated: {REGATED})")


if __name__ == "__main__":
    main()
