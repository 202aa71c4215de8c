#!/usr/bin/env python3
"""Round-16 baseline addendum: carry the r15 consolidated medians,
gate the three queries added this round (q13, m7, c18) at their first
full-suite medians, and RE-GATE c16 + s26 (their code changed this
round: trainBytesLocal's auto sample modulus adds one column-pruned
byte-count aggregate on the default path) — the standing rules from
the r14/r15 consolidation notes. Deliberately NOT re-gated: c17/q11/
q12/c15 (the lpRowsKnPerLang/foldKnPerLang extraction is pure
factoring — identical plans), m6 (the width-64 mask guard is a Scala
constant that compiles to the same value at every used width), q8/q9/
c13/q10 (comment-only edits).

Usage: make_baseline_r16.py <r16_full_detail.json>
(the detail file is /tmp/graft_bench_detail.json saved from a full
`graft.Bench` run at sf0.1 that includes the new queries)
"""
import json, os, sys

HERE = os.path.dirname(os.path.abspath(__file__))
REGATED = ["c16", "s26"]  # code changed this round (Bpe auto-sample pass)


def medians(detail):
    return {q.split("_")[0]: v["median"] for q, v in detail["queries"].items()}


def main():
    run = json.load(open(sys.argv[1]))
    old = json.load(open(os.path.join(HERE, "bench_baseline_r15.json")))
    rm = medians(run)
    new_queries = sorted(set(rm) - set(old["queries"]))
    queries = dict(old["queries"])
    for q in new_queries + REGATED:
        queries[q] = rm[q]
    out = {
        "cpus": old["cpus"],
        "scheme": old["scheme"],
        "note": (
            "PROVENANCE (r16 addendum, 2026-08-16): r15 consolidated "
            "medians carried verbatim; the "
            f"{len(new_queries)} queries added in round 16 "
            f"({', '.join(new_queries)}) gate at their FIRST full-suite "
            f"medians from the round-16 run (total {run['total']}s, cold "
            f"{run['cold_total']}s, iso {run['iso']}); c16 and s26 "
            "RE-GATED at the same run's medians (their code changed: "
            "trainBytesLocal's bounded driver collect adds one byte-count "
            "aggregate on the auto path). Window context recorded via iso. "
            "Prior provenance preserved below."),
        "superseded": old["note"],
        "total": old["total"] + sum(rm[q] for q in new_queries)
                 + sum(rm[q] - old["queries"][q] for q in REGATED),
        "queries": queries,
        "sibling": {
            "total": run["total"],
            "iso": run["iso"],
            "queries": rm,
        },
    }
    path = os.path.join(HERE, "bench_baseline_r16.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(queries)} queries, total {out['total']:.2f}s "
          f"({len(new_queries)} new: {new_queries}; re-gated: {REGATED})")


if __name__ == "__main__":
    main()
