#!/usr/bin/env python3
"""Bench regression tripwire.

Compares a bench run's per-query times against the committed snapshot
(scripts/bench_baseline_r16.json — all 172 queries) and fails when any query regresses
more than THRESHOLD x, or the total does. Guards against the r3-style
silent inflation (cached-relation leaks, accidental plan changes)
shipping unnoticed.

Both sides of the comparison are MEDIANS of 3 scrub-isolated samples
(the r7 scheme — see the baseline's provenance note): Bench's stdout
"queries" map is per-query medians, and the baseline was built from
the same field, so the ~1.5-2x cold/warm JIT gap and ambient
machine-state jitter cancel instead of masquerading as regressions.

Usage:
  # run the bench at sf0.1 and compare (the default):
  python3 scripts/bench_regression.py --run
  # or compare an existing bench JSON line / driver BENCH_r*.json:
  python3 scripts/bench_regression.py bench_output.json

New queries (not in the snapshot) are reported informationally and do
not fail. Queries under MIN_SECS in the baseline are compared against
an absolute floor instead of the ratio (sub-300ms timings are mostly
job-scheduling jitter at local[32]).
"""
import json, os, re, subprocess, sys

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE = os.path.join(HERE, "bench_baseline_r16.json")
THRESHOLD = 1.5      # fail when query_time > THRESHOLD * baseline
ISO_THRESHOLD = 1.2  # post-suite re-runs are JIT-warm (~0.6x clean), so
                     # 1.2x of the COLD first run ~= 2x the warm-true time
MIN_SECS = 0.3       # ratio only meaningful above scheduling jitter
ABS_SLACK = 0.45     # small queries fail only past baseline + ABS_SLACK


def load_bench(path):
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data:                      # driver BENCH_r*.json shape
        if not data["parsed"]:
            print(f"FATAL: {path} has parsed=null — the bench run was "
                  "not parseable; that is itself a regression")
            sys.exit(2)
        data = data["parsed"]
    return data


def run_bench(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(HERE)).stdout
    m = None
    for line in out.splitlines():
        mm = re.search(r'\{"metric".*\}', line)
        if mm:
            m = mm.group(0)
    if not m:
        print("FATAL: no bench JSON line in sbt output")
        sys.exit(2)
    return json.loads(m)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--run" in sys.argv or not args:
        bench = run_bench(os.environ.get("SPARK_GRAFT_SF_DIR",
                                         "/root/testdata/sf0.1"))
    else:
        bench = load_bench(args[0])
    base = json.load(open(BASELINE))
    bq, cq = base["queries"], bench.get("queries", {})

    failures, new = [], []
    for q, t in sorted(cq.items()):
        if t < 0:
            # Bench records a CRASHED query as -1.0 so it can't read as a
            # fast success — neither may the tripwire
            failures.append(f"  FAILED {q}: bench recorded {t} (query crashed)")
            continue
        if q not in bq:
            new.append(f"  new  {q}: {t:.3f}s (no baseline)")
            continue
        b = bq[q]
        if b >= MIN_SECS:
            if t > THRESHOLD * b:
                failures.append(f"  REGRESSED {q}: {t:.3f}s vs baseline {b:.3f}s "
                                f"({t / b:.2f}x > {THRESHOLD}x)")
        elif t > b + ABS_SLACK and t > THRESHOLD * b:
            failures.append(f"  REGRESSED {q}: {t:.3f}s vs baseline {b:.3f}s "
                            f"(small-query floor {b + ABS_SLACK:.3f}s)")
    # a baseline query absent from the run is a failure, not a footnote:
    # vanishing queries (dropped from SparkEntry, truncated JSON) are the
    # r2/r3 silent-shrinkage mode this script exists to catch
    missing = sorted(set(bq) - set(cq))
    for q in missing:
        failures.append(f"  MISSING {q}: in baseline but absent from this run")

    total, btotal = bench.get("value"), base["total"]
    total_bad = total is not None and total > THRESHOLD * btotal
    print(f"total: {total}s vs baseline {btotal}s"
          + (" REGRESSED" if total_bad else " ok"))
    # Bench's own isolation tripwire: it re-runs the first substantial
    # queries after the full suite and reports the worst re-run/first-run
    # ratio (99.0 if a re-run crashed). Re-runs are JIT-warm — clean runs
    # measure ~0.6x — so the bound is ISO_THRESHOLD (~2x the warm-true
    # time), tighter than the cold 1.5x bar; above it, cross-query
    # residue survived the per-query scrub — the r05 contamination mode.
    iso = bench.get("iso")
    if iso is not None:
        iso_bad = iso > ISO_THRESHOLD
        print(f"isolation re-run ratio: {iso:.3f}"
              + (" RESIDUE DETECTED" if iso_bad else " ok"))
        if iso_bad:
            failures.append(f"  ISOLATION: post-suite re-run {iso:.2f}x slower "
                            f"than first run (> {ISO_THRESHOLD}x) — residue leak"
                            + (" (a re-run CRASHED)" if iso >= 99.0 else ""))
    for line in new:
        print(line)
    if failures or total_bad:
        print(f"\n{len(failures)} per-query failure(s):")
        for f in failures:
            print(f)
        sys.exit(1)
    print(f"no regressions > {THRESHOLD}x across {len(cq)} queries")


if __name__ == "__main__":
    main()
