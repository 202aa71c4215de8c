#!/usr/bin/env python3
"""Full-suite sf1 oracle sweep: every declared query, hash-exact.

Routes each query to the right compare:
  - WITH-chain oracles -> verify_staged.py (CTE-by-CTE temp tables;
    the only formulation whose peak memory is one stage at sf>=1)
  - plain oracles      -> selfverify.py with the query name as prefix

Runs a small process pool (DuckDB processes are independent); each
worker gets its own spill dir and a bounded memory_limit derived from
host RAM / jobs (capped at 20GB) so N workers never exceed the host;
override with GRAFT_DUCKDB_MEM.

Usage: python3 scripts/sf1_full_sweep.py [sfdir] [outdir] [jobs]
Then:  python3 scripts/collect_sf1_evidence.py scripts/sf1_sweep_rN.json <log>
"""
import json, os, subprocess, sys, time
from concurrent.futures import ThreadPoolExecutor

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_sf1"
jobs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
here = os.path.dirname(os.path.abspath(__file__))

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(oracle)

def default_mem_gb():
    # host RAM / jobs, 2GB floor, 20GB cap — the pool's aggregate limit
    # stays within the host instead of assuming 20GB*jobs fits
    try:
        with open("/proc/meminfo") as f:
            kb = int(next(l for l in f if l.startswith("MemTotal")).split()[1])
        return max(2, min(20, kb // 1024 // 1024 // max(1, jobs)))
    except (OSError, StopIteration, ValueError):
        return 20

mem = os.environ.get("GRAFT_DUCKDB_MEM", f"{default_mem_gb()}GB")

def run(q):
    heavy = oracle[q].lstrip().upper().startswith("WITH")
    cmd = ([sys.executable, f"{here}/verify_staged.py", q, sfdir, outdir]
           if heavy else
           [sys.executable, f"{here}/selfverify.py", sfdir, outdir, q])
    env = dict(os.environ,
               GRAFT_DUCKDB_MEM=mem,
               GRAFT_DUCKDB_TEMP=f"/tmp/duck_sweep_{q}")
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd="/tmp")
    dt = time.time() - t0
    verdict = [l for l in p.stdout.splitlines()
               if l.startswith(("PASS", "FAIL"))]
    line = verdict[-1] if verdict else \
        f"FAIL {q}: no verdict (rc={p.returncode}; {p.stderr.strip()[-300:]})"
    print(f"{line}  [{dt:.0f}s {'staged' if heavy else 'plain'}]",
          flush=True)
    return line

with ThreadPoolExecutor(jobs) as ex:
    results = list(ex.map(run, names))
n_fail = sum(1 for r in results if r.startswith("FAIL"))
print(f"\n{len(results) - n_fail} passed, {n_fail} failed of {len(results)}")
sys.exit(1 if n_fail else 0)
