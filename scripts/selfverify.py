#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/selfverify.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` was already run (or
runs it when --run is passed). For each query parquet in outdir, runs the
matching oracle_sql.json entry in DuckDB over the sfdir parquet tables,
sorts columns by name, sorts rows, and compares values exactly.
"""
import json, sys, glob, os, hashlib
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
# At sf>=1 some ground-truth oracle replays (deliberately quadratic
# all-pairs forms) need spill room: honor optional resource caps so the
# compare degrades to disk instead of dying on a full /tmp.
if os.environ.get("GRAFT_DUCKDB_MEM"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
# default the spill dir OFF the repo cwd: DuckDB's default is ./.tmp,
# and a big-SF run from the repo root once left a 60 GB .tmp/ that a
# later `git add -A` spent CPU-minutes hashing
_tmp = os.environ.get("GRAFT_DUCKDB_TEMP", "/tmp/duck_selfverify")
os.makedirs(_tmp, exist_ok=True)
con.execute(f"SET temp_directory='{_tmp}'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cell(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def frame_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

n_pass = n_fail = 0
prefixes = sys.argv[3:]  # optional: only check queries with these name prefixes
for name in sorted(oracle):
    if prefixes and not any(name.startswith(p) for p in prefixes):
        continue
    pq_dir = f"{outdir}/{name}"
    files = glob.glob(f"{pq_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        duck_df = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        n_fail += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
        n_fail += 1; continue
    hs, hd = frame_hash(spark_df), frame_hash(duck_df)
    if hs != hd:
        print(f"FAIL {name}: hash mismatch")
        # show first differing row
        for i in range(len(spark_df)):
            rs = [cell(v) for v in spark_df.iloc[i]]
            rd = [cell(v) for v in duck_df.iloc[i]]
            if rs != rd:
                print(f"  row {i}: spark={rs}")
                print(f"  row {i}:  duck={rd}")
                break
        n_fail += 1
    else:
        print(f"PASS {name} ({len(spark_df)} rows)")
        n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed of {len(oracle)}")
sys.exit(1 if n_fail else 0)
