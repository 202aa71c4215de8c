#!/usr/bin/env python3
"""Staged oracle compare for queries whose single-statement DuckDB twin
exceeds the sandbox's memory+spill at big SFs (sf>=1: the MinHash/LSH
replay oracles materialize multiple corpus x 32-seed HUGEINT stages in
one pipeline; some operators — string_agg hash aggregates, recursive
CTEs — cannot spill).

Semantics are unchanged: the oracle's top-level CTE chain is parsed
(paren matching on the machine-generated 'name AS (' layout) and each
CTE is materialized into a TEMP TABLE in declaration order, so peak
memory is ONE stage; the final SELECT then runs against the staged
tables. Hash-compare identical to selfverify.py.

Usage: python3 scripts/verify_staged.py <query> [sfdir] [outdir]
"""
import json, sys, glob, hashlib, os, re
import duckdb
import pandas as pd

qname = sys.argv[1]
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_verify_sf1"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '40GB')}'")
tmp = os.environ.get("GRAFT_DUCKDB_TEMP", "/tmp/duck_staged")
os.makedirs(tmp, exist_ok=True)
con.execute(f"SET temp_directory='{tmp}'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

sql = json.load(open(f"{outdir}/oracle_sql.json"))[qname].strip()

def split_ctes(sql):
    """Top-level (name, column_list_or_None, body) CTEs + final SELECT."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sql, re.I)
    assert m, "oracle is not a WITH query"
    i = m.end()
    ctes = []
    while True:
        m = re.match(r"\s*([A-Za-z_]\w*)\s*(\([^)]*\))?\s+AS\s+"
                     r"(?:(?:NOT\s+)?MATERIALIZED\s+)?\(", sql[i:])
        if not m:
            break
        name, cols = m.group(1), m.group(2)
        j = i + m.end()  # position just past the opening paren
        depth, k, in_str = 1, j, False
        while depth:
            c = sql[k]
            if in_str:
                in_str = c != "'"
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        ctes.append((name, cols, sql[j:k - 1]))
        i = k
        m2 = re.match(r"\s*,", sql[i:])
        if not m2:
            break
        i += m2.end()
    return ctes, sql[i:]

WALK_PATTERN = re.compile(
    r"SELECT src, src FROM edges\s+UNION\s+"
    r"SELECT e\.src, w\.comp FROM edges e JOIN walk w ON w\.id = e\.dst")

def union_find_walk():
    """The `walk` reachability fixpoint (every (id, label) with label
    reachable from id) exists only to feed MIN(comp) GROUP BY id — i.e.
    connected components with min-id labels. The SQL fixpoint is
    O(V*E); on the DENSE graphs a big-SF cohort builds (64 distinct
    part names under a lev<=10 bound => near-complete) that is
    quadrillions of rows. Union-find over the staged `edges` table
    computes the identical (id, min-label) rows directly — exact, not
    approximate — and MIN over them is the identity."""
    parent = {}
    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r
    for src, dst in con.execute("SELECT src, dst FROM edges").fetchall():
        for v in (src, dst):
            if v not in parent:
                parent[v] = v
        a, b = find(src), find(dst)
        if a != b:
            # min-id root: the label HashMin/the walk's MIN would pick
            if a < b:
                parent[b] = a
            else:
                parent[a] = b
    rows = [(v, find(v)) for v in parent]
    df = pd.DataFrame(rows, columns=["id", "comp"])
    con.register("_walk_uf", df)
    con.execute("CREATE TEMP TABLE walk AS SELECT * FROM _walk_uf")

ctes, final = split_ctes(sql)
for name, cols, body in ctes:
    if name == "walk" and WALK_PATTERN.search(body):
        union_find_walk()
    elif re.search(rf"\b{name}\b", body):
        # recursive CTE: keep the fixpoint inside one statement
        con.execute(f"CREATE TEMP TABLE {name} AS "
                    f"(WITH RECURSIVE {name}{cols or ''} AS ({body}) "
                    f"SELECT * FROM {name})")
    elif cols:
        # explicit CTE column list (e.g. `pw(bit, p) AS (VALUES ...)`):
        # CREATE TABLE AS has no column-list form, so alias through a
        # subquery to preserve the names
        con.execute(f"CREATE TEMP TABLE {name} AS "
                    f"(SELECT * FROM ({body}) AS {name}{cols})")
    else:
        con.execute(f"CREATE TEMP TABLE {name} AS ({body})")
    n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
    print(f"staged {name}: {n} rows", flush=True)
duck_df = con.execute(final).fetchdf()

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def cell(v):
    return repr(v) if isinstance(v, float) else str(v)

def frame_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

files = glob.glob(f"{outdir}/{qname}/*.parquet")
spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
duck_df = canon(duck_df)
ok = (list(spark_df.columns) == list(duck_df.columns)
      and len(spark_df) == len(duck_df)
      and frame_hash(spark_df) == frame_hash(duck_df))
print(("PASS" if ok else "FAIL") + f" {qname} ({len(spark_df)} rows, staged oracle)")
if not ok:
    print("spark cols:", list(spark_df.columns), len(spark_df))
    print("duck  cols:", list(duck_df.columns), len(duck_df))
    print("spark:", spark_df.head().to_string())
    print("duck :", duck_df.head().to_string())
sys.exit(0 if ok else 1)
