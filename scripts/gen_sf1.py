#!/usr/bin/env python3
"""Deterministic sf=1.0 synthetic dataset generator (seed=420).

The driver ships sf{0.001,0.01,0.1}; the judge asked for a hash-exact
oracle sweep at sf1 (~6M lineitems) to shake out caps/offsets/decimal
bugs that only appear crossing another 10x. This generator mirrors the
driver tables' schemas and value domains (profiled from sf0.1 — see
schema dump in scripts/gen_sf1_profile.md) at 10x sf0.1 volumes. The
sweep compares Spark vs DuckDB on the SAME files, so distribution
fidelity only needs to be domain-level (key ranges, enum sets, date
windows), not bit-level.

Usage: python3 scripts/gen_sf1.py [outdir=/tmp/graft_sf1]
"""
import os, sys, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
os.makedirs(out, exist_ok=True)
rng = np.random.default_rng(420)

N_CUST, N_SUPP, N_PART, N_ORD, N_EVT = 150_000, 10_000, 200_000, 1_500_000, 1_000_000
N_DOC, N_EMB = 50_000, 20_000

def write(name, cols, schema):
    t = pa.table(cols, schema=schema)
    pq.write_table(t, f"{out}/{name}.parquet")
    print(f"{name}: {t.num_rows} rows")

# region / nation — fixed dimension content, same as every driver SF
write("region",
      {"r_regionkey": pa.array(range(5), pa.int32()),
       "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]},
      pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
write("nation",
      {"n_nationkey": pa.array(range(25), pa.int32()),
       "n_name": [f"NATION_{i}" for i in range(25)],
       "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())},
      pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                 ("n_regionkey", pa.int32())]))

segments = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
write("customer",
      {"c_custkey": pa.array(range(N_CUST), pa.int64()),
       "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
       "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
       "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
       "c_mktsegment": segments[rng.integers(0, 5, N_CUST)]},
      pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                 ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                 ("c_mktsegment", pa.string())]))

write("supplier",
      {"s_suppkey": pa.array(range(N_SUPP), pa.int64()),
       "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
       "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
       "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)},
      pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                 ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

adjs = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
ptypes = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"])
pk = np.arange(N_PART)
write("part",
      {"p_partkey": pa.array(pk, pa.int64()),
       "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in
                  zip(rng.integers(0, 8, N_PART), rng.integers(0, 8, N_PART))],
       "p_brand": [f"Brand#{b}" for b in rng.integers(0, 25, N_PART)],
       "p_type": ptypes[rng.integers(0, 6, N_PART)],
       "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
       "p_retailprice": np.round(900.0 + 0.1 * (pk % 1000), 1)},
      pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                 ("p_brand", pa.string()), ("p_type", pa.string()),
                 ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

day_us = 86_400_000_000
epoch95 = np.datetime64("1995-01-01", "us").astype(np.int64)
statuses = np.array(["F", "O", "P"])
prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
odate_days = rng.integers(0, 2404, N_ORD)
write("orders",
      {"o_orderkey": pa.array(range(N_ORD), pa.int64()),
       "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
       "o_orderstatus": statuses[rng.integers(0, 3, N_ORD)],
       "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
       "o_orderdate": pa.array(epoch95 + odate_days * day_us, pa.timestamp("us")),
       "o_orderpriority": prios[rng.integers(0, 5, N_ORD)]},
      pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                 ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                 ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())]))

# lineitem: per-order 1..7 lines (avg 4 = 6M total at 1.5M orders);
# shipdate = its order's orderdate + 1..95 days
nlines = rng.integers(1, 8, N_ORD)
lok = np.repeat(np.arange(N_ORD), nlines)
NL = len(lok)
lln = np.concatenate([np.arange(1, n + 1) for n in nlines])
ship = epoch95 + (odate_days[lok] + rng.integers(1, 96, NL)) * day_us
rflags = np.array(["A", "N", "R"])
lstat = np.array(["F", "O"])
write("lineitem",
      {"l_orderkey": pa.array(lok, pa.int64()),
       "l_partkey": pa.array(rng.integers(0, N_PART, NL), pa.int64()),
       "l_suppkey": pa.array(rng.integers(0, N_SUPP, NL), pa.int64()),
       "l_linenumber": pa.array(lln, pa.int32()),
       "l_quantity": rng.integers(1, 51, NL).astype(np.float64),
       "l_extendedprice": np.round(rng.uniform(900, 105000, NL), 2),
       "l_discount": np.round(rng.integers(0, 11, NL) * 0.01, 2),
       "l_tax": np.round(rng.integers(0, 9, NL) * 0.01, 2),
       "l_returnflag": rflags[rng.integers(0, 3, NL)],
       "l_linestatus": lstat[rng.integers(0, 2, NL)],
       "l_shipdate": pa.array(ship, pa.timestamp("us"))},
      pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                 ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                 ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                 ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                 ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                 ("l_shipdate", pa.timestamp("us"))]))

# events: N over the same fixed 30-day window (driver keeps the window and
# raises density with sf); user_id domain = customers/10
epoch24 = np.datetime64("2024-01-01", "us").astype(np.int64)
ets = epoch24 + np.sort(rng.uniform(0, 30 * 86400, N_EVT)) * 1_000_000
etypes = np.array(["click", "error", "purchase", "signup", "view"])
write("events",
      {"event_id": pa.array(range(N_EVT), pa.int64()),
       "ts": pa.array(ets.astype(np.int64), pa.timestamp("us")),
       "user_id": pa.array(rng.integers(0, N_CUST // 10, N_EVT), pa.int64()),
       "event_type": etypes[rng.integers(0, 5, N_EVT)],
       "value": np.round(rng.exponential(50.0, N_EVT), 2),
       "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, N_EVT)]},
      pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                 ("user_id", pa.int64()), ("event_type", pa.string()),
                 ("value", pa.float64()), ("props", pa.string())]))

# documents: 32-word vocab (same as driver), 44..577 chars, ~1.5%
# near-dups + ~0.2% exact dups — driver-faithful density (sf0.1 has
# 8 dups in 5000). Near-dups mutate ORIGINAL docs only (no chains):
# chained mutations build pathologically deep pair graphs whose
# ground-truth oracle replays (all-pairs / recursive-CTE forms) are
# deliberately quadratic and blow the sandbox at sf1. Depth robustness
# is pinned separately by the connected-components fixture specs.
vocab = np.array(["a", "agg", "batch", "big", "column", "customer", "data",
                  "dup", "fast", "filter", "group", "hash", "join", "key",
                  "line", "merge", "order", "part", "query", "row", "scan",
                  "slow", "small", "sort", "spark", "stream", "table", "the",
                  "value", "vector", "window"])
langs = np.array(["de", "en", "es", "fr", "zh"])
lang_p = np.array([0.15, 0.41, 0.15, 0.14, 0.15])
texts = []
originals = []
for i in range(N_DOC):
    r = rng.random()
    if i > 100 and r < 0.002:
        texts.append(texts[rng.integers(0, i)])
        continue
    if i > 100 and r < 0.015:
        base = texts[originals[rng.integers(0, len(originals))]].split(" ")
        for _ in range(int(rng.integers(1, 4))):
            base[int(rng.integers(0, len(base)))] = str(vocab[rng.integers(0, len(vocab))])
        texts.append(" ".join(base))
        continue
    nw = int(rng.integers(10, 110))
    texts.append(" ".join(vocab[rng.integers(0, len(vocab), nw)]))
    originals.append(i)
write("documents",
      {"doc_id": pa.array(range(N_DOC), pa.int64()),
       "text": texts,
       "lang": langs[rng.choice(5, N_DOC, p=lang_p)],
       "source": [f"src{s}" for s in rng.integers(0, 20, N_DOC)],
       "n_chars": pa.array([len(t) for t in texts], pa.int64())},
      pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                 ("lang", pa.string()), ("source", pa.string()),
                 ("n_chars", pa.int64())]))

# embeddings: 64-dim unit vectors in 10 label clusters (center + noise,
# renormalized) — same shape/domain as the driver's (components within ~±0.6)
centers = rng.standard_normal((10, 64))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
lab = rng.integers(0, 10, N_EMB)
vecs = centers[lab] * 0.8 + rng.standard_normal((N_EMB, 64)) * 0.25
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
write("embeddings",
      {"vec_id": pa.array(range(N_EMB), pa.int64()),
       "embedding": pa.array([v for v in vecs.astype(np.float32)],
                             pa.list_(pa.float32())),
       "label": pa.array(lab, pa.int32())},
      pa.schema([("vec_id", pa.int64()),
                 ("embedding", pa.list_(pa.float32())),
                 ("label", pa.int32())]))
print("done:", out)
