#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each dumped query
result under OUT_DIR, run the matching oracle SQL in DuckDB over the same
parquet tables and compare (rows, schema, values).

Usage: python3 scripts/check.py [sf_dir] [out_dir]
"""
import json, math, sys, glob

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# record the oracle engine version: hash mismatches have twice been
# comparator-environment artifacts (round-5 mm_vad/doc_vocab_growth),
# and the first triage question is "which DuckDB ran the oracle"
print(f"oracle: duckdb {duckdb.__version__}")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    # EXACT compare, mirroring the driver's hash: floats keep their full
    # bit pattern (hex) and stay distinct from ints — 78 != 78.0. The old
    # 9-decimal rounding masked the round-5/6 dtype reds (DuckDB HUGEINT
    # sums → pandas float64 vs Spark int64); GateNorm now guarantees both
    # sides emit int64 for every numeric column, so exact compare is the
    # honest local gate.
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v.hex()
    return v

fail = ok = 0
for name in sorted(oracles):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result")
        fail += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetch_df()
        want = con.execute(oracles[name]).fetch_df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fail += 1
        continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        print(f"FAIL {name}: schema {gcols} vs {wcols}")
        fail += 1
        continue
    g = got[gcols].values.tolist()
    w = want[wcols].values.tolist()
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        fail += 1
        continue
    g = sorted((tuple(norm(c) for c in r) for r in g), key=repr)
    w = sorted((tuple(norm(c) for c in r) for r in w), key=repr)
    bad = [(a, b) for a, b in zip(g, w) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first: {bad[0][0]} vs {bad[0][1]}")
        fail += 1
    else:
        print(f"ok   {name} ({len(g)} rows)")
        ok += 1

# rows-only entries (no oracle)
for d in sorted(glob.glob(f"{OUT}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name not in oracles:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        print(f"rows {name}: {n} (no oracle)")

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
