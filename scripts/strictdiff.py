#!/usr/bin/env python3
"""Exact cell-level diff between a Verify dump and its DuckDB oracle —
NO float rounding (mirrors the driver's exact-value hash). Prints every
differing cell with full repr, plus dtype info, to root-cause hash-only reds.

Usage: python3 scripts/strictdiff.py [sf_dir] [out_dir] [gate ...]
"""
import json, math, sys, glob

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
print(f"oracle: duckdb {duckdb.__version__}")
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v.hex()  # exact bit pattern
    return v

fail = ok = 0
for name in sorted(oracles):
    if ONLY and name not in ONLY:
        continue
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result"); fail += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetch_df()
    want = con.execute(oracles[name]).fetch_df()
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        print(f"FAIL {name}: schema {gcols} vs {wcols}"); fail += 1; continue
    gd = {c: str(got[c].dtype) for c in gcols}
    wd = {c: str(want[c].dtype) for c in wcols}
    if gd != wd:
        print(f"DTYPE {name}: spark={gd} oracle={wd}")
    g = sorted((tuple(norm(c) for c in r) for r in got[gcols].values.tolist()), key=repr)
    w = sorted((tuple(norm(c) for c in r) for r in want[wcols].values.tolist()), key=repr)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fail += 1; continue
    bad = [(a, b) for a, b in zip(g, w) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ (cols={gcols})")
        for a, b in bad[:8]:
            cells = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
            print(f"  spark={a}\n  orcle={b}\n  cells={cells}")
        fail += 1
    else:
        print(f"ok   {name} ({len(g)} rows, exact)"); ok += 1

print(f"\n{ok} ok, {fail} fail (exact compare)")
sys.exit(1 if fail else 0)
