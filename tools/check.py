#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify.scala
output (<out>/<name> parquet dirs + oracle_sql.json), runs each oracle in
DuckDB over the same sf dir, and compares row counts, sorted column names,
and sorted-value hashes. Usage: check.py <sfDir> <verifyOut>"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver trees ship one file per table; GenData trees (target/sf1,
    # target/sf10) are Spark parquet DIRECTORIES of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
    if g_cols != e_cols:
        print(f"FAIL {name}: cols {g_cols} vs {e_cols}")
        fail += 1
        continue
    g = got[g_cols].sort_values(g_cols).reset_index(drop=True)
    e = exp[e_cols].sort_values(e_cols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
        fail += 1
        continue
    # normalize dtypes: compare as strings after round-tripping
    mismatch = None
    for c in g_cols:
        gv, ev = g[c].astype(str).tolist(), e[c].astype(str).tolist()
        if gv != ev:
            bad = next(i for i in range(len(gv)) if gv[i] != ev[i])
            mismatch = f"col {c} row {bad}: spark={gv[bad]!r} oracle={ev[bad]!r}"
            break
    if mismatch:
        print(f"FAIL {name}: {mismatch}")
        fail += 1
    else:
        print(f"OK   {name} ({len(g)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail of {len(oracle)}")
sys.exit(1 if fail else 0)
