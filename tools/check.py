#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify.scala
output (<out>/<name> parquet dirs + oracle_sql.json), runs each oracle in
DuckDB over the same sf dir, and compares row counts, sorted column names,
and sorted-value hashes. Usage: check.py <sfDir> <verifyOut> [--digest]

--digest: hash-only fast path for big sweeps (sf10+). Both sides are
digested INSIDE DuckDB — the oracle result directly, the Spark result by
scanning its parquet output — with an order-independent sum-of-row-hashes
over a canonical varchar rendering (sorted columns, NULL sentinel). This
skips the pandas materialization that costs ~25 min on a 105M-row gate.
A digest mismatch falls back to the exact pandas compare to adjudicate
(type-formatting differences, e.g. DECIMAL vs DOUBLE rendering, can fail
the digest while the values match), unless the row count exceeds
CHECK_FALLBACK_ROWS (default 5M), where it reports the digest mismatch."""
import sys, json, glob, os
import duckdb
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
flags = {a for a in sys.argv[1:] if a.startswith("--")}
sf, out = args[0], args[1]
digest_mode = "--digest" in flags
fallback_rows = int(os.environ.get("CHECK_FALLBACK_ROWS", "5000000"))

con = duckdb.connect()
# let big-sweep oracles spill instead of dying on a bad allocation; the
# limit leaves headroom for the OS page cache holding the parquet trees
con.sql("SET temp_directory='/tmp/duckdb_spill'")
con.sql(f"SET memory_limit='{os.environ.get('CHECK_MEM', '48GB')}'")
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver trees ship one file per table; GenData trees (target/sf1,
    # target/sf10) are Spark parquet DIRECTORIES of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")


def digest(rel_sql):
    """(row_count, (sum-hash, xor-hash), sorted cols) of a relation.

    Order-independent combine of per-row hashes. Two hardening choices
    (vs the naive sum-of-hash over '|'-joined varchars): the column
    separator is the non-printable chr(2), so a data value containing the
    separator can't shift column boundaries into a colliding rendering;
    and TWO independently-salted row hashes are combined with different
    operators (SUM and BIT_XOR) — compensating row differences would have
    to cancel simultaneously in an additive group and in GF(2) under an
    unrelated hash, shrinking the collision surface from 2^-64-ish-per-
    structured-pattern to negligible."""
    cols = con.sql(f"SELECT * FROM ({rel_sql}) LIMIT 0").columns
    scols = sorted(cols)
    # chr(1) NULL sentinel: concat with NULL would null the whole row
    expr = " || chr(2) || ".join(
        f"coalesce(cast(\"{c}\" as varchar), chr(1))" for c in scols)
    q = (f"SELECT count(*), "
         f"coalesce(sum(cast(hash({expr}) as hugeint)), 0), "
         f"coalesce(bit_xor(hash(chr(3) || ({expr}))), 0) "
         f"FROM ({rel_sql})")
    n, hs, hx = con.sql(q).fetchone()
    return n, (hs, hx), scols


def pandas_compare(name, sql, files):
    """Exact compare (the original path). Returns None if OK, else msg."""
    exp = con.sql(sql).df()
    got = pd.concat([pd.read_parquet(f) for f in files])
    g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
    if g_cols != e_cols:
        return f"cols {g_cols} vs {e_cols}"
    g = got[g_cols].sort_values(g_cols).reset_index(drop=True)
    e = exp[e_cols].sort_values(e_cols).reset_index(drop=True)
    if len(g) != len(e):
        return f"rows {len(g)} vs {len(e)}"
    # normalize dtypes: compare as strings after round-tripping
    for c in g_cols:
        gv, ev = g[c].astype(str).tolist(), e[c].astype(str).tolist()
        if gv != ev:
            bad = next(i for i in range(len(gv)) if gv[i] != ev[i])
            return f"col {c} row {bad}: spark={gv[bad]!r} oracle={ev[bad]!r}"
    return None


oracle = json.load(open(f"{out}/oracle_sql.json"))
# CHECK_ONLY=a,b,c restricts the run (big-sweep drivers run one process
# per gate so a pathological oracle can be timed out + excluded without
# losing the rest, and DuckDB's memory is released between gates)
only = os.environ.get("CHECK_ONLY")
if only:
    keep = set(only.split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}
ok = fail = 0
results = {}
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        results[name] = "no spark output"
        continue
    try:
        if digest_mode:
            spark_rel = f"SELECT * FROM read_parquet({files!r})"
            en, eh, ecols = digest(sql)
            gn, gh, gcols = digest(spark_rel)
            if gcols != ecols:
                msg = f"cols {gcols} vs {ecols}"
            elif gn != en:
                msg = f"rows {gn} vs {en}"
            elif gh != eh:
                msg = f"digest mismatch over {gn} rows"
            else:
                msg = None
            if msg and gn == en and gn <= fallback_rows:
                # adjudicate: formatting-only differences pass here
                msg = pandas_compare(name, sql, files)
                if msg is None:
                    print(f"OK   {name} ({gn} rows, via pandas fallback)")
                    ok += 1
                    results[name] = "ok-fallback"
                    continue
            if msg:
                print(f"FAIL {name}: {msg}")
                fail += 1
                results[name] = msg
            else:
                print(f"OK   {name} ({gn} rows, digest)")
                ok += 1
                results[name] = "ok"
        else:
            msg = pandas_compare(name, sql, files)
            if msg:
                print(f"FAIL {name}: {msg}")
                fail += 1
                results[name] = msg
            else:
                n = sum(len(pd.read_parquet(f, columns=[])) for f in files)
                print(f"OK   {name} ({n} rows)")
                ok += 1
                results[name] = "ok"
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        results[name] = f"error: {e}"
        continue
print(f"\n{ok} ok, {fail} fail of {len(oracle)}")
outjson = os.environ.get("CHECK_OUT_JSON")
if outjson:
    with open(outjson, "w") as f:
        json.dump({"sf": sf, "out": out, "mode":
                   "digest" if digest_mode else "pandas",
                   "ok": ok, "fail": fail, "results": results}, f, indent=1)
sys.exit(1 if fail else 0)
