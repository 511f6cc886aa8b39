#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and compare row count / column names / value hash.

Usage: python3 scripts/selfcheck.py [sfdir] [outdir]
(Verify must have been run first:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out")

Dev tooling only — not part of the shipped library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical string form per cell; floats to 9 sig digits
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, (list,)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    h = hashlib.md5()
    rows = []
    for row in df.itertuples(index=False):
        rows.append("|".join(cell(v) for v in row))
    rows.sort()  # row-order independent (we ORDER BY anyway; belt+braces)
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()

fails, passes, skips = [], 0, 0
for d in sorted(glob.glob(f"{OUT}/*")):
    name = os.path.basename(d)
    if not os.path.isdir(d):
        continue
    try:
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"spark output unreadable: {e}"))
        continue
    if name not in oracle:
        skips += 1
        print(f"  [rows-only] {name}: {len(got)} rows")
        continue
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"row count {len(got)} != {len(want)}"))
        continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        fails.append((name, f"columns {gc} != {wc}"))
        continue
    hg, hw = canon(got), canon(want)
    if hg != hw:
        # show first differing rows for debugging
        g2 = got.reindex(sorted(got.columns), axis=1)
        w2 = want.reindex(sorted(want.columns), axis=1)
        diff = ""
        for i in range(min(len(g2), 2000)):
            if str(list(g2.iloc[i])) != str(list(w2.iloc[i])):
                diff = f" first diff row {i}: got={list(g2.iloc[i])} want={list(w2.iloc[i])}"
                break
        fails.append((name, "hash mismatch" + diff))
        continue
    passes += 1
    print(f"  [ok] {name}: {len(got)} rows")

print(f"\n{passes} pass, {len(fails)} fail, {skips} rows-only")
for name, why in fails:
    print(f"  FAIL {name}: {why}")
sys.exit(1 if fails else 0)
