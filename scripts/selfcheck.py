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
import pyarrow.parquet as pq
import hashlib
from decimal import Decimal

SELFTEST = len(sys.argv) > 1 and sys.argv[1] == "--selftest"

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
if not SELFTEST:
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

def _is_decimal_col(s: pd.Series) -> bool:
    """True if the column holds decimal.Decimal objects (pyarrow surfaces
    parquet DECIMAL as object-dtype Decimals — exactly the driver's view).
    Decided by the FIRST non-null value wherever it sits: a bounded head()
    scan would let a decimal column with a long null prefix (e.g. a LAG
    output) evade the gate and fail later as an opaque hash mismatch. An
    all-null column is not flagged (both engines canonicalize to NULL)."""
    if s.dtype.kind != "O":
        return False
    nn = s.dropna()
    return len(nn) > 0 and isinstance(nn.iloc[0], Decimal)

def gate_compat(name, got: pd.DataFrame, want: pd.DataFrame):
    """Replicate the three driver-gate strictness axes our %.9g canon masks
    (found in round-6/7 judging — see VERDICT r6 #4, r7 'What's wrong' #1-2):
      (a) dtype drift: a bare SUM(BIGINT) in an oracle promotes to HUGEINT,
          which pandas reads as float64 while Spark emits int64; the
          driver's canon renders 432.0 vs 432 -> hash mismatch even with
          identical values. Fail on any int-vs-float column-kind mismatch.
      (b) sortability: the driver sorts with pandas sort_values over ALL
          columns; array-typed cells (numpy.ndarray) are unhashable and
          throw. Dry-run the same sort on both frames.
      (c) decimal outputs: the driver reads Spark parquet via pyarrow, so a
          DECIMAL column surfaces as Decimal("25.50") while DuckDB's pandas
          bridge renders float64 25.5 on the oracle side — same value,
          different canon string, hash mismatch (the round-7 q_complex_types
          red). Fail on ANY Decimal-object column in the Spark output: the
          repo discipline is to cast to DOUBLE in the outermost SELECT on
          both engines.
    Returns an error string or None."""
    for c in got.columns:
        if _is_decimal_col(got[c]):
            return (f"decimal output column '{c}' in spark result (driver "
                    "reads Decimal objects, oracle side is float64 — cast "
                    "to DOUBLE in the outermost SELECT on both engines)")
    for c in got.columns:
        if c not in want.columns:
            continue
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if {gk, wk} <= set("iuf") and ("f" in (gk, wk)) and (gk != wk):
            return (f"dtype drift on column '{c}': spark={got[c].dtype} vs "
                    f"oracle={want[c].dtype} (driver canon renders these "
                    "differently — CAST the oracle aggregate)")
    for side, df in (("spark", got), ("oracle", want)):
        try:
            df.sort_values(list(df.columns))
        except Exception as e:
            return (f"{side} output not driver-sortable "
                    f"({type(e).__name__}: {e}) — emit scalar columns only")
    return None

if SELFTEST:
    # Prove the gate catches the two round-6 driver-gate failure classes.
    import numpy as np
    spark_like = pd.DataFrame({"k": ["a"], "sum_k": pd.array([432], dtype="int64")})
    # a deliberately-bare SUM(BIGINT): DuckDB HUGEINT -> pandas float64
    oracle_like = con.sql(
        "SELECT 'a' AS k, SUM(v) AS sum_k FROM (SELECT CAST(432 AS BIGINT) v) GROUP BY 1").df()
    assert oracle_like["sum_k"].dtype.kind == "f", \
        f"selftest premise broken: {oracle_like['sum_k'].dtype}"
    arr_df = pd.DataFrame({"k": ["a", "b"], "xs": [np.array([1, 2]), np.array([3])]})
    ok_df = pd.DataFrame({"k": ["a"], "sum_k": pd.array([432], dtype="int64")})
    # a DECIMAL output column as pyarrow surfaces it (the round-7 red):
    # Spark side = Decimal objects, oracle side = DuckDB float64
    dec_spark = pd.DataFrame({"k": ["a"], "total": [Decimal("25.50")]})
    dec_oracle = pd.DataFrame({"k": ["a"], "total": [25.5]})
    # decimal buried under a long null prefix (a LAG-style output column)
    dec_nulls = pd.DataFrame({"k": ["a"] * 151,
                              "total": [None] * 150 + [Decimal("25.50")]})
    checks = [
        ("decimal after 150-null prefix flagged",
         gate_compat("t5", dec_nulls, dec_nulls.copy()) is not None),
        ("bare-SUM dtype drift flagged",
         gate_compat("t1", spark_like, oracle_like) is not None),
        ("array output unsortable flagged",
         gate_compat("t2", arr_df, arr_df) is not None),
        ("decimal output column flagged",
         gate_compat("t4", dec_spark, dec_oracle) is not None),
        ("clean frames pass",
         gate_compat("t3", ok_df, ok_df.copy()) is None),
    ]
    bad = [n for n, ok in checks if not ok]
    for n, ok in checks:
        print(f"  [{'ok' if ok else 'FAIL'}] selftest: {n}")
    sys.exit(1 if bad else 0)

fails, passes, skips = [], 0, 0
for d in sorted(glob.glob(f"{OUT}/*")):
    name = os.path.basename(d)
    if not os.path.isdir(d):
        continue
    try:
        # pyarrow, NOT DuckDB: the driver reads the Spark side this way, and
        # DuckDB's pandas bridge launders DECIMAL columns to float64 on both
        # sides — masking exactly the decimal-vs-float drift the driver sees
        # (round-7 verdict #2).
        parts = sorted(glob.glob(f"{d}/*.parquet"))
        if not parts:
            raise FileNotFoundError("no parquet parts")
        # date_as_object=False: DATE -> datetime64 (midnight), matching the
        # DuckDB bridge's rendering — the driver is green on date-output
        # queries, so its view equates them; Decimal objects still survive.
        got = pd.concat(
            [pq.read_table(p).to_pandas(date_as_object=False) for p in parts],
            ignore_index=True)
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
    compat = gate_compat(name, got, want)
    if compat is not None:
        fails.append((name, f"driver-gate compat: {compat}"))
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
