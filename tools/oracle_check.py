#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py [sfDir] [verifyOutDir]

Reads each SparkEntry query's parquet dump (written by `graft.Verify`),
runs the matching oracle SQL in DuckDB over the same star-schema parquet
files, sorts columns by name and rows by value, and compares exactly.
NOT part of the Scala library — local dev feedback only.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/verify_out"

con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver testdata tables are single files; locally generated scale
    # fixtures (GenScale) are Spark-written directories of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        duck = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output at {out}/{name}")
        n_fail += 1
        continue
    spark = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    s, d = canon(spark), canon(duck)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        n_fail += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        n_fail += 1
        continue
    bad = []
    for c in s.columns:
        a, b = s[c], d[c]
        eq = (a.isna() & b.isna()) | (a == b)
        if not eq.all():
            i = int(np.argmin(eq.values))
            bad.append((c, i, a.iloc[i], b.iloc[i], int((~eq).sum())))
    if bad:
        print(f"FAIL {name}: {len(bad)} mismatching cols")
        for c, i, av, bv, n in bad[:5]:
            print(f"  col {c}: {n} diffs; first at row {i}: spark={av!r} duck={bv!r}")
        n_fail += 1
    else:
        print(f"PASS {name}: {len(s)} rows x {len(s.columns)} cols")
        n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
