#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/local_check.py [sfDir] [outDir] [only_prefix]

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: for each query
result parquet in outDir, runs the matching oracle SQL from
oracle_sql.json in DuckDB over the sfDir tables and compares rows,
schema (sorted column names) and exact values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = sys.argv[3] if len(sys.argv) > 3 else ""

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    if only and not name.startswith(only):
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"sql error: {e}"))
        continue
    s = spark_df[sorted(spark_df.columns)]
    o = odf[sorted(odf.columns)]
    if list(s.columns) != list(o.columns):
        fails.append((name, f"schema {list(s.columns)} vs {list(o.columns)}"))
        continue
    if len(s) != len(o):
        fails.append((name, f"rows {len(s)} vs {len(o)}"))
        continue
    ok = True
    for c in s.columns:
        a, b = s[c], o[c]
        try:
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                eq = (a.astype(float).fillna(-9e99) == b.astype(float).fillna(-9e99)).all()
            else:
                eq = (a.astype(str) == b.astype(str)).all()
        except Exception as e:
            eq = False
        if not eq:
            mism = (a.astype(str) != b.astype(str))
            idx = mism[mism].index[:3].tolist()
            fails.append((name, f"col {c} mismatch at rows {idx}: "
                          f"{a.iloc[idx[0]]!r} vs {b.iloc[idx[0]]!r}" if idx else f"col {c} mismatch"))
            ok = False
            break
    if ok:
        print(f"  OK  {name} ({len(s)} rows)")

if fails:
    print("\nFAILURES:")
    for n, m in fails:
        print(f"  FAIL {n}: {m}")
    sys.exit(1)
print("\nall green")
