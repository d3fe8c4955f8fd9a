#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only — the
engine itself is pure Scala/Spark; python+duckdb are driver-side deps).

Usage: python3 tools/check.py [sfdir] [outdir]
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have run
  2. loads each <outdir>/<name> parquet (Spark result)
  3. runs oracle_sql.json[name] in DuckDB with tables registered from sfdir
  4. compares schema (column names sorted), row count, and values
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, naive
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact — mirrors hash-match
    if isinstance(a, (list, tuple)) or str(type(a)).endswith("ndarray'>"):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
    return a == b


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = outdir / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(res_dir))
            want = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = got[c].iloc[i], want[c].iloc[i]
                if not values_equal(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
