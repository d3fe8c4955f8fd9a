#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only — the
engine itself is pure Scala/Spark; python+duckdb are driver-side deps).

Usage: python3 tools/check.py [sfdir] [outdir] [--strict]
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have run
  2. loads each <outdir>/<name> parquet (Spark result)
  3. runs oracle_sql.json[name] in DuckDB with tables registered from sfdir
  4. compares schema (column names sorted), row count, and values
  5. with --strict, also compares per-column DTYPES between the Spark
     parquet and the DuckDB result — the driver's hash is type-sensitive
     (e.g. a DuckDB windowed sum of BIGINT comes back HUGEINT→float64
     while Spark writes int64: identical values, failed hash). The lint
     catches that class of oracle-SQL skew before the driver does.
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


def dtype_key(s: pd.Series) -> str:
    """Collapse a pandas dtype to the equivalence class the driver's
    type-sensitive hash distinguishes: integer width vs float vs bool vs
    datetime vs string/object/list. Nullable extension ints (Int64) and
    numpy int64 hash alike once values match, so they share a key."""
    d = s.dtype
    k = getattr(d, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "m":
        return "timedelta"
    # object: decimal.Decimal from DuckDB DECIMAL sums is a numeric-type
    # skew vs Spark's float/int — surface it distinctly.
    if k == "O" and len(s):
        v = s.dropna()
        if len(v):
            import decimal
            if isinstance(v.iloc[0], decimal.Decimal):
                return "decimal"
            if isinstance(v.iloc[0], bool):
                return "bool"
            if isinstance(v.iloc[0], int):
                return "int"
            if isinstance(v.iloc[0], float):
                return "float"
    return "object"


def main():
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    sfdir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    outdir = Path(argv[1] if len(argv) > 1 else "/tmp/verify_out")
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
        if strict:
            skew = [
                (c, str(got[c].dtype), str(want[c].dtype))
                for c in got.columns
                if dtype_key(got[c]) != dtype_key(want[c])
            ]
            if skew:
                c, a, b = skew[0]
                print(f"FAIL {name}: dtype skew col {c}: spark={a} duckdb={b}")
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
