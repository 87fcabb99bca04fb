#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, sorts columns by name + rows by all columns, and compares
values exactly. Exit code 1 if any query mismatches.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracles.items()):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");
            failures += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); failures += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); failures += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        dt_bad = [(c, str(a[c].dtype), str(b[c].dtype))
                  for c in a.columns if a[c].dtype != b[c].dtype]
        if dt_bad:
            # dtype drift (e.g. DuckDB HUGEINT sum -> float64) breaks the
            # driver's value hash even when values compare equal
            print(f"FAIL {name}: dtype drift {dt_bad}")
            failures += 1
            continue
        bad = []
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                eq = (pd.isna(av) & pd.isna(bv)) | (av == bv)
            else:
                eq = (pd.Series(av).astype(object).where(~pd.isna(av), None) ==
                      pd.Series(bv).astype(object).where(~pd.isna(bv), None)) | (pd.isna(av) & pd.isna(bv))
                eq = np.asarray(eq)
            if not eq.all():
                idx = int(np.argmin(eq))
                bad.append((c, idx, av[idx], bv[idx]))
        if bad:
            c, i, x, y = bad[0]
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} duck={y!r} ({len(bad)} bad cols)")
            failures += 1
        else:
            print(f"OK   {name} ({len(a)} rows)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
