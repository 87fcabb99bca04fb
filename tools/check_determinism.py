#!/usr/bin/env python3
"""Compare two Verify output dirs for run-to-run determinism.

Usage: python3 tools/check_determinism.py <outDirA> <outDirB>

The DuckDB oracle only covers hash-compared queries; rows-only outputs
(minhash/simhash/sketches/stub-featurized) could drift between runs
without failing any gate. This check row-sorts each query's parquet from
both runs and requires exact frame equality. Exit 1 on any drift.
"""
import glob, os, sys
import pandas as pd

def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    bad = 0
    for d1 in sorted(glob.glob(os.path.join(a_dir, "q*"))):
        name = os.path.basename(d1)
        fa = glob.glob(os.path.join(d1, "*.parquet"))
        fb = glob.glob(os.path.join(b_dir, name, "*.parquet"))
        if not fb:
            print(f"FAIL {name}: missing in {b_dir}")
            bad += 1
            continue
        a = pd.concat([pd.read_parquet(f) for f in fa])
        b = pd.concat([pd.read_parquet(f) for f in fb])
        sa = a.sort_values(by=list(a.columns), kind="mergesort").reset_index(drop=True)
        sb = b.sort_values(by=list(b.columns), kind="mergesort").reset_index(drop=True)
        if sa.equals(sb):
            print(f"OK   {name}")
        else:
            print(f"FAIL {name}: outputs differ between runs")
            bad += 1
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
