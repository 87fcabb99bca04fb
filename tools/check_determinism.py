#!/usr/bin/env python3
"""Compare two Verify output dirs for run-to-run determinism.

Usage: python3 tools/check_determinism.py <outDirA> <outDirB>

The DuckDB oracle only covers hash-compared queries; rows-only outputs
(minhash/simhash/sketches/stub-featurized) could drift between runs
without failing any gate. This check row-sorts each query's parquet from
both runs and requires exact frame equality. Exit 1 on any drift.

Robustness: an empty parquet list (legit empty-result query) compares as
an empty frame instead of crashing pd.concat; array-typed columns are
stringified for the sort; any per-query exception is reported as that
query's FAIL without aborting the sweep.

Streaming drained-selection contract: the flatMapGroupsWithState
queries (REQUIRED_STREAMING below) re-emit progress streams whose RAW
row set varies run to run with micro-batch boundaries; what their
Verify dumps hold is the max-`seen` SELECTION, and its run-to-run
stability is exactly the determinism claim those operators make. The
trio is therefore REQUIRED to be present in both dumps — silently
dropping one from Verify would shrink this gate without failing it.
"""
import glob, os, sys
import pandas as pd

# drained flatMapGroupsWithState selections whose stability IS the
# operators' determinism contract -- must exist in both dumps
REQUIRED_STREAMING = {
    "q89_stream_kmv",
    "q97_stream_funnel",
    "q112_stream_anomaly",
}

def load_sorted(files):
    if not files:
        return pd.DataFrame()
    df = pd.concat([pd.read_parquet(f) for f in files])
    if df.empty:
        return df.reset_index(drop=True)
    # array/struct columns are unhashable for sort_values -- sort every
    # object-dtype column on a stringified shadow (strings stringify to
    # themselves, so this is safe for them too), then drop the shadows
    key_cols = []
    for c in df.columns:
        k = f"__sort_{c}"
        df[k] = df[c].astype(str) if df[c].dtype == object else df[c]
        key_cols.append(k)
    out = (df.sort_values(by=key_cols, kind="mergesort")
             .drop(columns=key_cols)
             .reset_index(drop=True))
    return out

def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    bad = 0
    present = {os.path.basename(d)
               for d in glob.glob(os.path.join(a_dir, "q*"))}
    for missing in sorted(REQUIRED_STREAMING - present):
        print(f"FAIL {missing}: required streaming query absent from "
              f"{a_dir} -- the drained-selection determinism gate "
              f"no longer covers it")
        bad += 1
    for d1 in sorted(glob.glob(os.path.join(a_dir, "q*"))):
        name = os.path.basename(d1)
        try:
            fa = glob.glob(os.path.join(d1, "*.parquet"))
            fb = glob.glob(os.path.join(b_dir, name, "*.parquet"))
            if not os.path.isdir(os.path.join(b_dir, name)):
                print(f"FAIL {name}: missing in {b_dir}")
                bad += 1
                continue
            sa = load_sorted(fa)
            sb = load_sorted(fb)
            if sa.equals(sb):
                print(f"OK   {name}")
            else:
                print(f"FAIL {name}: outputs differ between runs")
                bad += 1
        except Exception as e:  # one broken query must not abort the sweep
            print(f"FAIL {name}: comparison error: {e}")
            bad += 1
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
