#!/usr/bin/env python3
"""Per-oracle DuckDB replay cost at a given SF — the driver's t2 gate
replays every oracle_sql.json statement; this measures which oracles
carry the cost (r16: the judge's full sweep took ~17 min, dominated by
the recursive-CTE pipeline replays) so optimization work lands where
the time is.

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> [nameSubstr...]
Prints one line per oracle: seconds + row count, slowest last, plus a
total. Does NOT compare results — use check_oracle.py for that.
"""
import json, sys, time, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    rows = []
    for name, sql in sorted(oracles.items()):
        if only and not any(s in name for s in only):
            continue
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            rows.append((time.time() - t0, name, n, ""))
        except Exception as e:
            rows.append((time.time() - t0, name, -1, str(e)[:120]))
    rows.sort()
    for sec, name, n, err in rows:
        tag = f"ERR {err}" if n < 0 else f"{n} rows"
        print(f"{sec:8.2f}s  {name}  ({tag})")
    print(f"TOTAL {sum(r[0] for r in rows):.1f}s over {len(rows)} oracles")

if __name__ == "__main__":
    main()
