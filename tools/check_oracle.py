#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mimics the driver: for each query dumped by graft.Verify, run the
matching oracle SQL in DuckDB over the same parquet tables, sort
columns by name, and compare values exactly (with a loose float
report for near-misses). Driver-side tooling only — the shipped
library is pure Scala/Spark.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        want = norm(con.sql(oracle[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} duck={list(want.columns)}")
            fails += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            fails += 1; continue
        bad = []
        for c in got.columns:
            a, b = got[c].values, want[c].values
            for i in range(len(a)):
                x, y = a[i], b[i]
                if x is None and y is None: continue
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y): continue
                    if x != y:
                        bad.append((c, i, x, y, abs(x - y)))
                elif str(x) != str(y):
                    bad.append((c, i, x, y, None))
        if bad:
            fails += 1
            print(f"FAIL {name}: {len(bad)} value mismatches, first 5:")
            for c, i, x, y, d in bad[:5]:
                print(f"   col={c} row={i} spark={x!r} duck={y!r} absdiff={d}")
        else:
            print(f"OK   {name} ({len(got)} rows x {len(got.columns)} cols)")
    print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
