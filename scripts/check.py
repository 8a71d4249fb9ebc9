#!/usr/bin/env python3
"""Local differential check mimicking the driver's t2 gate.

Usage: python3 scripts/check.py <sfDir> <outDir>

Reads <outDir>/<name>/ parquet (Spark results written by graft.Verify) and
<outDir>/oracle_sql.json, registers the base parquet tables under their bare
names in DuckDB, runs each oracle, and compares: columns sorted by name, rows
sorted by all columns, exact value equality (incl. dtype-level sanity).
"""
import duckdb
import glob
import json
import sys

import pandas as pd

BASE_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in BASE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        spark_df = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            failures += 1
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"  e.g. row {idx} col {c}: spark={a[c][idx]!r} duck={b[c][idx]!r}")
            failures += 1
            continue
        print(f"OK   {name}: {len(a)} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
