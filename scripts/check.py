#!/usr/bin/env python3
"""Local differential check mimicking the driver's t2 gate.

Usage: python3 scripts/check.py <sfDir> <outDir> [--json <artifact>] [name ...]

--json writes a CORRECTNESS-style artifact: per-query {rows, ok | err} plus
the gate's scale dir, pass/fail counts, and wall time — the committed record
for gate runs above the driver's own sf0.01 pass (e.g. CORRECTNESS_SF01).

Reads <outDir>/<name>/ parquet (Spark results written by graft.Verify) and
<outDir>/oracle_sql.json, registers the base parquet tables under their bare
names in DuckDB, runs each oracle, and compares three ways per query:

  1. rows   — row counts equal.
  2. exact  — (spark EXCEPT ALL oracle) UNION ALL (oracle EXCEPT ALL spark)
              is empty, computed INSIDE DuckDB at full decimal fidelity.
              This is the true value-equality check; pandas never sees it.
  3. dtype  — the Spark side read via pyarrow (how the driver hashes it:
              parquet DECIMAL -> python Decimal objects) must land on the
              SAME pandas dtype as the oracle side read via duckdb .df()
              (DECIMAL -> float64). Any decimal column in the Spark output
              fails here (object vs float64) — exactly the round-1 driver
              hash_match failure class that the old pandas-only comparison
              was blind to.

A query passes only if all three pass.
"""
import glob
import json
import os
import sys
import time

import duckdb
import pyarrow.parquet as pq

BASE_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]


def main():
    t_start = time.time()
    sfdir, outdir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    json_path = None
    if rest[:1] == ["--json"]:
        json_path, rest = rest[1], rest[2:]
    only = set(rest)
    results = {}
    con = duckdb.connect()
    for t in BASE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        def fail(msg):
            nonlocal failures
            print(f"FAIL {name}: {msg}")
            results[name] = {"ok": False, "err": msg[:300]}
            failures += 1
        if not files:
            fail("no spark output")
            continue
        spark_rel = f"read_parquet('{outdir}/{name}/*.parquet')"
        try:
            con.sql(f"CREATE OR REPLACE VIEW _oracle AS {oracle[name]}")
            ocols = [d[0] for d in con.sql("SELECT * FROM _oracle LIMIT 0").description]
        except Exception as e:
            fail(f"oracle error: {e}")
            continue
        scols = [d[0] for d in con.sql(f"SELECT * FROM {spark_rel} LIMIT 0").description]
        if sorted(scols) != sorted(ocols):
            fail(f"columns spark={sorted(scols)} duck={sorted(ocols)}")
            continue
        cols = ", ".join(f'"{c}"' for c in sorted(scols))
        n_spark = con.sql(f"SELECT count(*) FROM {spark_rel}").fetchone()[0]
        n_oracle = con.sql("SELECT count(*) FROM _oracle").fetchone()[0]
        if n_spark != n_oracle:
            fail(f"rows spark={n_spark} duck={n_oracle}")
            continue
        # 2. exact diff at full fidelity, inside DuckDB
        diff = con.sql(
            f"SELECT count(*) FROM ("
            f"  (SELECT {cols} FROM {spark_rel} EXCEPT ALL SELECT {cols} FROM _oracle)"
            f"  UNION ALL"
            f"  (SELECT {cols} FROM _oracle EXCEPT ALL SELECT {cols} FROM {spark_rel})"
            f")").fetchone()[0]
        if diff != 0:
            ex = con.sql(
                f"SELECT {cols} FROM {spark_rel} EXCEPT ALL SELECT {cols} FROM _oracle"
            ).fetchmany(2)
            fail(f"{diff} differing rows (exact diff); spark-only e.g. {ex}")
            continue
        # 3. dtype fidelity: pyarrow read (driver's spark-side view) vs duckdb .df()
        #    (driver's oracle-side view) must agree per column.
        sdf = pq.read_table(files).to_pandas()
        odf = con.sql("SELECT * FROM _oracle").df()
        bad = []
        for c in sorted(scols):
            st, ot = str(sdf[c].dtype), str(odf[c].dtype)
            if st != ot:
                bad.append(f"{c}: spark={st} duck={ot}")
            elif st == "object" and len(sdf):
                ss, os_ = sdf[c].dropna(), odf[c].dropna()
                if len(ss) and len(os_):
                    sv, ov = ss.iloc[0], os_.iloc[0]
                    if type(sv).__name__ != type(ov).__name__:
                        bad.append(f"{c}: spark obj {type(sv).__name__} duck obj {type(ov).__name__}")
        if bad:
            fail(f"dtype mismatch (driver hash would differ): {bad}")
            continue
        results[name] = {"ok": True, "rows": int(n_spark)}
        print(f"OK   {name}: {n_spark} rows")
    if json_path:
        artifact = {
            "sf_dir": sfdir,
            "n_queries": len(results),
            "n_pass": sum(1 for r in results.values() if r["ok"]),
            "n_fail": failures,
            "oracle_wall_sec": round(time.time() - t_start, 1),
            "checks": ["rows", "exact_diff_duckdb", "dtype_fidelity"],
            "queries": results,
        }
        # the Spark-side graft.Verify wall time, when the runner exports it
        if os.environ.get("GRAFT_VERIFY_WALL_SEC"):
            artifact["verify_wall_sec"] = float(os.environ["GRAFT_VERIFY_WALL_SEC"])
        with open(json_path, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}: {artifact['n_pass']}/{artifact['n_queries']} pass, "
              f"{artifact['oracle_wall_sec']}s")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
