#!/usr/bin/env python3
"""Local dry-run of the driver's t2 oracle compare (dev tooling only — the
shipped engine is pure Scala/Spark; this mirrors what the driver does with
DuckDB so hash mismatches are caught before a round ends).

Usage: scripts/check.py [sfDir] [outDir]
Expects graft.Verify to have been run first:
  sbt "runMain graft.Verify <sfDir> <outDir>"
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

n_pass = n_fail = 0
names = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:  # Verify died mid-write: report this query, keep going
        print(f"  ✗ {name}: no parquet part files in {out}/{name}")
        n_fail += 1
        continue
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    if name not in oracle:
        print(f"  ~ {name}: no oracle ({len(got)} rows)")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"  ✗ {name}: oracle SQL failed: {e}")
        n_fail += 1
        continue
    g, e = canon(got), canon(exp)
    ok_schema = list(g.columns) == list(e.columns)
    ok_rows = len(g) == len(e)
    ok_vals = ok_schema and ok_rows
    if ok_vals:
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                same = (a.astype(str) == b.astype(str)).all()
            except Exception:
                same = False
            if not same:
                ok_vals = False
                diff = (a.astype(str) != b.astype(str))
                i = diff.idxmax()
                print(f"    col {c} first diff @row {i}: spark={a[i]!r} duck={b[i]!r}")
    if ok_schema and ok_rows and ok_vals:
        print(f"  ✓ {name}: {len(g)} rows")
        n_pass += 1
    else:
        print(f"  ✗ {name}: schema={ok_schema} spark_cols={list(g.columns)} "
              f"duck_cols={list(e.columns)} rows {len(g)}/{len(e)} vals={ok_vals}")
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, {len(names) - n_pass - n_fail} no-oracle")
sys.exit(1 if n_fail else 0)
