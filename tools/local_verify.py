#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir
tables, and compares: schema (column names), row count, and values
(columns sorted by name, rows sorted, exact match; floats compared to
1e-9 rel tolerance as a fallback diagnostic).
"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # driver fixtures are flat files; derived fixtures (e.g. target/sf1,
    # written by Spark) are directories of part files
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
# A Verify run with SPARK_GRAFT_ONLY drops a SUBSET_MARKER: surface it
# LOUDLY so a partial capture into a dir with stale full-run results
# can never be read as a full green (round-8 staleness class).
if os.path.exists(f"{out}/SUBSET_MARKER"):
    print("!! " + open(f"{out}/SUBSET_MARKER").read().strip()[:300])
    print("!! results below may include STALE dirs from earlier runs\n")
names = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
n_pass = n_fail = n_rowsonly = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    got = con.sql(f"SELECT * FROM read_parquet({files})").df()
    if name not in oracle:
        status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
        n_rowsonly += 1
        print(f"{status:18s} {name:28s} rows={len(got)}")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{'ORACLE-ERR':18s} {name:28s} {e}")
        n_fail += 1
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"{'SCHEMA-MISMATCH':18s} {name:28s} spark={gcols} duck={ecols}")
        n_fail += 1
        continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"{'ROWCOUNT':18s} {name:28s} spark={len(g)} duck={len(e)}")
        n_fail += 1
        continue
    mismatches = []
    for c in gcols:
        gv, ev = g[c], e[c]
        try:
            same = (gv.astype(object).where(gv.notna(), None).tolist()
                    == ev.astype(object).where(ev.notna(), None).tolist())
        except Exception:
            same = False
        if not same:
            mismatches.append(c)
    if not mismatches:
        print(f"{'PASS':18s} {name:28s} rows={len(g)}")
        n_pass += 1
    else:
        print(f"{'VALUE-MISMATCH':18s} {name:28s} cols={mismatches}")
        for c in mismatches[:3]:
            import pandas as pd
            diff = g[c].compare(e[c]) if hasattr(g[c], "compare") else None
            if diff is not None and len(diff):
                print(f"    {c}: first diffs\n{diff.head(3)}")
        n_fail += 1
print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
sys.exit(1 if n_fail else 0)
