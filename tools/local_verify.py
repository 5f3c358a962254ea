#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the same sfDir
tables, and compares: columns sorted by name, rows sorted, exact values.
Reports per-query status; exits nonzero if any oracle-backed query mismatches.
"""
import json
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. MakeScale output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    names = sorted(
        n for n in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, n)))
    for name in names:
        spark_glob = f"{out_dir}/{name}/*.parquet"
        try:
            got = con.execute(
                f"SELECT * FROM '{spark_glob}'").fetch_df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: cannot read spark output: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: no oracle, rows={len(got)}")
            continue
        try:
            want = con.execute(oracles[name]).fetch_df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL error: {e}")
            failures += 1
            continue

        g = got.reindex(sorted(got.columns), axis=1)
        w = want.reindex(sorted(want.columns), axis=1)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: schema {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        g = g.astype(str).sort_values(by=list(g.columns)).reset_index(drop=True)
        w = w.astype(str).sort_values(by=list(w.columns)).reset_index(drop=True)
        neq = (g != w).any(axis=1)
        if neq.any():
            bad = neq[neq].index[:3]
            print(f"FAIL  {name}: {int(neq.sum())}/{len(g)} rows differ")
            for i in bad:
                print(f"      spark : {g.loc[i].to_dict()}")
                print(f"      oracle: {w.loc[i].to_dict()}")
            failures += 1
        else:
            print(f"OK    {name}: {len(g)} rows")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
